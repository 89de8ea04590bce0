"""Differential tests for kreport/promote CLIs vs the reference perl scripts."""

import io
import os
import sys

import pytest

from conftest import FIXTURE_DIR
from test_golden_classify import get_index

FX = os.path.join(FIXTURE_DIR, "tiny")


def run_cli(mod_main, argv):
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        mod_main(argv)
    finally:
        sys.stdout = old
    return buf.getvalue()


@pytest.mark.parametrize("golden,extra,src", [
    ("golden_kreport_script.tsv", [], "golden_class_k1.tsv"),
    ("golden_kreport_nolca.tsv", ["--no-lca"], "golden_class_k5.tsv"),
])
def test_kreport(tmp_path_factory, golden, extra, src):
    from centrifuger_tpu.cli.kreport_cli import main
    prefix = get_index("tiny", tmp_path_factory)
    got = run_cli(main, ["-x", prefix] + extra + [os.path.join(FX, src)])
    with open(os.path.join(FX, golden)) as f:
        want = f.read()
    assert got == want


@pytest.mark.parametrize("golden,level", [
    ("golden_promote_genus.tsv", "genus"),
    ("golden_promote_lca.tsv", "lca"),
])
def test_promote(tmp_path_factory, golden, level):
    from centrifuger_tpu.cli.promote_cli import main
    prefix = get_index("tiny", tmp_path_factory)
    got = run_cli(main, [prefix, os.path.join(FX, "golden_class_k5.tsv"), level])
    with open(os.path.join(FX, golden)) as f:
        want = f.read()
    assert got == want

"""Differential tests: build an index from the fixture with our builder,
classify the fixture reads, and require byte-identical TSV output vs the
compiled reference binary's golden files."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import FIXTURE_DIR

FX = os.path.join(FIXTURE_DIR, "small")


@pytest.fixture(scope="module")
def built_index(tmp_path_factory):
    from centrifuger_tpu.build import build_index
    out = tmp_path_factory.mktemp("idx")
    prefix = str(out / "idx")
    build_index([os.path.join(FX, "ref.fa")],
                os.path.join(FX, "nodes.dmp"),
                os.path.join(FX, "names.dmp"),
                os.path.join(FX, "ref_seqid.map"),
                conversion_at_file_level=False,
                output_prefix=prefix)
    return prefix


def run_classify(prefix, extra, engine="numpy"):
    from centrifuger_tpu.cli import classify_cli
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        classify_cli.main(["-x", prefix,
                           "-1", os.path.join(FX, "reads_1.fq"),
                           "-2", os.path.join(FX, "reads_2.fq"),
                           "--engine", engine] + extra)
    finally:
        sys.stdout = old
    return buf.getvalue()


@pytest.mark.parametrize("tag,extra", [("k1", []), ("k2", ["-k", "2"]),
                                       ("k5", ["-k", "5"])])
def test_classify_matches_reference(built_index, tag, extra):
    got = run_classify(built_index, extra)
    with open(os.path.join(FX, "golden_class_%s.tsv" % tag)) as f:
        want = f.read()
    got_lines = got.splitlines()
    want_lines = want.splitlines()
    assert len(got_lines) == len(want_lines), \
        "line count mismatch: %d vs %d" % (len(got_lines), len(want_lines))
    for i, (g, w) in enumerate(zip(got_lines, want_lines)):
        assert g == w, "line %d differs:\n  got:  %s\n  want: %s" % (i, g, w)

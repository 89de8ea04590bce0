"""CLI-level coverage of the serving-mode flags (round-4 verdict weak #6):
--serve-layout {plain,runblock}, --no-rowmap, and --shards N must all be
reachable from cfr-classify and produce output identical to the default
golden (the layout/sharding choice is a performance knob, never a results
knob)."""

import io
import os
import sys

import pytest

from conftest import FIXTURE_DIR

FX = os.path.join(FIXTURE_DIR, "tiny")


@pytest.fixture(scope="module")
def ours_index(tmp_path_factory):
    from centrifuger_tpu.build import build_index
    tmp = tmp_path_factory.mktemp("serveidx")
    prefix = str(tmp / "idx")
    build_index([os.path.join(FX, "ref.fa")],
                os.path.join(FX, "nodes.dmp"),
                os.path.join(FX, "names.dmp"),
                os.path.join(FX, "ref_seqid.map"),
                conversion_at_file_level=False, output_prefix=prefix)
    return prefix


def _run(prefix, extra):
    from centrifuger_tpu.cli import classify_cli
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        classify_cli.main(["-x", prefix,
                           "-1", os.path.join(FX, "reads_1.fq"),
                           "-2", os.path.join(FX, "reads_2.fq")] + extra)
    finally:
        sys.stdout = old
    return buf.getvalue()


def _golden():
    with open(os.path.join(FX, "golden_class_k1.tsv")) as f:
        return f.read()


@pytest.mark.parametrize("extra", [
    ["--serve-layout", "plain"],
    ["--serve-layout", "runblock"],
    ["--no-rowmap"],
    ["--serve-layout", "runblock", "--no-rowmap"],
    ["--shards", "2", "--batch-size", "64"],
    ["--shards", "4", "--batch-size", "64", "--no-rowmap"],
])
def test_serve_mode_flags_golden(ours_index, extra):
    out = _run(ours_index, extra)
    want = _golden()
    assert sorted(out.splitlines()) == sorted(want.splitlines()), extra

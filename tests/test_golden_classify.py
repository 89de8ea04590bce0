"""Differential tests: build an index from fixtures with our builder, classify
the fixture reads, and require byte-identical TSV output vs the compiled
reference binary's golden files.

The `small` (300 paired reads) fixture is slow under the NumPy oracle engine;
it runs only when CFR_SLOW_TESTS=1.  The tiny fixtures always run.
"""

import io
import os
import sys

import pytest

from conftest import FIXTURE_DIR

SLOW = os.environ.get("CFR_SLOW_TESTS", "") == "1"


def build_fixture_index(fx, tmpdir, **kw):
    from centrifuger_tpu.build import build_index
    prefix = str(tmpdir / "idx")
    build_index([os.path.join(fx, "ref.fa")],
                os.path.join(fx, "nodes.dmp"),
                os.path.join(fx, "names.dmp"),
                os.path.join(fx, "ref_seqid.map"),
                conversion_at_file_level=False,
                output_prefix=prefix, **kw)
    return prefix


_IDX_CACHE = {}


def get_index(fx_name, tmp_path_factory):
    if fx_name not in _IDX_CACHE:
        fx = os.path.join(FIXTURE_DIR, fx_name)
        out = tmp_path_factory.mktemp("idx_" + fx_name)
        _IDX_CACHE[fx_name] = build_fixture_index(fx, out)
    return _IDX_CACHE[fx_name]


def run_classify(fx, prefix, extra, engine="numpy", paired=True):
    from centrifuger_tpu.cli import classify_cli
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        if paired:
            rargs = ["-1", os.path.join(fx, "reads_1.fq"),
                     "-2", os.path.join(fx, "reads_2.fq")]
        else:
            rargs = ["-u", os.path.join(fx, "reads_1.fq")]
        classify_cli.main(["-x", prefix, "--engine", engine] + rargs + extra)
    finally:
        sys.stdout = old
    return buf.getvalue()


def assert_tsv_equal(got, want_path):
    with open(want_path) as f:
        want = f.read()
    got_lines = got.splitlines()
    want_lines = want.splitlines()
    for i, (g, w) in enumerate(zip(got_lines, want_lines)):
        assert g == w, "line %d differs:\n  got:  %s\n  want: %s" % (i, g, w)
    assert len(got_lines) == len(want_lines), \
        "line count mismatch: %d vs %d" % (len(got_lines), len(want_lines))


@pytest.mark.parametrize("tag,extra", [("k1", []), ("k2", ["-k", "2"]),
                                       ("k5", ["-k", "5"])])
def test_tiny_paired(tmp_path_factory, tag, extra):
    fx = os.path.join(FIXTURE_DIR, "tiny")
    prefix = get_index("tiny", tmp_path_factory)
    got = run_classify(fx, prefix, extra)
    assert_tsv_equal(got, os.path.join(fx, "golden_class_%s.tsv" % tag))


@pytest.mark.parametrize("tag,extra", [("k1", []), ("k2", ["-k", "2"])])
def test_tiny_single(tmp_path_factory, tag, extra):
    fx = os.path.join(FIXTURE_DIR, "tiny_single")
    prefix = get_index("tiny_single", tmp_path_factory)
    got = run_classify(fx, prefix, extra, paired=False)
    assert_tsv_equal(got, os.path.join(fx, "golden_class_%s.tsv" % tag))


@pytest.mark.parametrize("tag,extra", [("k1", []), ("k2", ["-k", "2"]),
                                       ("k5", ["-k", "5"])])
def test_small_paired_fused(tmp_path_factory, tag, extra):
    """The 300-read paired fixture under the fused device engine (fast —
    always runs; the NumPy-oracle variant below stays gated)."""
    fx = os.path.join(FIXTURE_DIR, "small")
    prefix = get_index("small", tmp_path_factory)
    got = run_classify(fx, prefix, extra, engine="fused")
    assert_tsv_equal(got, os.path.join(fx, "golden_class_%s.tsv" % tag))


@pytest.mark.skipif(not SLOW, reason="set CFR_SLOW_TESTS=1")
@pytest.mark.parametrize("tag,extra", [("k1", []), ("k2", ["-k", "2"]),
                                       ("k5", ["-k", "5"])])
def test_small_paired(tmp_path_factory, tag, extra):
    fx = os.path.join(FIXTURE_DIR, "small")
    prefix = get_index("small", tmp_path_factory)
    got = run_classify(fx, prefix, extra)
    assert_tsv_equal(got, os.path.join(fx, "golden_class_%s.tsv" % tag))

"""Protein (translated search) golden parity tests."""

import os

import pytest

from conftest import FIXTURE_DIR
from test_golden_classify import run_classify, assert_tsv_equal


@pytest.fixture(scope="module")
def protein_index(tmp_path_factory):
    from centrifuger_tpu.build import build_index
    fx = os.path.join(FIXTURE_DIR, "tiny_protein")
    out = tmp_path_factory.mktemp("pidx")
    prefix = str(out / "idx")
    build_index([os.path.join(fx, "ref.fa")],
                os.path.join(fx, "nodes.dmp"),
                os.path.join(fx, "names.dmp"),
                os.path.join(fx, "ref_seqid.map"),
                conversion_at_file_level=False,
                output_prefix=prefix, protein=True)
    return prefix


@pytest.mark.parametrize("tag,extra", [("k1", []), ("k2", ["-k", "2"])])
def test_protein_golden(protein_index, tag, extra):
    fx = os.path.join(FIXTURE_DIR, "tiny_protein")
    got = run_classify(fx, protein_index, extra, paired=False)
    assert_tsv_equal(got, os.path.join(fx, "golden_class_%s.tsv" % tag))


@pytest.mark.parametrize("tag,extra", [("k1", []), ("k2", ["-k", "2"])])
def test_protein_golden_jax(protein_index, tag, extra):
    fx = os.path.join(FIXTURE_DIR, "tiny_protein")
    got = run_classify(fx, protein_index, extra, paired=False, engine="jax")
    assert_tsv_equal(got, os.path.join(fx, "golden_class_%s.tsv" % tag))


@pytest.mark.parametrize("tag,extra", [("k1", []), ("k2", ["-k", "2"])])
def test_protein_golden_fused(protein_index, tag, extra):
    """Translated search on the fully-fused device path: frame + strand
    choice on device (classify/device_engine.py protein mode)."""
    fx = os.path.join(FIXTURE_DIR, "tiny_protein")
    got = run_classify(fx, protein_index, extra, paired=False, engine="fused")
    assert_tsv_equal(got, os.path.join(fx, "golden_class_%s.tsv" % tag))


def test_protein_golden_fused_paired(protein_index):
    """Paired protein reads through the fused path (reads_1 mated with
    itself's mate file when present; falls back to single if absent)."""
    fx = os.path.join(FIXTURE_DIR, "tiny_protein")
    if not os.path.exists(os.path.join(fx, "reads_2.fq")):
        pytest.skip("fixture has no mate file")
    got = run_classify(fx, protein_index, [], paired=True, engine="fused")
    assert_tsv_equal(got, os.path.join(fx, "golden_class_paired_k1.tsv"))

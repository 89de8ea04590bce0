"""JAX engine must be bit-identical to the reference golden outputs."""

import os

import pytest

from conftest import FIXTURE_DIR
from test_golden_classify import get_index, run_classify, assert_tsv_equal


@pytest.mark.parametrize("tag,extra", [("k1", []), ("k2", ["-k", "2"]),
                                       ("k5", ["-k", "5"])])
def test_tiny_paired_jax(tmp_path_factory, tag, extra):
    fx = os.path.join(FIXTURE_DIR, "tiny")
    prefix = get_index("tiny", tmp_path_factory)
    got = run_classify(fx, prefix, extra, engine="jax")
    assert_tsv_equal(got, os.path.join(fx, "golden_class_%s.tsv" % tag))


def test_tiny_single_jax(tmp_path_factory):
    fx = os.path.join(FIXTURE_DIR, "tiny_single")
    prefix = get_index("tiny_single", tmp_path_factory)
    got = run_classify(fx, prefix, [], engine="jax", paired=False)
    assert_tsv_equal(got, os.path.join(fx, "golden_class_k1.tsv"))


@pytest.mark.parametrize("tag,extra", [("k1", []), ("k2", ["-k", "2"]),
                                       ("k5", ["-k", "5"])])
def test_small_paired_jax(tmp_path_factory, tag, extra):
    fx = os.path.join(FIXTURE_DIR, "small")
    prefix = get_index("small", tmp_path_factory)
    got = run_classify(fx, prefix, extra, engine="jax")
    assert_tsv_equal(got, os.path.join(fx, "golden_class_%s.tsv" % tag))

"""The fused device engine must be bit-identical to the golden outputs and to
the NumPy oracle on randomized inputs (incl. multi-best, paired, N chars)."""

import os

import numpy as np
import pytest

from conftest import FIXTURE_DIR
from test_golden_classify import get_index, run_classify, assert_tsv_equal


@pytest.mark.parametrize("tag,extra", [("k1", []), ("k2", ["-k", "2"]),
                                       ("k5", ["-k", "5"])])
def test_tiny_paired_fused(tmp_path_factory, tag, extra):
    fx = os.path.join(FIXTURE_DIR, "tiny")
    prefix = get_index("tiny", tmp_path_factory)
    got = run_classify(fx, prefix, extra, engine="fused")
    assert_tsv_equal(got, os.path.join(fx, "golden_class_%s.tsv" % tag))


def test_tiny_single_fused(tmp_path_factory):
    fx = os.path.join(FIXTURE_DIR, "tiny_single")
    prefix = get_index("tiny_single", tmp_path_factory)
    got = run_classify(fx, prefix, [], engine="fused", paired=False)
    assert_tsv_equal(got, os.path.join(fx, "golden_class_k1.tsv"))


def _results_equal(a, b):
    return (a.score == b.score and a.secondary_score == b.secondary_score
            and a.hit_length == b.hit_length
            and a.query_length == b.query_length
            and a.seq_names == b.seq_names and a.tax_ids == b.tax_ids)


def _rand_reads(rng, genomes, n, length, paired, err=0.02, nrate=0.01):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    out = []
    for _ in range(n):
        g = genomes[rng.randrange(len(genomes))]
        if len(g) <= length + 2:
            frag = g
        else:
            p = rng.randrange(0, len(g) - length)
            frag = g[p:p + length]
        if rng.random() < 0.5:
            frag = "".join(comp[c] for c in reversed(frag))
        frag = "".join(
            ("N" if rng.random() < nrate else
             ("ACGT"[rng.randrange(4)] if rng.random() < err else c))
            for c in frag)
        r1 = np.frombuffer(frag.encode(), np.uint8)
        if paired and rng.random() < 0.8:
            p2 = rng.randrange(0, max(len(g) - length, 1))
            frag2 = g[p2:p2 + length]
            r2 = np.frombuffer(frag2.encode(), np.uint8)
        else:
            r2 = None
        out.append((r1, r2 if paired else None))
    return out


@pytest.mark.parametrize("paired,k", [(False, 1), (True, 1), (False, 2),
                                      (True, 3)])
def test_fused_vs_oracle_random(tmp_path_factory, paired, k):
    import random
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.classify.engine_np import ClassifierNP
    from centrifuger_tpu.classify.engine_fused import ClassifierFused
    from centrifuger_tpu.classify.params import ClassifierParam

    prefix = get_index("tiny", tmp_path_factory)
    fm, tax, seqlen, meta = load_index(prefix)
    rng = random.Random(97 + k + paired)

    # read the fixture genomes for read synthesis
    genomes = []
    with open(os.path.join(FIXTURE_DIR, "tiny", "ref.fa")) as f:
        cur = []
        for line in f:
            if line.startswith(">"):
                if cur:
                    genomes.append("".join(cur))
                cur = []
            else:
                cur.append(line.strip())
        if cur:
            genomes.append("".join(cur))

    queries = _rand_reads(rng, genomes, 60, 60, paired)
    param = ClassifierParam(max_result=k)
    oracle = ClassifierNP(fm, tax, ClassifierParam(max_result=k))
    fused = ClassifierFused(fm, tax, param)
    want = [oracle.query(r1, r2) for r1, r2 in queries]
    got = fused.query_batch(queries)
    for i, (w, g) in enumerate(zip(want, got)):
        assert _results_equal(w, g), \
            "unit %d: want (%d,%d,%d,%s) got (%d,%d,%d,%s)" % (
                i, w.score, w.secondary_score, w.hit_length, w.tax_ids,
                g.score, g.secondary_score, g.hit_length, g.tax_ids)

    # pipelined generator must match batch-by-batch
    bs = 17
    batches = [queries[i:i + bs] for i in range(0, len(queries), bs)]
    out2 = []
    for res in fused.query_pipelined(iter(batches)):
        out2.extend(res)
    for w, g in zip(want, out2):
        assert _results_equal(w, g)


def test_rowmap_equals_walk(tmp_path_factory):
    """The precomputed rowmap must equal the LF-walk resolution for every row,
    and the device walk (rowmap disabled) must agree too."""
    import jax.numpy as jnp
    from centrifuger_tpu.build import load_index
    from centrifuger_tpu.fm.device import DeviceFM

    prefix = get_index("tiny", tmp_path_factory)
    fm, tax, seqlen, meta = load_index(prefix)
    assert fm.rowmap is not None, "tiny index should auto-build a rowmap"
    rows = np.arange(fm.n, dtype=np.int64)
    want = fm.resolve_rows(rows)          # host LF-walk oracle
    assert (fm.rowmap.astype(np.int64) == want).all()

    fm.rowmap = None
    dev = DeviceFM(fm)
    got = np.asarray(dev.resolve_rows(rows, np.ones(fm.n, bool)))
    assert (got.astype(np.int64) == want).all()

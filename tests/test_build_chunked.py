"""The memory-bounded chunked build must produce an index identical to the
SA-IS build, honor --build-mem/--bmax/--dcv/-t, and resume from checkpoints."""

import os

import numpy as np
import pytest

from conftest import FIXTURE_DIR
from test_golden_classify import build_fixture_index, run_classify, \
    assert_tsv_equal


def _load_npz_equal(a, b):
    za = np.load(a, allow_pickle=False)
    zb = np.load(b, allow_pickle=False)
    assert sorted(za.files) == sorted(zb.files)
    for k in za.files:
        assert np.array_equal(za[k], zb[k]), "array %s differs" % k


def test_chunked_build_identical_index(tmp_path):
    fx = os.path.join(FIXTURE_DIR, "tiny")
    from centrifuger_tpu.build import build_index
    args = ([os.path.join(fx, "ref.fa")], os.path.join(fx, "nodes.dmp"),
            os.path.join(fx, "names.dmp"), os.path.join(fx, "ref_seqid.map"))
    kw = dict(conversion_at_file_level=False)
    p1 = str(tmp_path / "sais")
    build_index(*args, output_prefix=p1, **kw)
    p2 = str(tmp_path / "chunk")
    build_index(*args, output_prefix=p2, threads=3, bmax=2048, dcv=64, **kw)
    _load_npz_equal(p1 + ".fm.npz", p2 + ".fm.npz")

    # under an explicit memory budget
    p3 = str(tmp_path / "mem")
    build_index(*args, output_prefix=p3, threads=2,
                build_mem=2 << 30, **kw)
    _load_npz_equal(p1 + ".fm.npz", p3 + ".fm.npz")


def test_chunked_build_golden_classify(tmp_path):
    fx = os.path.join(FIXTURE_DIR, "tiny")
    prefix = build_fixture_index(fx, tmp_path, threads=2, bmax=4096, dcv=64)
    got = run_classify(fx, prefix, [], engine="fused")
    assert_tsv_equal(got, os.path.join(fx, "golden_class_k1.tsv"))


def test_chunked_build_mem_too_small(tmp_path):
    fx = os.path.join(FIXTURE_DIR, "tiny")
    from centrifuger_tpu.build import build_index
    with pytest.raises(MemoryError):
        build_index([os.path.join(fx, "ref.fa")],
                    os.path.join(fx, "nodes.dmp"),
                    os.path.join(fx, "names.dmp"),
                    os.path.join(fx, "ref_seqid.map"),
                    conversion_at_file_level=False,
                    output_prefix=str(tmp_path / "x"),
                    build_mem=1 << 20, threads=2)


def test_chunked_build_protein(tmp_path):
    fx = os.path.join(FIXTURE_DIR, "protein")
    if not os.path.isdir(fx):
        pytest.skip("no protein fixture")
    from centrifuger_tpu.build import build_index
    args = ([os.path.join(fx, "ref.faa")], os.path.join(fx, "nodes.dmp"),
            os.path.join(fx, "names.dmp"), os.path.join(fx, "ref_seqid.map"))
    kw = dict(conversion_at_file_level=False, protein=True)
    p1 = str(tmp_path / "sais")
    build_index(*args, output_prefix=p1, **kw)
    p2 = str(tmp_path / "chunk")
    build_index(*args, output_prefix=p2, threads=2, bmax=1024, dcv=64, **kw)
    _load_npz_equal(p1 + ".fm.npz", p2 + ".fm.npz")


def test_chunked_build_checkpoint_resume(tmp_path, monkeypatch):
    fx = os.path.join(FIXTURE_DIR, "tiny")
    from centrifuger_tpu.build import build_index
    from centrifuger_tpu.fm import builder as fmbuilder
    args = ([os.path.join(fx, "ref.fa")], os.path.join(fx, "nodes.dmp"),
            os.path.join(fx, "names.dmp"), os.path.join(fx, "ref_seqid.map"))
    kw = dict(conversion_at_file_level=False, checkpoint=True,
              threads=1, bmax=512, dcv=64)
    p1 = str(tmp_path / "ck")

    # interrupt the first build partway through the chunk stream
    real_add = fmbuilder._StreamAccum.add
    calls = {"n": 0}

    def bomb(self, row0, sa):
        real_add(self, row0, sa)
        calls["n"] += 1
        if calls["n"] == 30:
            raise KeyboardInterrupt()

    monkeypatch.setattr(fmbuilder._StreamAccum, "add", bomb)
    with pytest.raises(KeyboardInterrupt):
        build_index(*args, output_prefix=p1, **kw)
    monkeypatch.setattr(fmbuilder._StreamAccum, "add", real_add)
    assert os.path.exists(p1 + "_checkpoint_state.npz"), \
        "checkpoint must exist after >=10% progress"
    build_index(*args, output_prefix=p1, **kw)  # resumes
    assert not os.path.exists(p1 + "_checkpoint_state.npz")

    p2 = str(tmp_path / "ref")
    build_index(*args, output_prefix=p2, conversion_at_file_level=False)
    _load_npz_equal(p1 + ".fm.npz", p2 + ".fm.npz")

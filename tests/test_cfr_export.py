"""The strongest cross-implementation check: the REFERENCE binary classifies
an index WE built (exported via interop/cfr_write.py), byte-identical to our
own classification of the same index.

Reference loader contract: compactds/FMIndex.hpp:588-606 (FM load),
Taxonomy.hpp:1135-1168 (taxonomy load), Builder.hpp:280-313 (file layout)."""

import io
import os
import subprocess
import sys

import pytest

from conftest import FIXTURE_DIR

REFBUILD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        ".refbuild")
REF_BIN = os.path.join(REFBUILD, "centrifuger")

needs_ref = pytest.mark.skipif(not os.path.exists(REF_BIN),
                               reason="reference binary not built")


def _build_ours(tmp, fx, **kw):
    from centrifuger_tpu.build import build_index
    prefix = str(tmp / "ours")
    fm, tax, seq_length = build_index(
        [os.path.join(fx, "ref.fa")],
        os.path.join(fx, "nodes.dmp"),
        os.path.join(fx, "names.dmp"),
        os.path.join(fx, "ref_seqid.map"),
        conversion_at_file_level=False, output_prefix=prefix, **kw)
    return prefix, fm, tax, seq_length


def _export(tmp, fm, tax, seq_length):
    from centrifuger_tpu.interop.cfr_write import save_cfr_index
    eprefix = str(tmp / "exported")
    save_cfr_index(fm, tax, seq_length, eprefix)
    return eprefix


def _ref_classify(prefix, fx, extra=()):
    out = subprocess.run([REF_BIN, "-x", prefix,
                          "-1", os.path.join(fx, "reads_1.fq"),
                          "-2", os.path.join(fx, "reads_2.fq")] + list(extra),
                         check=True, capture_output=True)
    return out.stdout.decode()


def _our_classify(prefix, fx, extra=()):
    from centrifuger_tpu.cli import classify_cli
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        classify_cli.main(["-x", prefix, "--engine", "jax",
                           "-1", os.path.join(fx, "reads_1.fq"),
                           "-2", os.path.join(fx, "reads_2.fq")] + list(extra))
    finally:
        sys.stdout = old
    return buf.getvalue()


def _diff(a, b):
    la, lb = a.splitlines(), b.splitlines()
    for i, (x, y) in enumerate(zip(la, lb)):
        assert x == y, "line %d:\n ours %s\n ref  %s" % (i, x, y)
    assert len(la) == len(lb)


@needs_ref
@pytest.mark.parametrize("fixture", ["tiny", "small"])
def test_reference_binary_reads_our_index(tmp_path, fixture):
    """Reference binary classifies our exported index == our own output."""
    fx = os.path.join(FIXTURE_DIR, fixture)
    prefix, fm, tax, seq_length = _build_ours(tmp_path, fx)
    eprefix = _export(tmp_path, fm, tax, seq_length)
    ref_out = _ref_classify(eprefix, fx)
    our_out = _our_classify(prefix, fx)
    _diff(our_out, ref_out)


@needs_ref
def test_reference_binary_reads_our_index_k2(tmp_path):
    fx = os.path.join(FIXTURE_DIR, "tiny")
    prefix, fm, tax, seq_length = _build_ours(tmp_path, fx)
    eprefix = _export(tmp_path, fm, tax, seq_length)
    _diff(_our_classify(prefix, fx, ["-k", "2"]),
          _ref_classify(eprefix, fx, ["-k", "2"]))


@needs_ref
def test_exported_cfr_roundtrips_through_our_reader(tmp_path):
    """interop/cfr.py loads what interop/cfr_write.py wrote; classification
    through the round-tripped index is identical."""
    fx = os.path.join(FIXTURE_DIR, "tiny")
    prefix, fm, tax, seq_length = _build_ours(tmp_path, fx)
    eprefix = _export(tmp_path, fm, tax, seq_length)
    from centrifuger_tpu.interop.cfr import load_cfr_index
    fm2, tax2, seq_length2, _meta = load_cfr_index(eprefix)
    assert fm2.n == fm.n
    assert fm2.first_isa == fm.first_isa
    assert seq_length2 == seq_length
    import numpy as np
    assert np.array_equal(np.asarray(fm2.sampled_sa), np.asarray(fm.sampled_sa))
    assert np.array_equal(fm2.bwt.decode(), fm.bwt.decode())


@needs_ref
def test_build_cli_emit_cfr(tmp_path):
    """cfr-build --emit-cfr writes a reference-loadable index set."""
    fx = os.path.join(FIXTURE_DIR, "tiny")
    from centrifuger_tpu.cli import build_cli
    prefix = str(tmp_path / "cliidx")
    rc = build_cli.main(["-r", os.path.join(fx, "ref.fa"),
                         "--taxonomy-tree", os.path.join(fx, "nodes.dmp"),
                         "--name-table", os.path.join(fx, "names.dmp"),
                         "--conversion-table", os.path.join(fx, "ref_seqid.map"),
                         "-o", prefix, "--emit-cfr"])
    assert rc == 0
    for i in (1, 2, 3, 4):
        assert os.path.exists(prefix + ".%d.cfr" % i)
    _diff(_our_classify(prefix, fx), _ref_classify(prefix, fx))

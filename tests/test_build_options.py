"""Differential tests for build-time options and remaining classify/quant/
inspect surfaces vs the reference binaries."""

import io
import os
import subprocess
import sys

import pytest

from conftest import FIXTURE_DIR

FX = os.path.join(FIXTURE_DIR, "tiny")
REFBUILD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        ".refbuild")


def ref_build(tmp, extra):
    prefix = str(tmp / "ref")
    subprocess.run([os.path.join(REFBUILD, "centrifuger-build"),
                    "-r", os.path.join(FX, "ref.fa"),
                    "--taxonomy-tree", os.path.join(FX, "nodes.dmp"),
                    "--name-table", os.path.join(FX, "names.dmp"),
                    "--conversion-table", os.path.join(FX, "ref_seqid.map"),
                    "-o", prefix] + extra, check=True, capture_output=True)
    return prefix


def our_build(tmp, **kw):
    from centrifuger_tpu.build import build_index
    from centrifuger_tpu.fm.builder import FMBuildParams
    prefix = str(tmp / "ours")
    params = FMBuildParams(sample_rate=kw.pop("sample_rate", 16),
                           precompute_width=kw.pop("precompute_width", 10),
                           rbbwt_b=kw.pop("rbbwt_b", 0))
    build_index([os.path.join(FX, "ref.fa")],
                os.path.join(FX, "nodes.dmp"),
                os.path.join(FX, "names.dmp"),
                os.path.join(FX, "ref_seqid.map"),
                conversion_at_file_level=False, output_prefix=prefix,
                params=params, **kw)
    return prefix


def ref_classify(prefix, extra=()):
    out = subprocess.run([os.path.join(REFBUILD, "centrifuger"), "-x", prefix,
                          "-1", os.path.join(FX, "reads_1.fq"),
                          "-2", os.path.join(FX, "reads_2.fq")] + list(extra),
                         check=True, capture_output=True)
    return out.stdout.decode()

def our_classify(prefix, extra=()):
    from centrifuger_tpu.cli import classify_cli
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        classify_cli.main(["-x", prefix, "--engine", "jax",
                           "-1", os.path.join(FX, "reads_1.fq"),
                           "-2", os.path.join(FX, "reads_2.fq")] + list(extra))
    finally:
        sys.stdout = old
    return buf.getvalue()


def diff(a, b):
    la, lb = a.splitlines(), b.splitlines()
    for i, (x, y) in enumerate(zip(la, lb)):
        assert x == y, "line %d:\n ours %s\n ref  %s" % (i, x, y)
    assert len(la) == len(lb)


@pytest.mark.parametrize("ref_extra,our_kw", [
    (["--offrate", "2"], dict(sample_rate=4)),
    (["--ftabchars", "6"], dict(precompute_width=6)),
    (["--rbbwt-b", "1"], dict(rbbwt_b=1)),
    (["--rbbwt-b", "4"], dict(rbbwt_b=4)),
    (["--subset-tax", "100"], dict(subset_tax=100)),
    (["--concat-tax-genome"], dict(concat_same_taxid=True)),
])
def test_build_option_parity(tmp_path, ref_extra, our_kw):
    rp = ref_build(tmp_path, ref_extra)
    op = our_build(tmp_path, **our_kw)
    diff(our_classify(op), ref_classify(rp))


def test_classify_expand_taxid_and_minhitlen(tmp_path):
    rp = ref_build(tmp_path, [])
    op = our_build(tmp_path)
    for extra in (["-k", "2", "--expand-taxid"], ["--min-hitlen", "30"],
                  ["-k", "3", "--hitk-factor", "2"], ["--hitk-factor", "0"]):
        diff(our_classify(op, extra), ref_classify(rp, extra))


def test_inspect_parity(tmp_path):
    rp = ref_build(tmp_path, [])
    op = our_build(tmp_path)
    from centrifuger_tpu.cli import inspect_cli
    for flag in ("--summary", "--conversion-table", "--taxonomy-tree",
                 "--name-table", "--size-table"):
        want = subprocess.run([os.path.join(REFBUILD, "centrifuger-inspect"),
                               "-x", rp, flag], check=True,
                              capture_output=True).stdout.decode()
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        try:
            inspect_cli.main(["-x", op, flag])
        finally:
            sys.stdout = old
        diff(buf.getvalue(), want)


def test_quant_formats_parity(tmp_path):
    rp = ref_build(tmp_path, [])
    op = our_build(tmp_path)
    cls = ref_classify(rp)
    cls_path = tmp_path / "cls.tsv"
    cls_path.write_text(cls)
    from centrifuger_tpu.quant.quantifier import Quantifier
    for fmt in (1, 2):  # metaphlan, CAMI
        want = subprocess.run([os.path.join(REFBUILD, "centrifuger-quant"),
                               "-x", rp, "-c", str(cls_path),
                               "--output-format", str(fmt)], check=True,
                              capture_output=True).stdout.decode()
        q = Quantifier()
        q.init_from_index(op)
        q.load_read_assignments(str(cls_path))
        q.quantification()
        buf = io.StringIO()
        q.output(buf, fmt)
        diff(buf.getvalue(), want)

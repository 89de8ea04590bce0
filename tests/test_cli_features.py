"""Differential CLI tests vs the reference binary for the read-prep feature
surface: trimming (--read-format), barcodes/UMI columns, --un/--cl dumps,
interleaved input, --merge-readpair, sample sheets."""

import gzip
import io
import os
import random
import subprocess
import sys

import pytest

from conftest import FIXTURE_DIR
from test_golden_classify import get_index

FX = os.path.join(FIXTURE_DIR, "tiny")
REFBUILD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        ".refbuild")
REF_BIN = os.path.join(REFBUILD, "centrifuger")


def run_ref(args):
    out = subprocess.run([REF_BIN, "-x", os.path.join(FX, "refidx")] + args,
                         check=True, capture_output=True)
    return out.stdout.decode()


def run_ours(prefix, args):
    from centrifuger_tpu.cli import classify_cli
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        classify_cli.main(["-x", prefix, "--engine", "numpy"] + args)
    finally:
        sys.stdout = old
    return buf.getvalue()


def diff(got, want):
    g = got.splitlines()
    w = want.splitlines()
    for i, (a, b) in enumerate(zip(g, w)):
        assert a == b, "line %d:\n got  %s\n want %s" % (i, a, b)
    assert len(g) == len(w)


@pytest.fixture(scope="module")
def prefix(tmp_path_factory):
    return get_index("tiny", tmp_path_factory)


def test_read_format_trim(prefix):
    args = ["-1", os.path.join(FX, "reads_1.fq"), "-2", os.path.join(FX, "reads_2.fq"),
            "--read-format", "r1:0:49,r2:10:-1"]
    diff(run_ours(prefix, args), run_ref(args))


def test_interleaved(prefix, tmp_path):
    inter = tmp_path / "inter.fq"
    with open(os.path.join(FX, "reads_1.fq")) as f1, \
            open(os.path.join(FX, "reads_2.fq")) as f2, open(inter, "w") as out:
        while True:
            r1 = [f1.readline() for _ in range(4)]
            r2 = [f2.readline() for _ in range(4)]
            if not r1[0]:
                break
            out.writelines(r1)
            out.writelines(r2)
    args = ["-i", str(inter)]
    diff(run_ours(prefix, args), run_ref(args))


def test_merge_readpair(prefix):
    args = ["-1", os.path.join(FX, "reads_1.fq"), "-2", os.path.join(FX, "reads_2.fq"),
            "--merge-readpair"]
    diff(run_ours(prefix, args), run_ref(args))


@pytest.fixture(scope="module")
def barcode_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bc")
    rng = random.Random(5)
    whitelist = ["".join(rng.choice("ACGT") for _ in range(12)) for _ in range(20)]
    bc_path = tmp / "barcodes.fq"
    n_reads = sum(1 for _ in open(os.path.join(FX, "reads_1.fq"))) // 4
    with open(bc_path, "w") as f:
        for i in range(n_reads):
            bc = rng.choice(whitelist)
            if rng.random() < 0.3:  # inject a 1-bp error
                p = rng.randrange(12)
                bc = bc[:p] + rng.choice("ACGT") + bc[p + 1:]
            f.write("@bc%d\n%s\n+\n%s\n" % (i, bc, "I" * 12))
    wl_path = tmp / "whitelist.txt"
    with open(wl_path, "w") as f:
        f.write("\n".join(whitelist) + "\n")
    return str(bc_path), str(wl_path)


def test_barcode_umi_columns(prefix, barcode_files):
    bc_path, wl_path = barcode_files
    args = ["-1", os.path.join(FX, "reads_1.fq"), "-2", os.path.join(FX, "reads_2.fq"),
            "--barcode", bc_path, "--UMI", bc_path]
    diff(run_ours(prefix, args), run_ref(args))


def test_barcode_whitelist_correction(prefix, barcode_files):
    bc_path, wl_path = barcode_files
    args = ["-1", os.path.join(FX, "reads_1.fq"), "-2", os.path.join(FX, "reads_2.fq"),
            "--barcode", bc_path, "--barcode-whitelist", wl_path]
    diff(run_ours(prefix, args), run_ref(args))


def test_un_cl_dumps(prefix, tmp_path):
    ours_pre = str(tmp_path / "ours_un")
    ref_pre = str(tmp_path / "ref_un")
    args = ["-1", os.path.join(FX, "reads_1.fq"), "-2", os.path.join(FX, "reads_2.fq")]
    got = run_ours(prefix, args + ["--un", ours_pre, "--cl", ours_pre + "c"])
    want = run_ref(args + ["--un", ref_pre, "--cl", ref_pre + "c"])
    diff(got, want)
    for suffix in ["_1.fq.gz", "_2.fq.gz"]:
        for a, b in [(ours_pre, ref_pre), (ours_pre + "c", ref_pre + "c")]:
            with gzip.open(a + suffix) as f:
                ga = f.read()
            with gzip.open(b + suffix) as f:
                gb = f.read()
            assert ga == gb, "dump %s%s differs" % (a, suffix)


def test_sample_sheet(prefix, tmp_path):
    sheet_ours = tmp_path / "sheet_ours.tsv"
    sheet_ref = tmp_path / "sheet_ref.tsv"
    out1o, out2o = str(tmp_path / "s1_ours.tsv"), str(tmp_path / "s2_ours.tsv")
    out1r, out2r = str(tmp_path / "s1_ref.tsv"), str(tmp_path / "s2_ref.tsv")
    r1 = os.path.join(FX, "reads_1.fq")
    r2 = os.path.join(FX, "reads_2.fq")
    with open(sheet_ours, "w") as f:
        f.write("%s %s . . %s\n%s %s . . %s\n" % (r1, r2, out1o, r1, r2, out2o))
    with open(sheet_ref, "w") as f:
        f.write("%s %s . . %s\n%s %s . . %s\n" % (r1, r2, out1r, r1, r2, out2r))
    run_ours(prefix, ["--sample-sheet", str(sheet_ours)])
    subprocess.run([REF_BIN, "-x", os.path.join(FX, "refidx"),
                    "--sample-sheet", str(sheet_ref)],
                   check=True, capture_output=True)
    for a, b in [(out1o, out1r), (out2o, out2r)]:
        with open(a) as f:
            ga = f.read()
        with open(b) as f:
            gb = f.read()
        assert ga == gb

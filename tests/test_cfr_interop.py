"""Load reference-built .cfr indexes and verify identical classification."""

import os

import numpy as np
import pytest

from conftest import FIXTURE_DIR

FX = os.path.join(FIXTURE_DIR, "tiny")


@pytest.fixture(scope="module")
def cfr_index():
    from centrifuger_tpu.interop.cfr import load_cfr_index
    return load_cfr_index(os.path.join(FX, "refidx"))


def test_cfr_fm_structure(cfr_index):
    fm, tax, seq_length, meta = cfr_index
    assert meta.get("sequence_type") == "nucleotide"
    assert fm.sigma == 4
    assert fm.n > 0
    # BWT round-trip sanity: counts must match psum deltas
    codes = fm.bwt.decode()
    counts = np.bincount(codes, minlength=4)
    assert np.array_equal(np.cumsum(counts), fm.psum[1:])


def test_cfr_classification_matches_golden(cfr_index, tmp_path):
    from centrifuger_tpu.classify.engine_np import ClassifierNP
    from centrifuger_tpu.classify.params import ClassifierParam
    from centrifuger_tpu.io.readers import ReadFiles
    fm, tax, seq_length, meta = cfr_index
    cl = ClassifierNP(fm, tax, ClassifierParam())
    r1 = ReadFiles()
    r1.add_read_file(os.path.join(FX, "reads_1.fq"))
    r2 = ReadFiles()
    r2.add_read_file(os.path.join(FX, "reads_2.fq"))
    rows = []
    for a, b in zip(r1, r2):
        raw1 = np.frombuffer(a.seq.encode(), np.uint8)
        raw2 = np.frombuffer(b.seq.encode(), np.uint8)
        res = cl.query(raw1, raw2)
        if res.tax_ids:
            for i in range(len(res.tax_ids)):
                rows.append("%s\t%s\t%d\t%d\t%d\t%d\t%d\t%d" % (
                    a.id, res.seq_names[i], res.tax_ids[i], res.score,
                    res.secondary_score, res.hit_length, res.query_length,
                    len(res.tax_ids)))
        else:
            rows.append("%s\tunclassified\t0\t0\t0\t0\t%d\t1" % (a.id, res.query_length))
    with open(os.path.join(FX, "golden_class_k1.tsv")) as f:
        want = f.read().splitlines()[1:]
    assert rows == want

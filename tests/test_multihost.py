"""Multi-host serving: per-rank batch striping + shard merge must rebuild
the single-process TSV byte-for-byte (SURVEY 2.6-P2)."""

import io
import os
import sys

from conftest import FIXTURE_DIR
from test_golden_classify import get_index


def _run(prefix, fx, extra):
    from centrifuger_tpu.cli import classify_cli
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        classify_cli.main(["-x", prefix,
                           "-1", os.path.join(fx, "reads_1.fq"),
                           "-2", os.path.join(fx, "reads_2.fq"),
                           "--batch-size", "16"] + extra)
    finally:
        sys.stdout = old
    return buf.getvalue()


def test_two_rank_merge_identical(tmp_path, tmp_path_factory):
    from centrifuger_tpu.cli import merge_cli
    fx = os.path.join(FIXTURE_DIR, "tiny")
    prefix = get_index("tiny", tmp_path_factory)

    want = _run(prefix, fx, [])

    shard_args = []
    for r in range(2):
        idx = str(tmp_path / ("rank%d.idx" % r))
        out = _run(prefix, fx, ["--n-ranks", "2", "--rank", str(r),
                                "--rank-index", idx])
        tsv = str(tmp_path / ("rank%d.tsv" % r))
        with open(tsv, "w") as f:
            f.write(out)
        shard_args += ["--shard", tsv, idx]

    merged = str(tmp_path / "merged.tsv")
    argv = ["-o", merged]
    for i in range(0, len(shard_args), 3):
        argv += shard_args[i:i + 3]
    merge_cli.main(argv)
    with open(merged) as f:
        got = f.read()
    assert got == want

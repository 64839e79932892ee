"""Streaming exact report (quant/stream.py): byte-identical to the
in-memory host path on inputs that exercise every coupling — multi-bucket
spills, column-wide float inference flipped by dropped rows, blank interior
lines, short rows, ambiguity classes, summarize columns — plus CLI auto
and forced activation."""
import io
import os
import subprocess
import sys
from contextlib import redirect_stdout

import numpy as np
import pytest

from nimble_tpu.report.tsv import report
from nimble_tpu.quant.stream import stream_report

HDR = (
    "nimble_features\tnimble_score\tr1_CB\tr1_UB\tr2_CB\tr2_UB\t"
    "r1_POS\tr2_POS\tr1_forward_score\tr2_forward_score\tr1_GN\n"
)


def make_tsv(path, n_umis=400, float_scores=False, quirks=True, seed=0):
    rng = np.random.default_rng(seed)
    feats = ["A", "B", "C", "D", "A,B", "B,C", "A,B,C", "D,A"]
    with open(path, "w") as f:
        f.write(HDR)
        for u in range(n_umis):
            cb = f"CB{u % 37:03d}"
            umi = f"U{u:05d}"
            for _ in range(int(rng.integers(1, 6))):
                fe = feats[int(rng.integers(0, len(feats)))]
                s = float(rng.integers(1, 200))
                sv = f"{s + 0.5}" if float_scores else f"{int(s)}"
                f.write(
                    f"{fe}\t{sv}\t{cb}\t{umi}\t{cb}\t{umi}\t"
                    f"{int(rng.integers(0, 3000))}\t0\t{int(s)}\t0\tGN{u % 5}\n"
                )
            if quirks and u == 50:
                # NA score in a row that is later dropped for NA cb: must
                # still flip the whole column to float in both paths
                f.write(f"A\tNaN\t\tU99999\t\tU99999\t0\t0\t0\t0\t\n")
            if quirks and u == 60:
                f.write("\n")  # blank interior line = all-empty row
            if quirks and u == 70:
                f.write("B\t5\tCB000\tU00070\n")  # short row, padded with ''


def run_both(tmp_path, tsv_name="aln.tsv", bucket_bytes=1 << 12, **mk):
    tsv = str(tmp_path / tsv_name)
    make_tsv(tsv, **mk)
    mem_out = str(tmp_path / "mem.tsv")
    st_out = str(tmp_path / "st.tsv")
    cap_m, cap_s = io.StringIO(), io.StringIO()
    with redirect_stdout(cap_m):
        report(tsv, mem_out, stream=False)
    with redirect_stdout(cap_s):
        stream_report(tsv, st_out, bucket_bytes=bucket_bytes)
    return mem_out, st_out, cap_m.getvalue(), cap_s.getvalue()


def test_stream_matches_memory_int_scores(tmp_path):
    mem, st, out_m, out_s = run_both(tmp_path, quirks=False)
    assert open(mem, "rb").read() == open(st, "rb").read()
    assert open(mem).read().count("\n") > 50
    assert out_m == out_s  # "Dropped N UMIs..." line identical


def test_stream_matches_memory_quirks_and_floats(tmp_path):
    # quirks flip the score column to float via a dropped row
    mem, st, out_m, out_s = run_both(tmp_path, quirks=True)
    assert open(mem, "rb").read() == open(st, "rb").read()
    assert out_m == out_s


def test_stream_matches_memory_float_scores(tmp_path):
    mem, st, out_m, out_s = run_both(tmp_path, float_scores=True, quirks=False)
    assert open(mem, "rb").read() == open(st, "rb").read()
    assert out_m == out_s


def test_stream_multi_bucket_actually_spills(tmp_path):
    from nimble_tpu.quant.stream import _n_buckets

    tsv = str(tmp_path / "aln.tsv")
    make_tsv(tsv)
    assert _n_buckets(os.path.getsize(tsv), 1 << 12) > 4


def test_stream_summarize(tmp_path, monkeypatch):
    # the reference prepends the literal "summarize." to the whole output
    # path (reference __main__.py:296), so relative paths only
    monkeypatch.chdir(tmp_path)
    make_tsv("aln.tsv")
    with redirect_stdout(io.StringIO()):
        report("aln.tsv", "mem.tsv", ["r1_GN", "nimble_features"], stream=False)
        stream_report(
            "aln.tsv", "st.tsv", ["r1_GN", "nimble_features"],
            bucket_bytes=1 << 12,
        )
    assert open("mem.tsv", "rb").read() == open("st.tsv", "rb").read()
    assert (
        open("summarize.mem.tsv", "rb").read()
        == open("summarize.st.tsv", "rb").read()
    )


def test_stream_empty_and_headerless(tmp_path):
    empty = str(tmp_path / "e.tsv")
    open(empty, "w").close()
    out = str(tmp_path / "o.tsv")
    with redirect_stdout(io.StringIO()):
        stream_report(empty, out)
    assert os.path.getsize(out) == 0

    hdr_only = str(tmp_path / "h.tsv")
    with open(hdr_only, "w") as f:
        f.write(HDR)
    with redirect_stdout(io.StringIO()):
        stream_report(hdr_only, out)
    assert os.path.getsize(out) == 0


def test_cli_stream_flag(tmp_path):
    tsv = str(tmp_path / "aln.tsv")
    make_tsv(tsv, n_umis=50)
    mem_out = str(tmp_path / "mem.tsv")
    st_out = str(tmp_path / "st.tsv")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "nimble_tpu", "report", "-i", tsv, "-o", mem_out],
        check=True, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    subprocess.run(
        [sys.executable, "-m", "nimble_tpu", "report", "-i", tsv, "-o", st_out,
         "--stream"],
        check=True, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert open(mem_out, "rb").read() == open(st_out, "rb").read()


def test_auto_threshold_env(tmp_path, monkeypatch):
    tsv = str(tmp_path / "aln.tsv")
    make_tsv(tsv, n_umis=50)
    out = str(tmp_path / "o.tsv")
    ref = str(tmp_path / "r.tsv")
    monkeypatch.setenv("NIMBLE_TPU_REPORT_STREAM_MB", "0")  # force auto-stream
    called = {}
    import nimble_tpu.quant.stream as stream_mod

    orig = stream_mod.stream_report

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(stream_mod, "stream_report", spy)
    with redirect_stdout(io.StringIO()):
        report(tsv, out)  # stream=None -> auto
        report(tsv, ref, stream=False)
    assert called.get("yes")
    assert open(out, "rb").read() == open(ref, "rb").read()

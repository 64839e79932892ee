"""Run-log, throughput counter, and align checkpoint/resume tests."""
import json
import os

import numpy as np
import pytest

from nimble_tpu.observability import RunLog, Throughput
from nimble_tpu.align.pipeline import align_files
from nimble_tpu.io.fasta import write_fasta
from nimble_tpu.io.fastq import write_fastq
from nimble_tpu.library import generate


def test_runlog_events(tmp_path):
    path = str(tmp_path / "run.jsonl")
    log = RunLog(path)
    with log.stage("demo", foo=1):
        log.event("tick", n=2)
    log.close()
    events = [json.loads(l) for l in open(path)]
    assert [e["event"] for e in events] == ["stage_start", "tick", "stage_end"]
    assert events[0]["foo"] == 1
    assert events[2]["wall_s"] >= 0


def test_runlog_disabled_noop():
    log = RunLog(None)
    log.event("x")  # must not raise
    with log.stage("y"):
        pass


def test_throughput_counter(capsys):
    t = Throughput(report_every=10)
    t.add(5)
    t.add(6)
    out = capsys.readouterr().out
    assert "Processed 11 reads" in out
    final = t.final()
    assert final["reads"] == 11


@pytest.fixture
def small_workspace(tmp_path):
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, size=500))
    fasta = str(tmp_path / "lib.fasta")
    write_fasta(fasta, [("feat1", seq)])
    library = str(tmp_path / "lib.json")
    generate(fasta, None, library)
    reads = [(f"r{i}", seq[i % 400 : i % 400 + 80], "I" * 80) for i in range(100)]
    fq = str(tmp_path / "reads.fastq")
    write_fastq(fq, reads)
    return {"library": library, "fastq": fq, "dir": str(tmp_path)}


def test_align_resume(small_workspace):
    out = os.path.join(small_workspace["dir"], "out.tsv")
    # full run with small batches -> several progress checkpoints
    align_files(
        small_workspace["library"], out, [small_workspace["fastq"]],
        batch_records=16,
    )
    full = open(out).read()
    assert not os.path.exists(out + ".progress.json")

    # simulate an interrupted run: progress after 3 batches (48 reads)
    align_files(
        small_workspace["library"], out, [small_workspace["fastq"]],
        batch_records=16,
    )
    # craft a sidecar claiming 48 reads done; rows for first 48 reads
    # (every read aligns here, so rows == reads; +1 line for the header)
    byte_off = len("\n".join(full.split("\n")[: 48 + 1]).encode()) + 1
    with open(out + ".progress.json", "w") as f:
        json.dump(
            {
                "reads_done": 48,
                "rows_written": {out: 48},
                "bytes_written": {out: byte_off},
            },
            f,
        )
    # corrupt the tail to prove truncation works
    with open(out, "a") as f:
        f.write("GARBAGE\tROW\n")
    align_files(
        small_workspace["library"], out, [small_workspace["fastq"]],
        batch_records=16, resume=True,
    )
    resumed = open(out).read()
    assert resumed == full
    assert not os.path.exists(out + ".progress.json")

    # a legacy (batch-cursor) sidecar is refused with a nonzero exit code
    with open(out + ".progress.json", "w") as f:
        json.dump({"batches_done": 3, "rows_written": {out: 48}}, f)
    rc = align_files(
        small_workspace["library"], out, [small_workspace["fastq"]],
        batch_records=16, resume=True,
    )
    assert rc == 1
    os.remove(out + ".progress.json")


def test_align_trim(small_workspace):
    out = os.path.join(small_workspace["dir"], "trim_out.tsv")
    # strictness 1.0 = hard cap at the target length
    align_files(
        small_workspace["library"], out, [small_workspace["fastq"]],
        batch_records=64, trim="40:1",
    )
    scores = [int(l.split("\t")[1])
              for l in open(out).read().strip().split("\n")[1:]]
    assert scores and max(scores) <= 40

    # strictness 0.5 on 80bp reads: cut = round(0.5 * 40) = 20 -> 60bp
    align_files(
        small_workspace["library"], out, [small_workspace["fastq"]],
        batch_records=64, trim="40:0.5",
    )
    scores = [int(l.split("\t")[1])
              for l in open(out).read().strip().split("\n")[1:]]
    assert scores and max(scores) == 60


def test_align_trim_from_library_config(small_workspace):
    """A library whose Config carries edited trim settings trims without
    --trim (reference parity gap: VERDICT round 1, item 6)."""
    import json as _json

    lib2 = os.path.join(small_workspace["dir"], "lib_trim.json")
    raw = _json.load(open(small_workspace["library"]))
    raw[0]["trim_target_length"] = 30
    raw[0]["trim_strictness"] = 1.0
    with open(lib2, "w") as f:
        _json.dump(raw, f)
    out = os.path.join(small_workspace["dir"], "trim_cfg_out.tsv")
    align_files(lib2, out, [small_workspace["fastq"]], batch_records=64)
    scores = [int(l.split("\t")[1])
              for l in open(out).read().strip().split("\n")[1:]]
    assert scores and max(scores) <= 30

    # untouched library (default 50/0.9 fields): no trimming
    out2 = os.path.join(small_workspace["dir"], "untrim_out.tsv")
    align_files(small_workspace["library"], out2, [small_workspace["fastq"]],
                batch_records=64)
    scores = [int(l.split("\t")[1])
              for l in open(out2).read().strip().split("\n")[1:]]
    assert scores and max(scores) == 80

"""Multi-process align e2e: two OS processes, each aligning its owned spans
of the same FASTQ (NIMBLE_TPU_NUM_PROCS/NIMBLE_TPU_PROC_ID), with process 0
merging the shard files — output must be byte-identical to a single-process
run. This is the multi-host story the reference lacks entirely (SURVEY
§5.8: reference parallelism is `-c` threads on one host)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from nimble_tpu.__main__ import main as cli
from nimble_tpu.io.fasta import write_fasta
from nimble_tpu.io.fastq import write_fastq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import jax, sys
jax.config.update("jax_platforms", "cpu")
from nimble_tpu.__main__ import main
sys.exit(main(sys.argv[1:]))
"""


def rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp_align")
    rng = np.random.default_rng(23)
    backbone = rand_seq(rng, 800)
    alleles = []
    for i in range(8):
        s = list(backbone)
        s[60 + i * 90 : 60 + i * 90 + 45] = list(rand_seq(rng, 45))
        alleles.append((f"al{i}", "".join(s)))
    fasta = str(root / "lib.fasta")
    write_fasta(fasta, alleles)
    library = str(root / "library.json")
    assert cli(["generate", "--file", fasta, "--output_path", library]) == 0

    reads = []
    for r in range(4000):
        name, seq = alleles[r % len(alleles)]
        pos = int(rng.integers(0, len(seq) - 100))
        read = seq[pos : pos + 100]
        if r % 3 == 0:
            read = read[::-1].translate(str.maketrans("ACGT", "TGCA"))
        reads.append((f"r{r}", read, "I" * 100))
    fastq = str(root / "reads.fastq")
    write_fastq(fastq, reads)
    return {"root": root, "library": library, "fastq": fastq}


def run_proc(args, extra_env, wait=True):
    env = dict(os.environ)
    env.update(extra_env)
    # tiny reader batches force several spans so both processes own work
    env.setdefault("PYTHONPATH", REPO)
    p = subprocess.Popen(
        [sys.executable, "-c", RUNNER] + args,
        env=env,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    if not wait:
        return p
    out, _ = p.communicate(timeout=600)
    return p.returncode, out.decode()


def test_two_process_align_byte_equal(workspace):
    root = workspace["root"]
    single = str(root / "single.tsv")
    code, out = run_proc(
        [
            "align", "--reference", workspace["library"], "--output", single,
            "--input", workspace["fastq"], "--chunk-size", "256",
        ],
        {},
    )
    assert code == 0, out

    merged = str(root / "merged.tsv")
    base = [
        "align", "--reference", workspace["library"], "--output", merged,
        "--input", workspace["fastq"], "--chunk-size", "256",
    ]
    p1 = run_proc(
        base,
        {"NIMBLE_TPU_NUM_PROCS": "2", "NIMBLE_TPU_PROC_ID": "1"},
        wait=False,
    )
    code0, out0 = run_proc(
        base, {"NIMBLE_TPU_NUM_PROCS": "2", "NIMBLE_TPU_PROC_ID": "0"}
    )
    out1, _ = p1.communicate(timeout=600)
    assert p1.returncode == 0, out1.decode()
    assert code0 == 0, out0
    assert "Aligned 4000 read(-pair)s" in out0

    with open(single, "rb") as f:
        want = f.read()
    with open(merged, "rb") as f:
        got = f.read()
    assert got == want
    # shard scratch files are cleaned up by the merge
    leftovers = [p for p in os.listdir(root) if ".shard" in p]
    assert leftovers == []


def test_two_process_decode_sharded(workspace):
    """With -c (threaded reader) each process parses only ~its own half of
    the records (decode sharding via ThreadedFastqReader.set_skip); output
    stays byte-identical to a single-process run."""
    from nimble_tpu.io import native

    if not native.available():
        pytest.skip("native library unavailable")
    root = workspace["root"]
    single = str(root / "single_ds.tsv")
    # reader batches sized to the span (256 reads) so whole batches fall
    # inside single spans and become skippable
    env_common = {"NIMBLE_TPU_READER_BATCH": "256"}
    code, out = run_proc(
        [
            "align", "--reference", workspace["library"], "--output", single,
            "--input", workspace["fastq"], "--chunk-size", "256", "-c", "2",
        ],
        env_common,
    )
    assert code == 0, out

    merged = str(root / "merged_ds.tsv")
    base = [
        "align", "--reference", workspace["library"], "--output", merged,
        "--input", workspace["fastq"], "--chunk-size", "256", "-c", "2",
    ]
    p1 = run_proc(
        base,
        dict(env_common, NIMBLE_TPU_NUM_PROCS="2", NIMBLE_TPU_PROC_ID="1"),
        wait=False,
    )
    code0, out0 = run_proc(
        base, dict(env_common, NIMBLE_TPU_NUM_PROCS="2", NIMBLE_TPU_PROC_ID="0")
    )
    out1, _ = p1.communicate(timeout=600)
    assert p1.returncode == 0, out1.decode()
    assert code0 == 0, out0

    # each process parsed roughly half: 4000 reads, 256-read batches ->
    # 16 minimum-size batches; parity-owned spans plus the always-parsed
    # first batch and the tail batch bound parsing under ~70%
    import re

    m0 = re.search(r"Decode shard: parsed (\d+) skipped (\d+)", out0)
    m1 = re.search(r"Decode shard: parsed (\d+) skipped (\d+)", out1.decode())
    assert m0 and m1, (out0, out1.decode())
    for m in (m0, m1):
        parsed, skipped = int(m.group(1)), int(m.group(2))
        assert parsed + skipped == 4000
        assert parsed <= 0.7 * 4000, f"parsed {parsed} of 4000"

    with open(single, "rb") as f:
        want = f.read()
    with open(merged, "rb") as f:
        got = f.read()
    assert got == want


KILL_RUNNER = """
import jax, os, sys
jax.config.update("jax_platforms", "cpu")
import nimble_tpu.align.pipeline as P
_orig = P.LibraryRunner.emit_out
_calls = [0]
def _wrap(self, out, batch):
    n = _orig(self, out, batch)
    _calls[0] += 1
    if _calls[0] >= int(os.environ["KILL_AFTER_EMITS"]):
        os._exit(9)  # hard kill mid-run: no cleanup, partial state on disk
    return n
P.LibraryRunner.emit_out = _wrap
from nimble_tpu.__main__ import main
sys.exit(main(sys.argv[1:]))
"""


def test_multiproc_kill_and_resume(workspace):
    """Kill process 0 after 2 emitted spans, resume it with --resume:
    merged output must be byte-identical to a single-process run."""
    root = workspace["root"]
    single = str(root / "single_kr.tsv")
    code, out = run_proc(
        [
            "align", "--reference", workspace["library"], "--output", single,
            "--input", workspace["fastq"], "--chunk-size", "256",
        ],
        {},
    )
    assert code == 0, out

    merged = str(root / "merged_kr.tsv")
    base = [
        "align", "--reference", workspace["library"], "--output", merged,
        "--input", workspace["fastq"], "--chunk-size", "256",
    ]
    # process 1 runs to completion on its own shard
    code1, out1 = run_proc(
        base, {"NIMBLE_TPU_NUM_PROCS": "2", "NIMBLE_TPU_PROC_ID": "1"}
    )
    assert code1 == 0, out1

    # process 0 dies after 2 emitted spans (of its ~8)
    env0 = {"NIMBLE_TPU_NUM_PROCS": "2", "NIMBLE_TPU_PROC_ID": "0"}
    env = dict(os.environ, **env0, KILL_AFTER_EMITS="2", PYTHONPATH=REPO)
    p = subprocess.Popen(
        [sys.executable, "-c", KILL_RUNNER] + base,
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    outk, _ = p.communicate(timeout=600)
    assert p.returncode == 9, outk.decode()
    prog = str(root / "merged_kr.tsv.shard0.progress.json")
    assert os.path.exists(prog), "shard progress sidecar must survive the kill"

    # resume process 0: fast-forwards, truncates its shard, merges
    code0, out0 = run_proc(base + ["--resume"], env0)
    assert code0 == 0, out0
    assert "Resuming from read" in out0
    assert "Aligned 4000 read(-pair)s" in out0

    with open(single, "rb") as f:
        want = f.read()
    with open(merged, "rb") as f:
        got = f.read()
    assert got == want
    leftovers = [p for p in os.listdir(root) if ".shard" in p and "_kr" in p]
    assert leftovers == []

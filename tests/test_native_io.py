"""Native C++ IO layer tests: parity with the pure-Python FASTQ reader."""
import gzip

import numpy as np
import pytest

from nimble_tpu.io import native
from nimble_tpu.io.fastq import FastqReader, write_fastq

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def make_records(n, rng, min_len=40, max_len=120):
    recs = []
    for i in range(n):
        L = int(rng.integers(min_len, max_len + 1))
        seq = "".join("ACGTN"[j] for j in rng.integers(0, 5, size=L))
        qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 40, size=L))
        recs.append((f"read{i} extra description", seq, qual))
    return recs


@pytest.mark.parametrize("gz", [False, True])
def test_native_matches_python_reader(tmp_path, gz):
    rng = np.random.default_rng(0)
    recs = make_records(1000, rng)
    path = str(tmp_path / ("r.fastq" + (".gz" if gz else "")))
    write_fastq(path, recs)

    py_batches = list(FastqReader(path, batch_size=256, max_len=100))
    nat_batches = list(
        native.NativeFastqReader(path, batch_size=256, max_len=100, with_strings=True)
    )
    py_codes = np.concatenate([b["r1_codes"] for b in py_batches])
    nat_codes = np.concatenate([b["r1_codes"] for b in nat_batches])
    assert np.array_equal(py_codes, nat_codes)
    py_lens = np.concatenate([b["r1_lens"] for b in py_batches])
    nat_lens = np.concatenate([b["r1_lens"] for b in nat_batches])
    assert np.array_equal(py_lens, nat_lens)

    nat_names = [n for b in nat_batches for n in b["names"]]
    assert nat_names[0] == b"read0"
    assert len(nat_names) == 1000
    nat_quals = [q for b in nat_batches for q in b["r1_quals"]]
    assert nat_quals[5] == recs[5][2].encode()
    nat_seqs = [s for b in nat_batches for s in b["r1_seqs"]]
    assert nat_seqs[7] == recs[7][1].encode()


def test_native_paired(tmp_path):
    rng = np.random.default_rng(1)
    recs1 = make_records(100, rng)
    recs2 = make_records(100, rng)
    p1 = str(tmp_path / "r1.fastq")
    p2 = str(tmp_path / "r2.fastq.gz")
    write_fastq(p1, recs1)
    write_fastq(p2, recs2)
    batches = list(native.NativeFastqReader(p1, p2, batch_size=64, max_len=120))
    total = sum(b["r1_codes"].shape[0] for b in batches)
    assert total == 100
    assert all("r2_codes" in b for b in batches)


def test_native_empty_file(tmp_path):
    path = str(tmp_path / "empty.fastq")
    open(path, "w").close()
    assert list(native.NativeFastqReader(path, batch_size=16, max_len=50)) == []

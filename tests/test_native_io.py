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


def test_native_bam_matches_python(tmp_path):
    from nimble_tpu.io.bam import BamRecord, BamWriter, iter_bam_batches
    from nimble_tpu.io.native import iter_native_bam_batches

    path = str(tmp_path / "x.bam")
    with BamWriter(path, "@HD\tVN:1.6\tSO:queryname\n") as w:
        w.write(BamRecord("r1", 77, "ACGTACGTAC", None, pos=-1, tags={"CB": "CB1", "UB": "U1", "GN": "g"}))
        w.write(BamRecord("r1", 141, "TTTTAAAACC", None, tags={"CB": "CB1", "UB": "U1"}))
        w.write(BamRecord("solo", 4, "GGGGNNCC", None, tags={"CB": "CB2", "UB": "U2"}))
        w.write(BamRecord("sec", 260, "AAAA", None))  # secondary: skipped

    def merge(batches):
        out = {}
        for key in batches[0]:
            vals = [b[key] for b in batches]
            if isinstance(vals[0], np.ndarray):
                out[key] = np.concatenate(vals)
            else:
                out[key] = [x for v in vals for x in v]
        return out

    py = merge(list(iter_bam_batches(path, max_len=16)))
    nat = merge(list(iter_native_bam_batches(path, max_len=16)))
    assert nat["names"] == py["names"]
    assert nat["cbs"] == py["cbs"]
    assert nat["umis"] == py["umis"]
    assert nat["gns"][0] == "g"
    assert np.array_equal(nat["r1_codes"], py["r1_codes"])
    assert np.array_equal(nat["r2_codes"], py["r2_codes"])
    assert np.array_equal(nat["r1_lens"], py["r1_lens"])
    assert nat["poss"] == py["poss"]


def test_native_bam_pairing_across_batches(tmp_path):
    from nimble_tpu.io.bam import BamRecord, BamWriter
    from nimble_tpu.io.native import iter_native_bam_batches

    path = str(tmp_path / "many.bam")
    with BamWriter(path, "@HD\tVN:1.6\n") as w:
        for i in range(10):
            w.write(BamRecord(f"p{i}", 77, "ACGTACGT", None, tags={"CB": "C", "UB": f"U{i}"}))
            w.write(BamRecord(f"p{i}", 141, "TTTTAAAA", None, tags={"CB": "C", "UB": f"U{i}"}))
    # batch size 3 forces pairs to straddle batch boundaries
    batches = list(iter_native_bam_batches(path, batch_records=3, max_len=8))
    names = [n for b in batches for n in b["names"]]
    assert names == [f"p{i}" for i in range(10)]
    for b in batches:
        assert (b["r2_lens"] > 0).all()


def test_prefetch_iter_closes_inner_generator_on_abandonment():
    """An abandoned consumer (error mid-run) must still run the inner
    generator's finally (reader close) instead of leaving the producer
    blocked on a full queue forever (round-5 review finding)."""
    import time

    from nimble_tpu.align.pipeline import _prefetch_iter

    closed = []

    def inner():
        try:
            for i in range(100):
                yield i
        finally:
            closed.append(True)

    g = _prefetch_iter(inner(), depth=2)
    assert next(g) == 0
    g.close()  # abandon
    for _ in range(50):  # producer notices within its put timeout
        if closed:
            break
        time.sleep(0.05)
    assert closed, "inner generator finally never ran"


def test_encode_bam_pairs_long_name_raises_value_error():
    from nimble_tpu.io import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    import pytest

    with pytest.raises(ValueError, match="254"):
        native.encode_bam_pairs(
            [b"x" * 300], [b"ACGT"], [b"IIII"], [b"ACGT"], [b"IIII"],
            [b"AAAA"], [b"CCCC"],
        )


def test_extract_strings_rescan_beyond_margin():
    """A tail string longer than the 64 KiB NUL-scan margin triggers the
    full-buffer rescan instead of an IndexError (round-5 review)."""
    import numpy as np

    from nimble_tpu.io.native import _extract_strings

    long_s = b"G" * 100_000
    parts = [b"name0", b"seq0", b"qual0", b"name1", long_s, b"qual1"]
    offs = []
    raw = bytearray()
    for p in parts:
        offs.append(len(raw))
        raw += p + b"\x00"
    raw += b"\xff" * 64  # trailing garbage without NULs is fine
    raw_arr = np.frombuffer(bytes(raw), dtype=np.uint8)
    offs_arr = np.asarray(offs, dtype=np.int64)
    out = _extract_strings(raw_arr, offs_arr, 1, 2)
    assert out == [b"seq0", long_s]

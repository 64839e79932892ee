"""BAM/BGZF codec tests: roundtrip, gzip compatibility, batch iteration."""
import gzip
import struct

import numpy as np

from nimble_tpu.io.bam import (
    BamReader,
    BamRecord,
    BamWriter,
    BgzfWriter,
    iter_bam_batches,
)


def test_bgzf_blocks_are_gzip_readable(tmp_path):
    path = str(tmp_path / "x.bgzf")
    w = BgzfWriter(path)
    payload = b"hello world " * 20000  # spans multiple blocks
    w.write(payload)
    w.close()
    with gzip.open(path, "rb") as f:
        assert f.read() == payload


def test_bam_roundtrip(tmp_path):
    path = str(tmp_path / "x.bam")
    recs = [
        BamRecord("read1", 77, "ACGTN", bytes([30, 31, 32, 33, 2]), tags={"CB": "AAAC", "UB": "TTTT"}),
        BamRecord("read1", 141, "GGGGCCCC", bytes([40] * 8), tags={"CB": "AAAC", "UB": "TTTT"}),
        BamRecord("read2", 4, "TTT", None, tags={"XS": 42}),
    ]
    with BamWriter(path, "@HD\tVN:1.6\tSO:queryname\n") as w:
        for r in recs:
            w.write(r)
    reader = BamReader(path)
    assert "SO:queryname" in reader.header_text
    got = list(reader)
    assert len(got) == 3
    for a, b in zip(recs, got):
        assert a.name == b.name
        assert a.flag == b.flag
        assert a.seq == b.seq
    assert got[0].qual == recs[0].qual
    assert got[0].tags["CB"] == "AAAC"
    assert got[0].tags["UB"] == "TTTT"
    assert got[2].tags["XS"] == 42
    assert got[2].qual is None


def test_iter_bam_batches_pairs(tmp_path):
    path = str(tmp_path / "p.bam")
    with BamWriter(path, "@HD\tVN:1.6\tSO:queryname\n") as w:
        w.write(BamRecord("r1", 77, "ACGTACGT", None, tags={"CB": "CB1", "UB": "U1"}))
        w.write(BamRecord("r1", 141, "TTTTAAAA", None, tags={"CB": "CB1", "UB": "U1"}))
        w.write(BamRecord("solo", 4, "GGGG", None, tags={"CB": "CB2", "UB": "U2"}))
    batches = list(iter_bam_batches(path, max_len=16))
    assert len(batches) == 1
    b = batches[0]
    assert b["names"] == ["r1", "solo"]
    assert b["cbs"] == ["CB1", "CB2"]
    assert b["umis"] == ["U1", "U2"]
    assert b["r1_lens"].tolist() == [8, 4]
    assert b["r2_lens"].tolist() == [8, 0]  # solo has empty r2


def test_bam_eof_marker(tmp_path):
    path = str(tmp_path / "e.bam")
    with BamWriter(path, "@HD\tVN:1.6\n") as w:
        pass
    data = open(path, "rb").read()
    # BGZF EOF block present at the tail
    assert data.endswith(bytes.fromhex("1f8b08040000000000ff0600424302001b0003000000000000000000"))


def test_native_bgzf_compress_byte_identical(tmp_path):
    """BgzfWriter with the native parallel block compressor
    (io.native.bgzf_compress, OpenMP over 0xFF00-byte payloads) produces
    byte-identical files to the serial python zlib path, at any write
    granularity (block payload boundaries are a writer invariant)."""
    from nimble_tpu.io import native
    from nimble_tpu.io.bam import BgzfWriter

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    data = (
        rng.integers(0, 256, size=3 * 0xFF00 + 777, dtype=np.uint8).tobytes()
        + b"ACGTACGT" * 50_000
    )
    py_path = tmp_path / "py.bgzf"
    nat_path = tmp_path / "nat.bgzf"
    w = BgzfWriter(str(py_path))
    w._native_compress = None  # force the serial python path
    w.write(data)
    w.close()
    w = BgzfWriter(str(nat_path))
    assert w._native_compress is not None
    for i in range(0, len(data), 12345):  # odd granularity
        w.write(data[i : i + 12345])
    w.close()
    assert py_path.read_bytes() == nat_path.read_bytes()
    with gzip.open(nat_path, "rb") as f:
        assert f.read() == data

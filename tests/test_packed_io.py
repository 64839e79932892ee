"""Packed wire-format tests: 2-bit words + sparse N sidecar host->device.

The packed path must be bit-identical to the int8 codes path end to end
(io/packing.py docstring): N restoration, padding-as-A, sidecar overflow
to dense flags, span carving, and the CLI pipeline with auto max_len.
"""
import os

import numpy as np
import pytest

from nimble_tpu import seq as seqmod
from nimble_tpu.align.engine import AlignEngine
from nimble_tpu.align.pipeline import SpanFeeder, align_files
from nimble_tpu.config import Config, Data
from nimble_tpu.index.builder import build_index
from nimble_tpu.io.fasta import write_fasta
from nimble_tpu.io.fastq import write_fastq
from nimble_tpu.io.packing import pack_batch, pack_codes, pack_codes_np
from nimble_tpu.library import generate


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(7)
    data = Data()
    seqs = []
    for i in range(6):
        s = rng.integers(0, 4, size=300).astype(np.int8)
        seqs.append(s)
        data.columns[0].append("lib")
        data.columns[1].append(f"f{i}")
        data.columns[2].append("300")
        data.columns[3].append(seqmod.decode(s))
    config = Config()
    return build_index(data, config, k=21), config, seqs


def _reads(seqs, B=200, L=90, n_rate=0.02, seed=11):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=(B, 256)).astype(np.int8)
    for i in range(0, B, 2):
        src = seqs[i % len(seqs)]
        st = int(rng.integers(0, len(src) - L))
        codes[i, :L] = src[st : st + L]
    codes[rng.random(codes.shape) < n_rate] = 4
    lens = rng.integers(25, L + 1, size=B).astype(np.int32)
    return codes, lens


def test_pack_native_matches_numpy(small_index):
    _, _, seqs = small_index
    codes, lens = _reads(seqs, n_rate=0.05)
    for L in (64, 90, 96):
        w1, i1, r1 = pack_codes(codes, lens, L)
        w2, i2, r2 = pack_codes_np(codes, lens, L)
        assert np.array_equal(w1, w2)
        assert np.array_equal(i1, i2)
        assert np.array_equal(r1, r2)
    # N beyond a read's length must not flag the read
    codes2 = np.zeros((2, 64), dtype=np.int8)
    codes2[0, 10:] = 4
    lens2 = np.array([10, 64], dtype=np.int32)
    _, nidx, _ = pack_codes(codes2, lens2, 64)
    assert nidx.size == 0


@pytest.mark.parametrize("paired", [False, True])
@pytest.mark.parametrize("scan", [1, 3])
def test_engine_packed_equals_codes(small_index, paired, scan):
    index, config, seqs = small_index
    codes, lens = _reads(seqs)
    L = 96
    eng = AlignEngine(
        index, config, chunk_size=64, max_len=L, paired=paired, scan_chunks=scan
    )
    batch = {"r1_codes": codes, "r1_lens": lens}
    if paired:
        batch["r2_codes"] = codes[::-1].copy()
        batch["r2_lens"] = lens[::-1].copy()
    ref = eng.collect_async(
        eng.align_batch_async(
            batch["r1_codes"][:, :L],
            batch["r1_lens"],
            batch.get("r2_codes")[:, :L] if paired else None,
            batch.get("r2_lens"),
        )
    )
    pb = pack_batch(batch, L)
    got = eng.collect_async(eng.align_packed_async(pb))
    for k in ref:
        assert np.array_equal(ref[k], got[k]), k
    if scan > 1:
        # overflow the sidecar -> dense-flag dispatch variant
        eng.sidecar_cap = 0
        got2 = eng.collect_async(eng.align_packed_async(pb))
        for k in ref:
            assert np.array_equal(ref[k], got2[k]), ("dense", k)


def test_stacked_packed_equals_codes(small_index):
    from nimble_tpu.align.stacked import StackedEngine

    index, config, seqs = small_index
    rng = np.random.default_rng(5)
    data2 = Data()
    for i in range(4):
        s = rng.integers(0, 4, size=250).astype(np.int8)
        data2.columns[0].append("lib2")
        data2.columns[1].append(f"g{i}")
        data2.columns[2].append("250")
        data2.columns[3].append(seqmod.decode(s))
    index2 = build_index(data2, config, k=21)
    codes, lens = _reads(seqs)
    L = 96
    eng = StackedEngine(
        [index, index2], [config, config], chunk_size=64, max_len=L, scan_chunks=2
    )
    ref = eng.collect_async(eng.align_batch_async(codes[:, :L], lens))
    pb = pack_batch({"r1_codes": codes, "r1_lens": lens}, L)
    got = eng.collect_async(eng.align_packed_async(pb))
    for lib_ref, lib_got in zip(ref, got):
        for k in lib_ref:
            assert np.array_equal(lib_ref[k], lib_got[k]), k


def test_span_feeder_carving(small_index):
    _, _, seqs = small_index
    rng = np.random.default_rng(3)
    feeder = SpanFeeder(span=128, paired=False)
    all_pbs = []
    total = 0
    spans = []
    for bsize in (50, 200, 17, 300, 9):
        codes, lens = _reads(seqs, B=bsize, seed=total + 1)
        pb = pack_batch(
            {"r1_codes": codes, "r1_lens": lens, "cbs": [f"c{total+i}" for i in range(bsize)]},
            96,
        )
        all_pbs.append(pb)
        total += bsize
        spans.extend(feeder.add(pb))
    tail = feeder.flush()
    if tail is not None:
        spans.append(tail)
    # every span except the last is exactly span-sized, total preserved
    assert all(s["r1_lens"].shape[0] == 128 for s in spans[:-1])
    assert sum(s["r1_lens"].shape[0] for s in spans) == total
    # reassembled arrays equal the concatenated originals
    cat_words = np.concatenate([p["r1_words"] for p in all_pbs])
    got_words = np.concatenate([s["r1_words"] for s in spans])
    assert np.array_equal(cat_words, got_words)
    cat_cbs = [c for p in all_pbs for c in p["cbs"]]
    got_cbs = [c for s in spans for c in s["cbs"]]
    assert cat_cbs == got_cbs
    # N sidecar: rebuild dense planes both ways and compare
    def dense(pb, n):
        d = np.zeros((n, pb["r1_nrows"].shape[1]), dtype=np.int32)
        d[pb["r1_nidx"]] = pb["r1_nrows"]
        return d
    cat_dense = np.concatenate([dense(p, p["r1_lens"].shape[0]) for p in all_pbs])
    got_dense = np.concatenate([dense(s, s["r1_lens"].shape[0]) for s in spans])
    assert np.array_equal(cat_dense, got_dense)


@pytest.fixture
def cli_workspace(tmp_path):
    rng = np.random.default_rng(13)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, size=600))
    fasta = str(tmp_path / "lib.fasta")
    write_fasta(fasta, [("feat1", seq)])
    library = str(tmp_path / "lib.json")
    generate(fasta, None, library)
    reads = []
    for i in range(120):
        s = seq[i % 500 : i % 500 + 80]
        if i % 7 == 0:  # sprinkle N's
            s = s[:40] + "N" + s[41:]
        reads.append((f"r{i}", s, "I" * len(s)))
    fq = str(tmp_path / "reads.fastq")
    write_fastq(fq, reads)
    return {"library": library, "fastq": fq, "dir": str(tmp_path)}


def test_align_files_packed_matches_int8(cli_workspace):
    out_p = os.path.join(cli_workspace["dir"], "packed.tsv")
    out_c = os.path.join(cli_workspace["dir"], "codes.tsv")
    align_files(cli_workspace["library"], out_p, [cli_workspace["fastq"]],
                batch_records=32)
    os.environ["NIMBLE_TPU_NO_PACKED"] = "1"
    try:
        align_files(cli_workspace["library"], out_c, [cli_workspace["fastq"]],
                    batch_records=32)
    finally:
        del os.environ["NIMBLE_TPU_NO_PACKED"]
    assert open(out_p).read() == open(out_c).read()


def test_align_files_auto_maxlen_rebuild(tmp_path):
    """Reads longer than the first batch's max trigger a transparent engine
    rebuild at a wider packed width, with output equal to a fixed-width run."""
    rng = np.random.default_rng(17)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, size=600))
    fasta = str(tmp_path / "lib.fasta")
    write_fasta(fasta, [("feat1", seq)])
    library = str(tmp_path / "lib.json")
    generate(fasta, None, library)
    reads = [(f"s{i}", seq[i : i + 60], "I" * 60) for i in range(40)]
    reads += [(f"l{i}", seq[i : i + 150], "I" * 150) for i in range(40)]
    fq = str(tmp_path / "mixed.fastq")
    write_fastq(fq, reads)
    out_a = str(tmp_path / "auto.tsv")
    out_f = str(tmp_path / "fixed.tsv")
    align_files(library, out_a, [fq], batch_records=16)  # auto max_len
    align_files(library, out_f, [fq], batch_records=16, max_len=160)
    assert open(out_a).read() == open(out_f).read()

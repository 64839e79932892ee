"""Threaded FASTQ ingestion (io/threaded.py): byte-stream parity with the
sequential readers at any thread count — this is what `align -c` drives
(reference threads its whole hot path with -c, reference __main__.py:180)."""
import numpy as np
import pytest

from nimble_tpu.io import native
from nimble_tpu.io.fastq import write_fastq

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def make_records(n, rng, min_len=40, max_len=120):
    recs = []
    for i in range(n):
        L = int(rng.integers(min_len, max_len + 1))
        seq = "".join("ACGTN"[j] for j in rng.integers(0, 5, size=L))
        qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 40, size=L))
        recs.append((f"read{i} desc", seq, qual))
    return recs


def merged(batches, key):
    return np.concatenate([b[key] for b in batches])


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("threads", [1, 4])
def test_threaded_matches_native(tmp_path, gz, threads):
    from nimble_tpu.io.threaded import ThreadedFastqReader

    rng = np.random.default_rng(7)
    recs = make_records(1503, rng)  # non-multiple of batch size: remainder path
    path = str(tmp_path / ("r.fastq" + (".gz" if gz else "")))
    write_fastq(path, recs)

    ref = list(native.NativeFastqReader(path, batch_size=256, max_len=100))
    thr = list(
        ThreadedFastqReader(
            path, batch_size=256, max_len=100, num_threads=threads
        )
    )
    # identical batch partition, not just identical concatenation
    assert [b["r1_codes"].shape[0] for b in thr] == [
        b["r1_codes"].shape[0] for b in ref
    ]
    assert np.array_equal(merged(thr, "r1_codes"), merged(ref, "r1_codes"))
    assert np.array_equal(merged(thr, "r1_lens"), merged(ref, "r1_lens"))


def test_threaded_paired_and_strings(tmp_path):
    from nimble_tpu.io.threaded import ThreadedFastqReader

    rng = np.random.default_rng(8)
    recs1 = make_records(300, rng)
    recs2 = make_records(300, rng)
    p1 = str(tmp_path / "r1.fastq.gz")
    p2 = str(tmp_path / "r2.fastq")
    write_fastq(p1, recs1)
    write_fastq(p2, recs2)

    thr = list(
        ThreadedFastqReader(
            p1, p2, batch_size=128, max_len=120, num_threads=3, with_strings=True
        )
    )
    ref = list(
        native.NativeFastqReader(p1, p2, batch_size=128, max_len=120, with_strings=True)
    )
    assert np.array_equal(merged(thr, "r2_codes"), merged(ref, "r2_codes"))
    names = [n for b in thr for n in b["names"]]
    assert names == [n for b in ref for n in b["names"]]
    quals = [q for b in thr for q in b["r2_quals"]]
    assert quals == [r[2].encode() for r in recs2]


def test_threaded_unequal_pair_counts_raise(tmp_path):
    from nimble_tpu.io.threaded import ThreadedFastqReader

    rng = np.random.default_rng(9)
    p1 = str(tmp_path / "r1.fastq")
    p2 = str(tmp_path / "r2.fastq")
    write_fastq(p1, make_records(100, rng))
    write_fastq(p2, make_records(90, rng))
    with pytest.raises(ValueError, match="different record counts"):
        list(ThreadedFastqReader(p1, p2, batch_size=32, max_len=120, num_threads=2))


@pytest.fixture(scope="module")
def hla_library(tmp_path_factory):
    """A tiny generated library plus a FASTQ of reads drawn from it."""
    from nimble_tpu.__main__ import main as cli
    from nimble_tpu.io.fasta import write_fasta

    root = tmp_path_factory.mktemp("thrd")
    rng = np.random.default_rng(11)
    backbone = "".join("ACGT"[i] for i in rng.integers(0, 4, size=500))
    alleles = []
    for i in range(3):
        s = list(backbone)
        s[50 + i * 100 : 90 + i * 100] = list(
            "".join("ACGT"[j] for j in rng.integers(0, 4, size=40))
        )
        alleles.append((f"al{i}", "".join(s)))
    fasta = str(root / "lib.fasta")
    write_fasta(fasta, alleles)
    lib_path = str(root / "lib.json")
    assert cli(["generate", "--file", fasta, "--output_path", lib_path]) == 0

    recs = []
    for i in range(333):
        src = alleles[i % 3][1]
        start = int(rng.integers(0, len(src) - 80))
        recs.append((f"rd{i}", src[start : start + 80], "I" * 80))
    reads = str(root / "reads.fastq.gz")
    write_fastq(reads, recs)
    return lib_path, reads


def test_align_num_cores_byte_identical(tmp_path, hla_library):
    """align -c 4 produces byte-identical TSVs to -c 1."""
    from nimble_tpu.align.pipeline import align_files

    lib_path, reads = hla_library
    out1 = str(tmp_path / "o1.tsv")
    out4 = str(tmp_path / "o4.tsv")
    rc1 = align_files(lib_path, out1, [reads], batch_records=64, num_cores=1)
    rc4 = align_files(lib_path, out4, [reads], batch_records=64, num_cores=4)
    assert rc1 == 0 and rc4 == 0
    assert open(out1, "rb").read() == open(out4, "rb").read()


def test_align_failure_exit_code(tmp_path, hla_library):
    """Reader/engine failures surface as a nonzero exit code (reference
    propagates the aligner's code, reference __main__.py:439-440)."""
    from nimble_tpu.align.pipeline import align_files

    lib_path, _ = hla_library
    out = str(tmp_path / "o.tsv")
    rc = align_files(lib_path, out, [str(tmp_path / "missing.fastq")])
    assert rc != 0

"""Tests for host-side sequence encoding and k-mer packing."""
import numpy as np

from nimble_tpu import seq


def test_encode_decode_roundtrip():
    s = "ACGTNACGT"
    codes = seq.encode(s)
    assert codes.tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3]
    assert seq.decode(codes) == s


def test_lowercase_and_u():
    assert seq.encode("acgu").tolist() == [0, 1, 2, 3]


def test_revcomp():
    assert seq.revcomp("ACGT") == "ACGT"
    assert seq.revcomp("AACGN") == "NCGTT"


def test_encode_batch_padding():
    codes, lens = seq.encode_batch(["ACG", "ACGTA"], max_len=4)
    assert codes.shape == (2, 4)
    assert lens.tolist() == [3, 4]
    assert codes[0].tolist() == [0, 1, 2, seq.N_CODE]
    assert codes[1].tolist() == [0, 1, 2, 3]  # truncated


def test_kmer_codes_basic():
    codes = seq.encode("ACGT")
    kmers, valid = seq.kmer_codes_u64(codes, 2)
    # AC=0b0001=1, CG=0b0110=6, GT=0b1011=11
    assert kmers.tolist() == [1, 6, 11]
    assert valid.all()


def test_kmer_codes_n_invalidates_window():
    codes = seq.encode("ACNGT")
    _, valid = seq.kmer_codes_u64(codes, 2)
    assert valid.tolist() == [True, False, False, True]


def test_revcomp_kmer_u64_matches_string_revcomp():
    rng = np.random.default_rng(0)
    for k in (5, 21, 31):
        s = "".join("ACGT"[i] for i in rng.integers(0, 4, size=k))
        code, valid = seq.kmer_codes_u64(seq.encode(s), k)
        assert valid.all()
        rc_code, _ = seq.kmer_codes_u64(seq.encode(seq.revcomp(s)), k)
        assert seq.revcomp_kmer_u64(code, k).tolist() == rc_code.tolist()

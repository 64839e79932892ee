"""K-mer index builder tests: hash-table exactness against a brute-force
oracle, class assignment, bitsets, grouping, mismatch expansion."""
import numpy as np
import pytest

from nimble_tpu import seq as seqmod
from nimble_tpu.config import Config, Data
from nimble_tpu.index.builder import build_index
from nimble_tpu.index.hashing import bucket_hashes_jnp, bucket_hashes_np


def make_data(seqs, names=None, extra=None):
    data = Data()
    names = names or [f"f{i}" for i in range(len(seqs))]
    for i, s in enumerate(seqs):
        data.columns[0].append("lib")
        data.columns[1].append(names[i])
        data.columns[2].append(str(len(s)))
        data.columns[3].append(s)
    if extra:
        for header, col in extra.items():
            data.headers.append(header)
            data.columns.append(col)
    return data


def brute_force_kmer_map(seqs, k):
    m = {}
    for fid, s in enumerate(seqs):
        codes = seqmod.encode(s)
        km, valid = seqmod.kmer_codes_u64(codes, k)
        for c in km[valid]:
            m.setdefault(int(c), set()).add(fid)
    return m


def rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


def test_index_matches_bruteforce_oracle():
    rng = np.random.default_rng(42)
    # overlapping sequences to force shared k-mers / multi-feature classes
    base = rand_seq(rng, 500)
    seqs = [base[:300], base[200:500], rand_seq(rng, 400), base[:150] + rand_seq(rng, 100)]
    k = 15
    idx = build_index(make_data(seqs), Config(), k=k)
    oracle = brute_force_kmer_map(seqs, k)
    # canonical entries: distinct forward k-mers that are reverse
    # complements of each other share one table entry
    assert 0 < idx.n_kmers <= len(oracle)

    codes = np.array(sorted(oracle), dtype=np.uint64)
    hi = (codes >> np.uint64(32)).astype(np.uint32)
    lo = (codes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    cls = idx.lookup_np(hi, lo)
    assert (cls >= 0).all()
    for code, cid in zip(codes, cls):
        assert set(idx.class_feature_list(int(cid))) == oracle[int(code)]

    # misses must return -1
    miss_codes = []
    c = 1
    while len(miss_codes) < 100:
        if c not in oracle:
            miss_codes.append(c)
        c += 7919
    mc = np.array(miss_codes, dtype=np.uint64)
    got = idx.lookup_np(
        (mc >> np.uint64(32)).astype(np.uint32), (mc & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    )
    assert (got == -1).all()


def test_class_bitsets_match_csr():
    rng = np.random.default_rng(1)
    seqs = [rand_seq(rng, 200) for _ in range(40)]  # >32 features => 2 words
    idx = build_index(make_data(seqs), Config(), k=13)
    assert idx.bitset_words == 2
    for cid in range(idx.n_classes):
        feats = idx.class_feature_list(cid)
        bits = idx.class_bits[cid]
        decoded = [
            w * 32 + b for w in range(idx.bitset_words) for b in range(32) if bits[w] >> b & 1
        ]
        assert decoded == sorted(feats)


def test_duplicate_sequence_names_share_feature_id():
    seqs = ["ACGTACGTACGTACGT", "TTTTTTTTTTTTTTTT"]
    idx = build_index(make_data(seqs, names=["A", "A"]), Config(), k=9)
    assert idx.n_features == 1


def test_group_on_mapping():
    rng = np.random.default_rng(2)
    seqs = [rand_seq(rng, 100) for _ in range(4)]
    data = make_data(seqs, names=["a1", "a2", "b1", "b2"], extra={"lineage": ["L1", "L1", "L2", "L2"]})
    idx = build_index(data, Config(group_on="lineage"), k=11)
    assert idx.group_names == ["L1", "L2"]
    assert idx.feature_to_group.tolist() == [0, 0, 1, 1]


def test_group_on_missing_column_raises():
    with pytest.raises(ValueError):
        build_index(make_data(["ACGTACGTACGTACGT"]), Config(group_on="nope"), k=9)


def test_hamming1_expansion():
    s = "ACGTACGTACGTACG"
    k = 15
    idx = build_index(make_data([s]), Config(num_mismatches=1), k=k)
    # the exact k-mer and any single-substitution variant must hit
    code, valid = seqmod.kmer_codes_u64(seqmod.encode(s), k)
    assert valid.all()
    variant = code[0] ^ np.uint64(0b11 << 6)  # flip one base
    for q in (code[0], variant):
        hi = np.array([q >> np.uint64(32)], dtype=np.uint32)
        lo = np.array([q & np.uint64(0xFFFFFFFF)], dtype=np.uint32)
        assert idx.lookup_np(hi, lo)[0] >= 0
    # a 2-substitution variant must miss
    variant2 = variant ^ np.uint64(0b11 << 12)
    hi = np.array([variant2 >> np.uint64(32)], dtype=np.uint32)
    lo = np.array([variant2 & np.uint64(0xFFFFFFFF)], dtype=np.uint32)
    assert idx.lookup_np(hi, lo)[0] == -1


def test_hamming2_expansion():
    """num_mismatches=2: double-substitution variants hit, triples miss
    (VERDICT round 1, item 9; reference contract: nimble/types.py:14)."""
    s = "ACGTACGTACGTACG"
    k = 15
    idx = build_index(make_data([s]), Config(num_mismatches=2), k=k)
    code, valid = seqmod.kmer_codes_u64(seqmod.encode(s), k)
    assert valid.all()
    v1 = code[0] ^ np.uint64(0b11 << 6)
    v2 = v1 ^ np.uint64(0b01 << 12)
    v3 = v2 ^ np.uint64(0b10 << 20)
    for q, expect_hit in ((code[0], True), (v1, True), (v2, True), (v3, False)):
        hi = np.array([q >> np.uint64(32)], dtype=np.uint32)
        lo = np.array([q & np.uint64(0xFFFFFFFF)], dtype=np.uint32)
        got = idx.lookup_np(hi, lo)[0]
        assert (got >= 0) == expect_hit, hex(int(q))
    # mismatch expansion disables group entries
    assert not idx.has_pairs


def test_num_mismatches_contract_errors(monkeypatch):
    s = "ACGTACGTACGTACGTACGT"
    with pytest.raises(ValueError, match="num_mismatches=3"):
        build_index(make_data([s]), Config(num_mismatches=3), k=15)
    # the Hamming-2 size guard fails loudly, before allocation
    import nimble_tpu.index.builder as B

    monkeypatch.setattr(B, "HAMMING2_MAX_ENTRIES", 100)
    with pytest.raises(ValueError, match="index entries"):
        build_index(make_data([s]), Config(num_mismatches=2), k=15)


def test_hash_np_jnp_parity():
    rng = np.random.default_rng(3)
    hi = rng.integers(0, 2**32, size=1000, dtype=np.uint32)
    lo = rng.integers(0, 2**32, size=1000, dtype=np.uint32)
    h1n, h2n = bucket_hashes_np(hi, lo, 1 << 16)
    h1j, h2j = bucket_hashes_jnp(hi, lo, 1 << 16)
    assert np.array_equal(h1n, np.asarray(h1j))
    assert np.array_equal(h2n, np.asarray(h2j))


def test_index_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    seqs = [rand_seq(rng, 150) for _ in range(3)]
    idx = build_index(make_data(seqs), Config(), k=13)
    path = str(tmp_path / "index.npz")
    idx.save(path)
    from nimble_tpu.index.builder import KmerIndex

    idx2 = KmerIndex.load(path)
    assert idx2.k == idx.k
    assert np.array_equal(idx2.table_vsame, idx.table_vsame)
    assert np.array_equal(idx2.table_vdiff, idx.table_vdiff)
    assert idx2.feature_names == idx.feature_names


def test_larger_scale_index():
    rng = np.random.default_rng(5)
    # ~100 "alleles" of length 3kb sharing a common backbone (HLA-like)
    backbone = rand_seq(rng, 3000)
    seqs = []
    for _ in range(100):
        s = list(backbone)
        for pos in rng.integers(0, 3000, size=30):
            s[pos] = "ACGT"[rng.integers(0, 4)]
        seqs.append("".join(s))
    idx = build_index(make_data(seqs), Config(), k=21)
    assert idx.n_kmers > 3000
    # spot-check 500 random kmers against brute force
    oracle = brute_force_kmer_map(seqs, 21)
    sample = list(oracle)[:500]
    codes = np.array(sample, dtype=np.uint64)
    cls = idx.lookup_np(
        (codes >> np.uint64(32)).astype(np.uint32),
        (codes & np.uint64(0xFFFFFFFF)).astype(np.uint32),
    )
    for code, cid in zip(sample, cls):
        assert set(idx.class_feature_list(int(cid))) == oracle[code]


# ---- native C++ builder: differential equivalence vs the numpy builder ----

def _semantic_maps(idx, queries_hi, queries_lo):
    """Decode lookups to frozensets of feature ids (class-numbering-free)."""
    cls = idx.lookup_np(queries_hi, queries_lo)
    return [
        frozenset(idx.class_feature_list(int(c))) if c >= 0 else None for c in cls
    ]


@pytest.mark.parametrize("mismatches", [0, 1])
def test_native_builder_matches_numpy(mismatches):
    from nimble_tpu.index import native as idx_native

    if not idx_native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    base = rand_seq(rng, 400)
    # shared spans, an N-containing sequence, a duplicate name, a palindromic
    # spot, and a pure-random sequence
    seqs = [
        base[:250],
        base[150:400],
        rand_seq(rng, 100) + "N" + rand_seq(rng, 80),
        "ACGT" * 30,
        rand_seq(rng, 220),
    ]
    names = ["a", "b", "c", "a", "e"]
    cfg = Config()
    cfg.num_mismatches = mismatches
    k = 13
    data = make_data(seqs, names=names)
    nat = idx_native.build_index_native(data, cfg, k=k)
    ref = build_index(data, cfg, k=k, use_native=False)

    assert nat.k == ref.k
    assert nat.n_kmers == ref.n_kmers
    # same sizing policy; the native sequential two-choice insertion can
    # succeed at a size where numpy's round-based insertion had to double
    assert nat.n_buckets <= ref.n_buckets
    assert nat.feature_names == ref.feature_names
    assert (nat.feature_to_group == ref.feature_to_group).all()

    # identical class CONTENTS as a multiset of feature sets
    def class_sets(idx):
        return sorted(
            tuple(idx.class_feature_list(c)) for c in range(idx.n_classes)
        )

    assert class_sets(nat) == class_sets(ref)

    # every reference k-mer and a swath of random queries decode identically
    all_codes = set()
    for s in seqs:
        km, valid = seqmod.kmer_codes_u64(seqmod.encode(s), k)
        all_codes.update(int(c) for c in km[valid])
    probe = np.array(sorted(all_codes), dtype=np.uint64)
    randq = rng.integers(0, 1 << (2 * k), size=2000).astype(np.uint64)
    for q in (probe, randq):
        hi = (q >> np.uint64(32)).astype(np.uint32)
        lo = (q & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        assert _semantic_maps(nat, hi, lo) == _semantic_maps(ref, hi, lo)


def test_native_builder_empty_library():
    from nimble_tpu.index import native as idx_native

    if not idx_native.available():
        pytest.skip("native library unavailable")
    nat = idx_native.build_index_native(make_data([]), Config(), k=11)
    assert nat.n_kmers == 0 and nat.n_classes == 0


def test_build_index_for_library_cache(tmp_path, monkeypatch):
    """`align` must reuse the persisted .idx.npz sidecar (the reference
    rebuilds its index at every startup — SURVEY §2.4; we must not)."""
    from nimble_tpu.config import save_library
    from nimble_tpu.index import builder as B

    rng = np.random.default_rng(7)
    data = make_data([rand_seq(rng, 300), rand_seq(rng, 300)])
    lib = str(tmp_path / "lib.json")
    save_library(lib, Config(), data)

    monkeypatch.delenv("NIMBLE_TPU_NO_INDEX_CACHE", raising=False)
    idx1 = B.build_index_for_library(lib, data, Config(), k=15)
    sidecar = B.index_cache_path(lib)
    assert sidecar.endswith(".idx.npz") and __import__("os").path.exists(sidecar)

    # second call must LOAD, not rebuild: poison build_index to prove it
    monkeypatch.setattr(B, "build_index", lambda *a, **k: (_ for _ in ()).throw(AssertionError("rebuilt")))
    idx2 = B.build_index_for_library(lib, data, Config(), k=15)
    assert idx2.n_kmers == idx1.n_kmers and idx2.n_buckets == idx1.n_buckets
    np.testing.assert_array_equal(idx2.table_hi, idx1.table_hi)
    assert list(idx2.feature_names) == list(idx1.feature_names)
    monkeypatch.undo()

    # a different k must miss the cache (key embeds the explicit k)
    idx3 = B.build_index_for_library(lib, data, Config(), k=17)
    assert idx3.k == 17

    # editing the library invalidates the key -> rebuild with new content
    data2 = make_data([rand_seq(rng, 300), rand_seq(rng, 300), rand_seq(rng, 300)])
    save_library(lib, Config(), data2)
    idx4 = B.build_index_for_library(lib, data2, Config(), k=15)
    assert idx4.n_features == 3

    # kill switch bypasses both load and store
    monkeypatch.setenv("NIMBLE_TPU_NO_INDEX_CACHE", "1")
    import os as _os
    _os.remove(sidecar)
    B.build_index_for_library(lib, data2, Config(), k=15)
    assert not _os.path.exists(sidecar)


def test_group_entries_match_bruteforce_oracle():
    """Group-probe entries: one per distinct canonical (k+g-1)-mer, each
    window's class id equal to the k-mer table's own lookup."""
    from nimble_tpu.index.builder import _group_g

    rng = np.random.default_rng(3)
    base = rand_seq(rng, 400)
    seqs = [base[:250], base[150:400], rand_seq(rng, 300)]
    k = 15
    idx = build_index(make_data(seqs), Config(), k=k)
    assert idx.has_pairs and idx.pair_g == _group_g()
    g = idx.pair_g
    kg = k + g - 1

    # oracle: distinct canonical (k+1)-mers over the library
    all_pairs = set()
    for s in seqs:
        codes = seqmod.encode(s)
        gm, valid = seqmod.kmer_codes_u64(codes, kg)
        for c in gm[valid]:
            rc = int(seqmod.revcomp_kmer_u64(np.array([c], dtype=np.uint64), kg)[0])
            all_pairs.add(min(int(c), rc))
    stored = set(
        (int(h) << 32) | int(l) for h, l in zip(idx.pair_hi, idx.pair_lo)
    )
    assert stored == all_pairs

    kmask = (1 << (2 * k)) - 1
    X = (idx.pair_hi.astype(np.uint64) << np.uint64(32)) | idx.pair_lo.astype(np.uint64)
    R = seqmod.revcomp_kmer_u64(X, kg)
    for i in range(g):
        shift = np.uint64(2 * (g - 1 - i))
        for col, src in ((i, X), (g + i, R)):
            win = (src >> shift) & np.uint64(kmask)
            expect = idx.lookup_np(
                (win >> np.uint64(32)).astype(np.uint32),
                (win & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            )
            np.testing.assert_array_equal(idx.pair_vals[:, col], expect)
    # in at least one orientation every window's k-mer is a library k-mer
    fwd_ok = idx.pair_vals[:, :g] >= 0
    rev_ok = idx.pair_vals[:, g:] >= 0
    assert bool(np.all(fwd_ok | rev_ok))

    # mismatch expansion disables group entries (semantics would diverge)
    idx_mm = build_index(make_data(seqs), Config(num_mismatches=1), k=k)
    assert not idx_mm.has_pairs

    # save/load round-trips the group entries
    import tempfile, os as _os
    with tempfile.TemporaryDirectory() as d:
        p = _os.path.join(d, "x.npz")
        idx.save(p)
        idx2 = type(idx).load(p)
        assert idx2.pair_g == g
        np.testing.assert_array_equal(idx2.pair_hi, idx.pair_hi)
        np.testing.assert_array_equal(idx2.pair_vals, idx.pair_vals)


def test_fresh_build_sets_cache_path_for_sidecars(tmp_path, monkeypatch):
    """A FRESHLY-BUILT index that was persisted must carry _cache_path, so
    derived-table sidecars (the gband build — minutes of host work at
    millions of entries) persist in the SAME process instead of being
    rebuilt by the next one (`index --warm` + `align` each paid the full
    build before this)."""
    from nimble_tpu.config import save_library
    from nimble_tpu.index import builder as B

    rng = np.random.default_rng(11)
    data = make_data([rand_seq(rng, 300), rand_seq(rng, 300)])
    lib = str(tmp_path / "lib.json")
    save_library(lib, Config(), data)
    monkeypatch.delenv("NIMBLE_TPU_NO_INDEX_CACHE", raising=False)
    idx = B.build_index_for_library(lib, data, Config(), k=15)
    assert getattr(idx, "_cache_path", None) == B.index_cache_path(lib)

    # no-cache mode must NOT set it (nothing on disk to key sidecars to)
    monkeypatch.setenv("NIMBLE_TPU_NO_INDEX_CACHE", "1")
    idx2 = B.build_index_for_library(lib, data, Config(), k=15)
    assert getattr(idx2, "_cache_path", None) is None

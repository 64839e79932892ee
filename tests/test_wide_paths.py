"""Wide-feature-space (W > INLINE_BITS_MAX_WORDS) engine paths: the
single-hash class-id probe (engine._build_monocls_tables/lookup_monocls),
the class-id group probe (engine._build_groupcls_tables/groupcls_probe),
and the runs-compacted while_loop intersection (engine.intersect_class_bits)
that replaced the per-window fori_loop — exactness pinned against the same
brute-force oracles as the narrow paths (tests/test_align.py), including
reads whose run count exceeds RUN_BLOCK (multiple while_loop trips)."""
import numpy as np
import pytest

from nimble_tpu import seq as seqmod
from nimble_tpu.align.engine import RUN_BLOCK, AlignEngine
from nimble_tpu.align.pipeline import decode_bitsets
from nimble_tpu.config import Config
from nimble_tpu.index.builder import build_index

from tests.test_align import (
    make_data,
    oracle_best,
    oracle_group_mate,
    oracle_kmer_map,
    oracle_pair_set,
    rand_seq,
    sample_reads,
)

K = 21


@pytest.fixture(scope="module")
def wide_lib():
    """>512 features (W > 32 words) with distinct-class structure: features
    0..11 are the backbone X with one private SNP each at position 10+20*i,
    so a backbone read crosses a DIFFERENT equivalence class (everyone
    except f_i) every ~20 bases — far more than RUN_BLOCK distinct runs.
    Features 12.. add SNPs only beyond position 300 (inside every read
    window's class), pushing the space wide."""
    rng = np.random.default_rng(19)
    backbone = rand_seq(rng, 600)
    seqs = []
    for i in range(12):
        s = list(backbone)
        pos = 10 + 20 * i
        s[pos] = "ACGT"[("ACGT".index(s[pos]) + 1) % 4]
        seqs.append("".join(s))
    for i in range(1100):
        s = list(backbone)
        for pos in rng.integers(320, 600, size=4):
            s[pos] = "ACGT"[rng.integers(0, 4)]
        seqs.append("".join(s))
    return [backbone] + seqs


def build_engine(seqs, cfg, group, max_len):
    data = make_data(seqs)
    index = build_index(data, cfg, k=K)
    assert index.bitset_words > 32
    engine = AlignEngine(index, cfg, max_len=max_len, group_probe=group)
    if group:
        assert "groupcls_bucket" in engine.tables, "groupcls path not active"
        assert engine.params.group_g >= 2
    else:
        assert "mcls_bucket" in engine.tables, "monocls path not active"
        assert "groupcls_bucket" not in engine.tables
    assert "stash_vs_bits" not in engine.tables  # inline disabled
    return index, engine


def run(engine, reads):
    codes, lens = seqmod.encode_batch(reads, engine.max_len)
    return engine.align_batch(codes, lens)


def many_run_reads(seqs):
    """Backbone reads spanning all 12 private-SNP positions: > RUN_BLOCK
    distinct class runs with a NONEMPTY intersection (backbone + fillers)."""
    return [seqs[0][:250], seqs[0][5:255], seqmod.revcomp(seqs[0][:250])]


def test_monocls_matches_mono_oracle(wide_lib):
    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    index, engine = build_engine(wide_lib, cfg, group=False, max_len=250)
    rng = np.random.default_rng(5)
    reads = many_run_reads(wide_lib)
    reads += sample_reads(rng, wide_lib, 24, read_len=100, error_rate=0.02)
    reads += [r[:50] + "N" + r[51:] for r in
              sample_reads(rng, wide_lib, 6, read_len=100)]
    out = run(engine, reads)
    kmap = oracle_kmer_map(wide_lib, K)
    member = decode_bitsets(out["bits"], index.n_features)
    n_nonempty = 0
    for i, read in enumerate(reads):
        score, feats, sf, sr = oracle_best(read, kmap, K, index.n_features)
        assert out["r1_fwd"][i] == sf, (i, read)
        assert out["r1_rev"][i] == sr, (i, read)
        if feats:
            n_nonempty += 1
            assert out["score"][i] == score
            assert set(np.nonzero(member[i])[0]) == feats, i
        else:
            assert out["score"][i] == 0
            assert not member[i].any()
    assert n_nonempty >= 3  # the many-runs reads resolve non-trivially


def test_many_runs_exceed_run_block(wide_lib):
    """The adversarial reads genuinely trip multiple while_loop blocks."""
    kmap = oracle_kmer_map(wide_lib, K)
    for read in many_run_reads(wide_lib)[:1]:
        codes = seqmod.encode(read)
        km, valid = seqmod.kmer_codes_u64(codes, K)
        classes = [
            frozenset(kmap[int(km[p])])
            for p in range(len(km))
            if valid[p] and int(km[p]) in kmap
        ]
        runs = 1 + sum(
            1 for a, b in zip(classes, classes[1:]) if a != b
        )
        assert runs > RUN_BLOCK, runs


def test_groupcls_clean_reads_identical_to_monocls(wide_lib):
    from nimble_tpu.index.builder import _group_g

    kg = K + _group_g() - 1
    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    rng = np.random.default_rng(23)
    reads = many_run_reads(wide_lib)
    for rl in (100, 101, kg, kg + 1):
        reads += sample_reads(rng, wide_lib, 6, read_len=rl)
    reads += [s[:80] for s in wide_lib[:8]]
    reads += [seqmod.revcomp(s[-80:]) for s in wide_lib[:8]]
    _, eng_m = build_engine(wide_lib, cfg, group=False, max_len=250)
    _, eng_g = build_engine(wide_lib, cfg, group=True, max_len=250)
    mono = run(eng_m, reads)
    grp = run(eng_g, reads)
    for key in ("bits", "score", "r1_fwd", "r1_rev", "pass_"):
        np.testing.assert_array_equal(grp[key], mono[key], err_msg=key)


def test_groupcls_noisy_matches_group_oracle(wide_lib):
    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    index, engine = build_engine(wide_lib, cfg, group=True, max_len=100)
    rng = np.random.default_rng(29)
    reads = sample_reads(rng, wide_lib, 24, read_len=100, error_rate=0.03)
    reads += [r[:40] + "N" + r[41:] for r in
              sample_reads(rng, wide_lib, 6, read_len=100)]
    out = run(engine, reads)
    kmap = oracle_kmer_map(wide_lib, K)
    pairset = oracle_pair_set(wide_lib, K, index.pair_g)
    member = decode_bitsets(out["bits"], index.n_features)
    for i, read in enumerate(reads):
        sf, ff = oracle_group_mate(read, kmap, pairset, K, index.pair_g, "fwd")
        sr, fr = oracle_group_mate(read, kmap, pairset, K, index.pair_g, "rev")
        score, feats = (sf, ff) if sf >= sr else (sr, fr)
        assert out["r1_fwd"][i] == sf, (i, read)
        assert out["r1_rev"][i] == sr, (i, read)
        if not feats:
            assert out["score"][i] == 0
            assert not member[i].any()
        else:
            assert out["score"][i] == score
            assert set(np.nonzero(member[i])[0]) == feats


@pytest.fixture(scope="module")
def family_lib():
    """8 families x 300 alleles on DISTINCT backbones: every equivalence
    class's features are contiguous within one 300-feature family span, so
    the banded class representation engages (span ~10 words, Pw=16,
    3*Pw <= W=75)."""
    rng = np.random.default_rng(47)
    seqs = []
    for fam in range(8):
        bb = rand_seq(rng, 400)
        for a in range(300):
            s = list(bb)
            for pos in rng.integers(0, 400, size=5):
                s[pos] = "ACGT"[rng.integers(0, 4)]
            seqs.append("".join(s))
    return seqs


def build_banded(seqs, cfg, group, max_len):
    from nimble_tpu.align.engine import _build_class_bands

    data = make_data(seqs)
    index = build_index(data, cfg, k=K)
    assert index.bitset_words > 32
    bands = _build_class_bands(index)
    assert bands is not None, "banding infeasible for this fixture"
    engine = AlignEngine(index, cfg, max_len=max_len, group_probe=group)
    if group:
        assert "gband_bucket" in engine.tables, "banded group path inactive"
        assert engine.params.group_g >= 2
    else:
        assert "mcls_bucket" in engine.tables
        assert "class_bandrow" in engine.tables, "banded runs path inactive"
    return index, engine


def test_banded_mono_matches_oracle(family_lib):
    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    index, engine = build_banded(family_lib, cfg, group=False, max_len=100)
    rng = np.random.default_rng(53)
    reads = sample_reads(rng, family_lib, 24, read_len=100, error_rate=0.02)
    reads += [r[:30] + "N" + r[31:] for r in
              sample_reads(rng, family_lib, 6, read_len=100)]
    out = run(engine, reads)
    kmap = oracle_kmer_map(family_lib, K)
    member = decode_bitsets(out["bits"], index.n_features)
    for i, read in enumerate(reads):
        score, feats, sf, sr = oracle_best(read, kmap, K, index.n_features)
        assert out["r1_fwd"][i] == sf, (i, read)
        assert out["r1_rev"][i] == sr, (i, read)
        if feats:
            assert out["score"][i] == score
            assert set(np.nonzero(member[i])[0]) == feats, i
        else:
            assert out["score"][i] == 0
            assert not member[i].any()


def test_banded_group_clean_identical_to_mono(family_lib):
    from nimble_tpu.index.builder import _group_g

    kg = K + _group_g() - 1
    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    rng = np.random.default_rng(59)
    reads = []
    for rl in (100, 101, kg, kg + 1):
        reads += sample_reads(rng, family_lib, 8, read_len=rl)
    reads += [s[:80] for s in family_lib[::301]]
    reads += [seqmod.revcomp(s[-80:]) for s in family_lib[::301]]
    _, eng_m = build_banded(family_lib, cfg, group=False, max_len=101)
    _, eng_g = build_banded(family_lib, cfg, group=True, max_len=101)
    mono = run(eng_m, reads)
    grp = run(eng_g, reads)
    for key in ("bits", "score", "r1_fwd", "r1_rev", "pass_"):
        np.testing.assert_array_equal(grp[key], mono[key], err_msg=key)


def test_banded_group_noisy_matches_group_oracle(family_lib):
    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    index, engine = build_banded(family_lib, cfg, group=True, max_len=100)
    rng = np.random.default_rng(61)
    reads = sample_reads(rng, family_lib, 24, read_len=100, error_rate=0.03)
    out = run(engine, reads)
    kmap = oracle_kmer_map(family_lib, K)
    pairset = oracle_pair_set(family_lib, K, index.pair_g)
    member = decode_bitsets(out["bits"], index.n_features)
    for i, read in enumerate(reads):
        sf, ff = oracle_group_mate(read, kmap, pairset, K, index.pair_g, "fwd")
        sr, fr = oracle_group_mate(read, kmap, pairset, K, index.pair_g, "rev")
        score, feats = (sf, ff) if sf >= sr else (sr, fr)
        assert out["r1_fwd"][i] == sf, (i, read)
        assert out["r1_rev"][i] == sr, (i, read)
        if not feats:
            assert out["score"][i] == 0
            assert not member[i].any()
        else:
            assert out["score"][i] == score
            assert set(np.nonzero(member[i])[0]) == feats


def test_band_combine_page_algebra():
    """Unit-pin the page-banded combine: same page, +-1 page, disjoint."""
    import jax.numpy as jnp

    from nimble_tpu.align.engine import _band_combine

    Pw = 8
    b1 = np.zeros((1, 1, 16), np.int32)
    b2 = np.zeros((1, 1, 16), np.int32)
    b1[0, 0, :] = 0b1111
    b2[0, 0, :] = 0b0110
    t = jnp.asarray(True).reshape(1, 1)

    def go(p1, p2):
        pg, bd, has = _band_combine(
            jnp.full((1, 1), p1), jnp.asarray(b1), t,
            jnp.full((1, 1), p2), jnp.asarray(b2), t, Pw,
        )
        return int(pg[0, 0]), np.asarray(bd)[0, 0], bool(has[0, 0])

    pg, bd, has = go(3, 3)  # same page: plain AND
    assert pg == 3 and has and (bd == 0b0110).all()
    pg, bd, has = go(2, 3)  # b1 one page lower: its upper page overlaps
    assert pg == 3
    assert (bd[:Pw] == 0b0110).all() and (bd[Pw:] == 0).all()
    pg, bd, has = go(3, 2)  # symmetric case
    assert pg == 3
    assert (bd[:Pw] == 0b0110).all() and (bd[Pw:] == 0).all()
    pg, bd, has = go(0, 5)  # disjoint: empty intersection, has stays set
    assert has and (bd == 0).all()


def test_align_mesh_feature_split_wide_library(tmp_path):
    """Wide library through the align CLI on the virtual mesh with the
    class-bitset matrix split over the feature axis (data=4,feature=2):
    output equals the single-device run byte-for-byte (clean reads, so the
    mesh path's mono probe agrees with the default group path)."""
    from nimble_tpu.__main__ import main as cli
    from nimble_tpu.io.fasta import write_fasta
    from nimble_tpu.io.fastq import write_fastq

    rng = np.random.default_rng(67)
    seqs = []
    for fam in range(8):
        bb = rand_seq(rng, 300)
        for a in range(150):
            s = list(bb)
            for pos in rng.integers(0, 300, size=4):
                s[pos] = "ACGT"[rng.integers(0, 4)]
            seqs.append("".join(s))
    fasta = str(tmp_path / "wide.fasta")
    write_fasta(fasta, [(f"f{i:04d}", s) for i, s in enumerate(seqs)])
    library = str(tmp_path / "wide.json")
    assert cli(["generate", "--file", fasta, "--output_path", library]) == 0

    reads = []
    for r in range(96):
        s = seqs[(r * 13) % len(seqs)]
        pos = int(rng.integers(0, len(s) - 80))
        rd = s[pos : pos + 80]
        if r % 2:
            rd = seqmod.revcomp(rd)
        reads.append((f"r{r}", rd, "I" * 80))
    fastq = str(tmp_path / "reads.fastq")
    write_fastq(fastq, reads)

    base = str(tmp_path / "base.tsv")
    meshed = str(tmp_path / "mesh.tsv")
    assert cli([
        "align", "--reference", library, "--output", base,
        "--input", fastq, "--chunk-size", "32",
    ]) == 0
    assert cli([
        "align", "--reference", library, "--output", meshed,
        "--input", fastq, "--chunk-size", "32",
        "--mesh", "data=4,feature=2",
    ]) == 0
    with open(base, "rb") as f:
        b = f.read()
    with open(meshed, "rb") as f:
        m = f.read()
    assert b == m
    # reads covering an allele-private SNP resolve under the
    # max_hits_to_report=10 cap; backbone-only reads' ~150-allele ambiguity
    # classes are legitimately dropped by that cap
    assert b.count(b"\n") > 40


def test_wide_paired_end(wide_lib):
    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    data = make_data(wide_lib)
    index = build_index(data, cfg, k=K)
    engine = AlignEngine(index, cfg, max_len=100, paired=True)
    rng = np.random.default_rng(31)
    r1 = sample_reads(rng, wide_lib, 16, read_len=100)
    r2 = sample_reads(rng, wide_lib, 16, read_len=100)
    c1, l1 = seqmod.encode_batch(r1, 100)
    c2, l2 = seqmod.encode_batch(r2, 100)
    out = engine.align_batch(c1, l1, c2, l2)
    kmap = oracle_kmer_map(wide_lib, K)
    # paired oracle through the group contract is covered narrow-side;
    # here pin the pair-combination shape invariants on the wide path
    assert out["bits"].shape == (16, index.bitset_words)
    assert (out["score"] >= 0).all()
    member = decode_bitsets(out["bits"], index.n_features)
    for i in range(16):
        if out["pass_"][i]:
            assert member[i].any()


def test_banded_wire_matches_codes_path(family_lib):
    """The banded compact wire (compress_band_rows on device -> dictionary
    codec -> host expand) must reproduce the codes-path outputs exactly
    through the packed scan dispatch."""
    from nimble_tpu.io.packing import pack_batch

    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    data = make_data(family_lib)
    index = build_index(data, cfg, k=K)
    rng = np.random.default_rng(77)
    reads = sample_reads(rng, family_lib, 96, read_len=100, error_rate=0.02)
    codes, lens = seqmod.encode_batch(reads, 100)

    eng_ref = AlignEngine(index, cfg, max_len=100, chunk_size=64,
                          scan_chunks=2, compact_out=False)
    ref = eng_ref.collect_async(eng_ref.align_batch_async(codes, lens))

    # emit_cap=0: raw-output differential needs the device emission cap
    # off (it deliberately clears pass_/bits for over-max_hits classes;
    # emission-level equivalence is covered by test_emit_cap_* below)
    eng = AlignEngine(index, cfg, max_len=100, chunk_size=64,
                      scan_chunks=2, compact_out=True, emit_cap=0)
    assert eng._banded_wire is not None, "banded wire inactive"
    pb = pack_batch({"r1_codes": codes, "r1_lens": lens}, 100)
    got = eng.collect_async(eng.align_packed_async(pb))
    for k in ("bits", "score", "r1_fwd", "r2_fwd", "pass_"):
        assert np.array_equal(ref[k], got[k]), k


def test_emit_cap_drops_only_over_cap_classes(family_lib):
    """Device emission cap (the wide-path wire saver): with the cap active
    (auto from Config.max_hits_to_report), rows whose ambiguity class
    exceeds the cap come back pass_=0/bits=0, rows at or under it are
    bit-identical to the uncapped run — so host emission output is
    unchanged while the compact dictionary only holds small classes."""
    from nimble_tpu.align.pipeline import resolve_features_compact, EmitConfig
    from nimble_tpu.io.packing import pack_batch

    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    data = make_data(family_lib)
    index = build_index(data, cfg, k=K)
    rng = np.random.default_rng(78)
    reads = sample_reads(rng, family_lib, 96, read_len=100, error_rate=0.02)
    codes, lens = seqmod.encode_batch(reads, 100)
    pb = pack_batch({"r1_codes": codes, "r1_lens": lens}, 100)

    eng_off = AlignEngine(index, cfg, max_len=100, chunk_size=64,
                          scan_chunks=2, compact_out=True, emit_cap=0)
    ref = eng_off.collect_async(eng_off.align_packed_async(pb))

    eng = AlignEngine(index, cfg, max_len=100, chunk_size=64,
                      scan_chunks=2, compact_out=True)
    assert eng.emit_cap == cfg.max_hits_to_report
    assert eng._idlist_wire is not None  # cap active + banded -> idlist
    got = eng.collect_async(eng.align_packed_async(pb))

    from nimble_tpu.align.engine import ids_to_bits_np

    got_bits = ids_to_bits_np(got["ids"], index.bitset_words)
    sizes = (np.asarray(ref["bits"]).view(np.uint32)[:, :, None]
             >> np.arange(32, dtype=np.uint32)[None, None, :] & 1).sum((1, 2))
    over = (sizes > eng.emit_cap) & (ref["pass_"] == 1)
    assert over.any(), "workload must exercise the cap"
    under = ~over
    assert np.array_equal(got["pass_"][under], ref["pass_"][under])
    assert np.array_equal(got_bits[under], ref["bits"][under])
    assert not got["pass_"][over].any()
    assert not got_bits[over].any()
    got["bits"] = got_bits
    got.pop("ids")

    # emission-level equality: the final kept rows match exactly
    emit = EmitConfig(group_on=False, discard_multiple_matches=False,
                      discard_multi_hits=0,
                      max_hits_to_report=cfg.max_hits_to_report)
    for out in (ref, got):
        out["keep_rows"] = None
    def kept(out):
        u_features, u_keep, inverse = resolve_features_compact(
            index, out["bits"], emit
        )
        keep = u_keep[inverse] & (out["pass_"] == 1)
        feats = u_features
        if isinstance(feats, tuple):  # native pool form
            pool, offs = feats
            feats = [
                pool[offs[i]:offs[i + 1]].decode()
                for i in range(len(offs) - 1)
            ]
        return [(int(i), feats[inverse[i]], int(out["score"][i]))
                for i in np.nonzero(keep)[0]]
    assert kept(got) == kept(ref)


def test_emit_cap_defaults():
    """Cap derivation: group_on disables it; discard_multi* tighten it."""
    rng = np.random.default_rng(5)
    data = make_data([rand_seq(rng, 200) for _ in range(3)])
    idx = build_index(data, Config(), k=K)
    e = AlignEngine(idx, Config(), max_len=64, chunk_size=32, scan_chunks=2,
                    compact_out=True)
    assert e.emit_cap == 10
    e = AlignEngine(idx, Config(discard_multiple_matches=True), max_len=64,
                    chunk_size=32, scan_chunks=2, compact_out=True)
    assert e.emit_cap == 1
    e = AlignEngine(idx, Config(discard_multi_hits=3), max_len=64,
                    chunk_size=32, scan_chunks=2, compact_out=True)
    assert e.emit_cap == 3
    e = AlignEngine(idx, Config(group_on="lineage"), max_len=64,
                    chunk_size=32, scan_chunks=2, compact_out=True)
    assert e.emit_cap == 0


def test_compress_expand_band_rows_roundtrip():
    from nimble_tpu.align.engine import (
        compress_band_rows,
        expand_band_rows_np,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    W, Pw = 70, 8
    n_pages = -(-W // Pw)
    bits = np.zeros((40, W), dtype=np.int32)
    for i in range(40):
        pg = int(rng.integers(0, n_pages))
        span = rng.integers(0, 1 << 31, size=2 * Pw, dtype=np.int64).astype(
            np.int32
        )
        end = min((pg + 2) * Pw, W)
        bits[i, pg * Pw : end] = span[: end - pg * Pw]
    bits[:5] = 0  # all-zero rows survive
    rows = np.asarray(compress_band_rows(jnp.asarray(bits), Pw))
    back = expand_band_rows_np(rows, Pw, W)
    assert np.array_equal(bits, back)


def test_resolve_features_band_matches_dense(family_lib):
    """The no-expand emission path (collect_async(expand_band=False) +
    resolve_features_band) produces exactly the dense path's per-read
    (keep, feature-string) outcome — including the full-format overflow
    fallback span, which collect compresses back to band rows."""
    from nimble_tpu.align.pipeline import (
        EmitConfig, resolve_features_band, resolve_features_compact,
    )
    from nimble_tpu.io.packing import pack_batch

    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    data = make_data(family_lib)
    index = build_index(data, cfg, k=K)
    rng = np.random.default_rng(79)
    reads = sample_reads(rng, family_lib, 96, read_len=100, error_rate=0.02)
    codes, lens = seqmod.encode_batch(reads, 100)
    pb = pack_batch({"r1_codes": codes, "r1_lens": lens}, 100)

    for slots, spill in ((16384, 8192), (2, 4)):  # second forces overflow
        eng = AlignEngine(index, cfg, max_len=100, chunk_size=64,
                          scan_chunks=2, compact_out=True, emit_cap=0,
                          compact_slots=slots, compact_spill=spill)
        assert eng._banded_wire is not None
        dense = eng.collect_async(eng.align_packed_async(pb))
        band = eng.collect_async(eng.align_packed_async(pb), expand_band=False)
        assert band.get("band_rows") is not None
        Pw, W = band["band_meta"]

        emit = EmitConfig(group_on=False, discard_multiple_matches=False,
                          discard_multi_hits=0, max_hits_to_report=1 << 30)
        fd, kd, invd = resolve_features_compact(index, dense["bits"], emit)
        fb, kb, invb = resolve_features_band(index, band["band_rows"], Pw, emit)

        def per_read(feats, keep, inv):
            if isinstance(feats, tuple):
                pool, offs = feats
                feats = [pool[offs[i]:offs[i + 1]].decode()
                         for i in range(len(offs) - 1)]
            return [(bool(keep[inv[i]]), feats[inv[i]])
                    for i in range(len(inv))]

        assert per_read(fd, kd, invd) == per_read(fb, kb, invb)


def test_robust_banding_with_cross_family_outlier_class():
    """A handful of classes spanning multiple families (chance k-mer
    collisions between backbones — 3 of 578,899 classes in the 50k probe)
    must NOT knock the whole library off the banded group path: robust
    banding picks Pw from the fitting majority and handles entries
    touching outlier classes with an exact full-width pre-AND
    (engine._build_class_bands_robust / _build_groupband_tables)."""
    from nimble_tpu.align.engine import (
        _build_class_bands, _build_class_bands_robust,
    )

    rng = np.random.default_rng(53)
    # 24bp shared block (k <= 24 < k+g-1): creates cross-family outlier
    # CLASSES, but every (k+g-1)-mer entry touching them still includes a
    # family-specific window, so the exact full-width pre-AND narrows
    shared = rand_seq(rng, 24)
    seqs = []
    for fam in range(8):
        bb = rand_seq(rng, 400)
        for a in range(300):
            s = list(bb)
            for pos in rng.integers(0, 400, size=5):
                s[pos] = "ACGT"[rng.integers(0, 4)]
            if (fam, a) in ((0, 7), (7, 5)):
                s[180:204] = list(shared)
            seqs.append("".join(s))

    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    data = make_data(seqs)
    index = build_index(data, cfg, k=K)
    assert index.bitset_words > 32
    # the outlier makes strict banding infeasible, robust banding works
    assert _build_class_bands(index) is None
    robust = _build_class_bands_robust(index)
    assert robust is not None
    Pw, bandrow, ok = robust
    assert not ok.all() and ok.sum() >= ok.size - 64

    eng_g = AlignEngine(index, cfg, max_len=120, group_probe=True)
    assert "gband_bucket" in eng_g.tables, "robust banding did not engage"
    eng_m = AlignEngine(index, cfg, max_len=120, group_probe=False)

    reads = sample_reads(rng, seqs, 48, read_len=100)
    # reads straight through the shared block: their windows hit the
    # outlier class
    reads += [seqs[7][150:250], seqmod.revcomp(seqs[2100 + 5][150:250])]
    codes, lens = seqmod.encode_batch(reads, 120)
    out_g = eng_g.align_batch(codes, lens)
    out_m = eng_m.align_batch(codes, lens)
    for key in ("bits", "score", "r1_fwd", "r1_rev", "pass_"):
        np.testing.assert_array_equal(out_g[key], out_m[key], err_msg=key)


def test_all_outlier_entries_fall_back_to_groupcls():
    """A shared block >= k+g-1 bp produces group entries whose EVERY
    window is the cross-family class — unbandable by construction. The
    engine must fall back to the class-id group path and stay correct."""
    from nimble_tpu.index.builder import _group_g

    rng = np.random.default_rng(59)
    shared = rand_seq(rng, 21 + _group_g() - 1 + 10)
    seqs = []
    for fam in range(8):
        bb = rand_seq(rng, 400)
        for a in range(300):
            s = list(bb)
            for pos in rng.integers(0, 400, size=5):
                s[pos] = "ACGT"[rng.integers(0, 4)]
            if (fam, a) in ((0, 7), (7, 5)):
                s[180 : 180 + len(shared)] = list(shared)
            seqs.append("".join(s))
    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    index = build_index(make_data(seqs), cfg, k=K)
    eng_g = AlignEngine(index, cfg, max_len=120, group_probe=True)
    assert "gband_bucket" not in eng_g.tables
    assert "groupcls_bucket" in eng_g.tables  # graceful fallback
    eng_m = AlignEngine(index, cfg, max_len=120, group_probe=False)
    reads = sample_reads(rng, seqs, 24, read_len=100)
    reads += [seqs[7][150:250]]
    codes, lens = seqmod.encode_batch(reads, 120)
    out_g = eng_g.align_batch(codes, lens)
    out_m = eng_m.align_batch(codes, lens)
    for key in ("bits", "score", "r1_fwd", "r1_rev", "pass_"):
        np.testing.assert_array_equal(out_g[key], out_m[key], err_msg=key)


def test_idlist_wire_roundtrip_both_headers():
    """pack_outputs_idlist <-> unpack_outputs_idlist exactness for every
    header/id layout: 2-word vs single-word (hdr1) headers x int32 vs
    packed-int16 ids. hdr1 packs score(10b)|r1_fwd(9b)|r2_fwd(9b)|pass(1b)
    into one word (valid whenever 2*max_len <= 1023)."""
    import jax.numpy as jnp

    from nimble_tpu.align.engine import (
        pack_outputs_idlist,
        unpack_outputs_idlist,
    )

    rng = np.random.default_rng(11)
    C, W_words, Pw, cap = 64, 40, 8, 10
    bits = np.zeros((C, W_words), dtype=np.int32)
    n_feat = W_words * 32
    expect_ids = np.full((C, cap), -1, dtype=np.int32)
    for r in range(C):
        k = int(rng.integers(0, cap + 1))
        # keep the class inside one aligned 2-page window (band invariant)
        page = int(rng.integers(0, W_words // Pw - 1))
        lo = page * Pw * 32
        span = 2 * Pw * 32
        ids = np.sort(
            rng.choice(min(span, n_feat - lo), size=k, replace=False) + lo
        )[::-1]
        for f in ids:
            bits[r, f // 32] |= np.int32(1 << (f % 32))
        expect_ids[r, :k] = ids
    score = rng.integers(0, 1023, size=C).astype(np.int32)
    f1 = rng.integers(0, 512, size=C).astype(np.int32)
    f2 = rng.integers(0, 512, size=C).astype(np.int32)
    pass_ = (rng.random(C) < 0.8).astype(np.int32)
    out = {
        "bits": jnp.asarray(bits),
        "score": jnp.asarray(score),
        "r1_fwd": jnp.asarray(f1),
        "r2_fwd": jnp.asarray(f2),
        "pass_": jnp.asarray(pass_),
    }
    for hdr1 in (False, True):
        for packed16 in (False, True):
            flat = np.asarray(
                pack_outputs_idlist(
                    out, cap, Pw, packed16=packed16, hdr1=hdr1
                )
            )
            got = unpack_outputs_idlist(
                flat, C, cap, C, packed16=packed16, hdr1=hdr1
            )
            assert np.array_equal(got["score"], score)
            assert np.array_equal(got["r1_fwd"], f1)
            assert np.array_equal(got["r2_fwd"], f2)
            assert np.array_equal(got["pass_"], pass_)
            want = np.where(pass_[:, None] == 1, expect_ids, -1)
            assert np.array_equal(got["ids"], want), (hdr1, packed16)


def test_idlist_hdr1_selection_by_max_len():
    """The engine turns hdr1 on exactly when 2*max_len fits the 10-bit
    score field (scores can reach 2*max_len on paired sums)."""
    rng = np.random.default_rng(6)
    seqs = [rand_seq(rng, 700) for _ in range(40)]
    base = seqs[0]
    wide = []
    for i in range(1100):
        s = list(base)
        for pos in rng.integers(320, 700, size=4):
            s[pos] = "ACGT"[rng.integers(0, 4)]
        wide.append("".join(s))
    data = make_data(seqs + wide)
    cfg = Config()
    index = build_index(data, cfg, k=K)
    e = AlignEngine(index, cfg, max_len=100, chunk_size=32, scan_chunks=2,
                    compact_out=True)
    if e._idlist_wire is not None:
        assert e._idlist_wire[3] is True
    e = AlignEngine(index, cfg, max_len=600, chunk_size=32, scan_chunks=2,
                    compact_out=True)
    if e._idlist_wire is not None:
        assert e._idlist_wire[3] is False


def test_gband_preand_blocked_matches_unblocked(monkeypatch):
    """The blocked pre-AND (engine.GBAND_PREAND_BLOCK_BYTES working-set
    budget) must produce tables identical to a single-block run — the
    multi-block path only engages at >~500k pair entries in production,
    so force tiny blocks here and diff every gband table."""
    from nimble_tpu.align import engine as eng_mod

    rng = np.random.default_rng(27)
    seqs = []
    for fam in range(6):
        bb = rand_seq(rng, 400)
        for a in range(200):
            s = list(bb)
            for pos in rng.integers(0, 400, size=5):
                s[pos] = "ACGT"[rng.integers(0, 4)]
            seqs.append("".join(s))
    cfg = Config(score_threshold=0, score_filter=0, score_percent=0.0)
    data = make_data(seqs)
    index = build_index(data, cfg, k=K)
    assert index.bitset_words > 32
    big = eng_mod._build_groupband_tables(index)
    assert big is not None, "gband path must engage for this fixture"
    ref = {k: np.asarray(v) for k, v in big.items()}

    # fresh index object (the gband cache is per index object), tiny blocks
    index2 = build_index(data, cfg, k=K)
    monkeypatch.setattr(eng_mod, "GBAND_PREAND_BLOCK_BYTES", 4096)
    small = eng_mod._build_groupband_tables(index2)
    assert small is not None
    assert set(small.keys()) == set(ref.keys())
    for k2, v in small.items():
        np.testing.assert_array_equal(np.asarray(v), ref[k2], err_msg=k2)

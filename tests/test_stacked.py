"""Stacked multi-library engine: per-library outputs must be identical to
each library's standalone engine (same reads, same configs)."""
import numpy as np
import pytest

from nimble_tpu import seq as seqmod
from nimble_tpu.align.engine import AlignEngine
from nimble_tpu.align.stacked import StackedEngine, build_stacked_tables
from nimble_tpu.config import Config, Data
from nimble_tpu.index.builder import build_index


def make_data(seqs, names=None):
    data = Data()
    names = names or [f"f{i}" for i in range(len(seqs))]
    for i, s in enumerate(seqs):
        data.columns[0].append("lib")
        data.columns[1].append(names[i])
        data.columns[2].append(str(len(s)))
        data.columns[3].append(s)
    return data


def rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


def make_libs(rng, k):
    """Three libraries with overlapping content so cross-library k-mer
    sharing is exercised (the merge path), incl. >32-feature spaces."""
    base = rand_seq(rng, 600)
    lib_a = [base[i : i + 200] for i in range(0, 400, 40)]  # 10 features
    lib_b = [base[100:300], rand_seq(rng, 300)] + [
        rand_seq(rng, 120) for _ in range(38)
    ]  # 40 features -> 2 words
    lib_c = [base[50:250] + rand_seq(rng, 50)]  # 1 feature
    cfg_a = Config()
    cfg_b = Config()
    cfg_b.score_threshold = 30
    cfg_b.intersect_level = 1
    cfg_c = Config()
    cfg_c.require_valid_pair = True
    for c in (cfg_a, cfg_b, cfg_c):
        c.kmer_length = k
    datas = [make_data(lib_a), make_data(lib_b), make_data(lib_c)]
    configs = [cfg_a, cfg_b, cfg_c]
    return [build_index(d, c, k=k) for d, c in zip(datas, configs)], configs


def make_reads(rng, seqs, n, L):
    codes = np.full((n, L), seqmod.N_CODE, dtype=np.int8)
    lens = np.zeros(n, dtype=np.int32)
    for i in range(n):
        s = seqs[rng.integers(0, len(seqs))]
        ln = int(rng.integers(L // 2, L + 1))
        p = int(rng.integers(0, max(1, len(s) - ln)))
        enc = seqmod.encode(s[p : p + ln])
        if rng.random() < 0.5:
            enc = seqmod.revcomp_codes(enc)
        if rng.random() < 0.3:  # sprinkle errors / Ns
            j = int(rng.integers(0, ln))
            enc = enc.copy()
            enc[j] = rng.integers(0, 5)
        codes[i, :ln] = enc
        lens[i] = ln
    return codes, lens


@pytest.mark.parametrize("paired", [False, True])
def test_stacked_matches_standalone(paired):
    rng = np.random.default_rng(11)
    k = 15
    indexes, configs = make_libs(rng, k)
    # reads drawn from every library's sequence space
    src = [rand_seq(rng, 200) for _ in range(3)]
    base = rand_seq(rng, 600)
    src += [base[i : i + 200] for i in range(0, 400, 100)]
    r1, l1 = make_reads(rng, src, 64, 80)
    r2, l2 = make_reads(rng, src, 64, 80) if paired else (None, None)

    stacked = StackedEngine(
        indexes, configs, chunk_size=32, max_len=80, paired=paired
    )
    outs = stacked.collect_async(stacked.align_batch_async(r1, l1, r2, l2))
    assert len(outs) == 3

    for ix, cfg, out in zip(indexes, configs, outs):
        solo = AlignEngine(ix, cfg, chunk_size=32, max_len=80, paired=paired)
        ref = solo.collect_async(solo.align_batch_async(r1, l1, r2, l2))
        for key in ref:
            np.testing.assert_array_equal(
                out[key], ref[key], err_msg=f"lib mismatch on {key}"
            )


def test_compatible_gates():
    rng = np.random.default_rng(3)
    k = 15
    indexes, configs = make_libs(rng, k)
    assert StackedEngine.compatible(indexes, configs)
    bad = Config()
    bad.kmer_stride = 2
    assert not StackedEngine.compatible(indexes, [configs[0], configs[1], bad])


def test_stacked_tables_merge_shared_kmers():
    rng = np.random.default_rng(5)
    k = 15
    shared = rand_seq(rng, 100)
    ix1 = build_index(make_data([shared]), Config(), k=k)
    ix2 = build_index(make_data([shared, rand_seq(rng, 80)]), Config(), k=k)
    t = build_stacked_tables([ix1, ix2])
    assert t is not None
    assert t["seg_words"] == (0, 1, 2)
    # merged table has one entry per distinct canonical k-mer (not the sum)
    from nimble_tpu.align.stacked import STACK_SLOTS, _lib_entries

    union = set(_lib_entries(ix1)[0]) | set(_lib_entries(ix2)[0])
    bucket = np.asarray(t["mono_bucket"])
    n_placed = int((bucket[:, :STACK_SLOTS] != -1).sum())
    n_stash = int((np.asarray(t["mono_stash_hi"]) != -1).sum())
    assert n_placed + n_stash == len(union)


def test_stacked_group_path_engages():
    """The default stack must take the GROUP probe (one (k+g-1)-mer gather
    answers g windows for all libraries), not silently fall back to mono."""
    rng = np.random.default_rng(11)
    indexes, configs = make_libs(rng, 15)
    eng = StackedEngine(indexes, configs, chunk_size=32, max_len=80)
    assert eng.group_g == indexes[0].pair_g
    assert "sg_bucket" in eng.tables and "mono_bucket" not in eng.tables


def test_stacked_group_tables_merge():
    """Merged group table: one entry per distinct canonical (k+g-1)-mer
    across libraries; a library's mask word is nonzero only where that
    library carries the key."""
    from nimble_tpu.align.stacked import STACK_SLOTS, build_stacked_group_tables

    rng = np.random.default_rng(5)
    k = 15
    shared = rand_seq(rng, 100)
    ix1 = build_index(make_data([shared]), Config(), k=k)
    ix2 = build_index(make_data([shared, rand_seq(rng, 80)]), Config(), k=k)
    t = build_stacked_group_tables([ix1, ix2])
    assert t is not None and t["pair_g"] == ix1.pair_g
    assert t["seg_words"] == (0, 1, 2)

    def keys_of(ix):
        return set(
            (ix.pair_hi.astype(np.uint64) << np.uint64(32))
            | ix.pair_lo.astype(np.uint64)
        )

    union = keys_of(ix1) | keys_of(ix2)
    S = STACK_SLOTS
    bucket = np.asarray(t["sg_bucket"])
    n_placed = int((bucket[:, :S] != -1).sum())
    n_stash = int((np.asarray(t["sg_stash_hi"]) != -1).sum())
    assert n_placed + n_stash == len(union)

    # per-library masks: lib1-only keys carry mask 0 in lib0's word
    W_cat = 2
    only2 = keys_of(ix2) - keys_of(ix1)
    hi = np.asarray(bucket[:, :S]).ravel()
    lo = np.asarray(bucket[:, S : 2 * S]).ravel()
    m0 = bucket[:, 2 * S + 2 * W_cat * S : 2 * S + 2 * W_cat * S + S].ravel()
    m1 = bucket[:, 2 * S + 2 * W_cat * S + S :].ravel()
    placed_keys = (hi.astype(np.uint32).astype(np.uint64) << np.uint64(32)) | lo.astype(
        np.uint32
    ).astype(np.uint64)
    occ = hi != -1
    for key, mm0, mm1 in zip(placed_keys[occ], m0[occ], m1[occ]):
        if key in only2:
            assert mm0 == 0 and mm1 != 0
        elif key not in keys_of(ix2):
            assert mm1 == 0 and mm0 != 0


@pytest.mark.parametrize("probe", ["group", "mono"])
def test_pipeline_stacked_tsvs_match_separate(tmp_path, monkeypatch, probe):
    """align_files over 3 libraries: stacked mode writes byte-identical TSVs
    to the per-library engines, on both probe paths (group = default; mono =
    the NIMBLE_TPU_NO_GROUP_PROBE fallback both sides honor)."""
    if probe == "mono":
        monkeypatch.setenv("NIMBLE_TPU_NO_GROUP_PROBE", "1")
    from nimble_tpu.align.pipeline import align_files, append_path_string
    from nimble_tpu.config import save_library

    rng = np.random.default_rng(21)
    k = 15
    base = rand_seq(rng, 600)
    libs = {
        "liba": [base[i : i + 200] for i in range(0, 400, 40)],
        "libb": [base[100:300], rand_seq(rng, 300)],
        "libc": [base[50:250] + rand_seq(rng, 50)],
    }
    paths = []
    for name, seqs in libs.items():
        cfg = Config()
        cfg.kmer_length = k
        p = tmp_path / f"{name}.json"
        save_library(str(p), cfg, make_data(seqs, names=[f"{name}_{i}" for i in range(len(seqs))]))
        paths.append(str(p))

    src = [s for seqs in libs.values() for s in seqs]
    fq = tmp_path / "reads.fastq"
    with open(fq, "w") as f:
        for i in range(120):
            s = src[rng.integers(0, len(src))]
            ln = 80
            p0 = int(rng.integers(0, max(1, len(s) - ln)))
            read = s[p0 : p0 + ln]
            f.write(f"@r{i}\n{read}\n+\n{'I' * len(read)}\n")

    ref = ",".join(paths)
    out_stacked = tmp_path / "out_stacked.tsv"
    out_sep = tmp_path / "out_sep.tsv"
    rc1 = align_files(ref, str(out_stacked), [str(fq)], chunk_size=64, max_len=80)
    monkeypatch.setenv("NIMBLE_TPU_NO_STACK", "1")
    rc2 = align_files(ref, str(out_sep), [str(fq)], chunk_size=64, max_len=80)
    assert rc1 == rc2 == 0
    for name in libs:
        a = open(append_path_string(str(out_stacked), f".{name}")).read()
        b = open(append_path_string(str(out_sep), f".{name}")).read()
        assert a == b and a.count("\n") > 1


def test_pipeline_stacked_wide_library_matches_separate(tmp_path, monkeypatch):
    """A library wider than the group gate (bitset_words > GROUP_MAX_WORDS)
    stacked next to a narrow one: the stacked group gate must reject (every
    library needs standalone-group-eligible width), so both modes probe the
    same way and stay byte-identical."""
    from nimble_tpu.align import engine as E
    from nimble_tpu.align.pipeline import align_files, append_path_string
    from nimble_tpu.config import save_library

    rng = np.random.default_rng(31)
    k = 15
    wide_n = E.GROUP_MAX_WORDS * 32 + 8  # > 8 words of classes
    wide_seqs = [rand_seq(rng, 60) for _ in range(wide_n)]
    narrow_seqs = [rand_seq(rng, 200) for _ in range(3)]
    paths = []
    for name, seqs in (("wide", wide_seqs), ("narrow", narrow_seqs)):
        cfg = Config()
        cfg.kmer_length = k
        p = tmp_path / f"{name}.json"
        save_library(
            str(p),
            cfg,
            make_data(seqs, names=[f"{name}_{i}" for i in range(len(seqs))]),
        )
        paths.append(str(p))

    src = wide_seqs + narrow_seqs
    fq = tmp_path / "reads.fastq"
    with open(fq, "w") as f:
        for i in range(80):
            s = src[rng.integers(0, len(src))]
            ln = min(50, len(s))
            p0 = int(rng.integers(0, max(1, len(s) - ln)))
            read = s[p0 : p0 + ln]
            f.write(f"@r{i}\n{read}\n+\n{'I' * len(read)}\n")

    ref = ",".join(paths)
    out_stacked = tmp_path / "st.tsv"
    out_sep = tmp_path / "sp.tsv"
    rc1 = align_files(ref, str(out_stacked), [str(fq)], chunk_size=64, max_len=60)
    monkeypatch.setenv("NIMBLE_TPU_NO_STACK", "1")
    rc2 = align_files(ref, str(out_sep), [str(fq)], chunk_size=64, max_len=60)
    assert rc1 == rc2 == 0
    for name in ("wide", "narrow"):
        a = open(append_path_string(str(out_stacked), f".{name}")).read()
        b = open(append_path_string(str(out_sep), f".{name}")).read()
        assert a == b and a.count("\n") > 1


def test_stacked_scan_matches_single_chunk():
    """StackedEngine's scanned dispatch is output-identical per library to
    chunk-by-chunk dispatch (tail chunk included)."""
    from nimble_tpu import seq as seqmod

    rng = np.random.default_rng(23)
    indexes, configs = make_libs(rng, 15)
    reads = []
    src = rand_seq(rng, 400)
    for i in range(150):
        p = int(rng.integers(0, 340))
        reads.append(src[p : p + 60])
    codes, lens = seqmod.encode_batch(reads, 60)
    plain = StackedEngine(indexes, configs, chunk_size=32, max_len=60,
                          scan_chunks=1)
    scanned = StackedEngine(indexes, configs, chunk_size=32, max_len=60,
                            scan_chunks=4)
    a = plain.collect_async(plain.align_batch_async(codes, lens))
    b = scanned.collect_async(scanned.align_batch_async(codes, lens))
    assert len(a) == len(b)
    for oa, ob in zip(a, b):
        for key in oa:
            assert np.array_equal(oa[key], ob[key]), key

"""Stage dissection of the wide-W banded group probe (_score_mate_groupband)
on the real chip: jit progressively longer prefixes of the stage pipeline
over the same device-resident inputs and subtract. Drives VERDICT round-3
item 3 (20k-allele path to >= 1.25M reads/s/chip).

The 20k index (102s numpy build) is persisted to .bench_data/big20k.idx.npz
on first run and reloaded afterwards.

Usage: python scripts/ablate_gband.py [CHUNK] [STAGE,STAGE,...]
(default: all stages; run stages separately to stay inside compile-time
budgets — the .jax_cache makes reruns instant)
"""
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

CACHE = pathlib.Path(".bench_data/big20k.idx.npz")
READ_LEN = 100


def get_index():
    from nimble_tpu.index.builder import KmerIndex, build_index
    from nimble_tpu.config import Config
    import bigindex as BI  # scripts/ on path via __file__ parent

    if CACHE.exists():
        t0 = time.time()
        index = KmerIndex.load(str(CACHE))
        print(f"index loaded in {time.time()-t0:.1f}s", file=sys.stderr)
        data, backbones = None, BI.build_library()[1]
        return index, backbones
    data, backbones = BI.build_library()
    t0 = time.time()
    index = build_index(data, Config(), k=BI.K)
    print(f"index built in {time.time()-t0:.1f}s", file=sys.stderr)
    CACHE.parent.mkdir(exist_ok=True)
    index.save(str(CACHE))
    return index, backbones


def main():
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nimble_tpu.align import engine as E
    from nimble_tpu.config import Config
    import bigindex as BI

    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    index, backbones = get_index()
    eng = E.AlignEngine(index, Config(), chunk_size=chunk, max_len=READ_LEN,
                        scan_chunks=1)
    print("tables:", sorted(eng.tables.keys()), file=sys.stderr)
    t = eng.tables
    p = eng.params
    g = p.group_g
    kg = p.k + g - 1

    rng = np.random.default_rng(7)
    codes = np.empty((chunk, READ_LEN), dtype=np.int8)
    for i in range(chunk):
        bb = backbones[i % len(backbones)]
        st = rng.integers(0, len(bb) - READ_LEN + 1)
        codes[i] = bb[st:st + READ_LEN]
    err = rng.random(codes.shape) < 0.01
    codes = np.where(err, rng.integers(0, 4, size=codes.shape), codes).astype(np.int8)
    from nimble_tpu import seq as seqmod
    rc = np.random.default_rng(1).random(chunk) < 0.5
    codes[rc] = seqmod.revcomp_codes(codes[rc])
    lens = np.full(chunk, READ_LEN, dtype=np.int32)
    c_dev = jax.device_put(codes)
    l_dev = jax.device_put(lens)

    B, L = chunk, READ_LEN
    P = L - p.k + 1
    PP = L - kg + 1
    nb = (
        t["gband_ptr8"].shape[0] * 8
        if "gband_ptr8" in t
        else t["gband_bucket"].shape[0]
    )
    W = t["class_bits"].shape[1]
    Wb = t["gband_table"].shape[1] - 1
    Pw = Wb // 2
    print(f"chunk={chunk} W={W} Wb={Wb} Pw={Pw} PP={PP} "
          f"Q+1={(PP + g - 1)//g + 1}", file=sys.stderr)

    def stage_keys(t, codes, lens):
        hi, lo, valid = E.kmer_hi_lo(codes, lens, kg)
        c_hi, c_lo, fwd_c, _ = E._canonical_keys(hi, lo, kg)
        h1, h2 = E.bucket_hashes_jnp(c_hi, c_lo, nb)
        hi_i, lo_i = E._bitcast_i32(c_hi), E._bitcast_i32(c_lo)
        jstar = jnp.clip(lens - kg, 0, PP - 1)
        onehot = jnp.arange(PP, dtype=jnp.int32)[None, :] == jstar[:, None]
        cat = []
        for a in (hi_i, lo_i, h1, h2, fwd_c, valid):
            tt = jnp.where(onehot, a.astype(jnp.int32), 0).sum(
                axis=1, keepdims=True)
            cat.append(jnp.concatenate([a[:, ::g], tt.astype(a.dtype)], axis=1))
        return cat + [jstar]

    def stage_probe(t, codes, lens):
        hi_c, lo_c, h1_c, h2_c, fwd_cc, valid_c, jstar = stage_keys(t, codes, lens)
        S = t["gband_bucket"].shape[1] // 5

        def pb(h):
            hh = h.astype(jnp.int32)
            if "gband_ptr8" in t:
                pr = t["gband_ptr8"][hh >> 3]
                lane = (hh & 7)[..., None] == jnp.arange(8, dtype=jnp.int32)
                hh = jnp.sum(jnp.where(lane, pr, 0), axis=-1)
            row = t["gband_bucket"][hh]
            match = (row[..., 0:S] == hi_c[..., None]) & (
                row[..., S:2 * S] == lo_c[..., None])
            i_s = jnp.max(jnp.where(match, row[..., 2 * S:3 * S], -1), axis=-1)
            i_d = jnp.max(jnp.where(match, row[..., 3 * S:4 * S], -1), axis=-1)
            mw = jnp.where(match, row[..., 4 * S:5 * S], 0).sum(axis=2)
            return i_s, i_d, mw

        i1s, i1d, m1 = pb(h1_c)
        i2s, i2d, m2 = pb(h2_c)
        idx = jnp.maximum(i1s, i2s)
        idx_d = jnp.maximum(i1d, i2d)
        mword = m1 | m2
        n_stash = t["gband_stash_hi"].shape[0]
        for s in range(n_stash):
            m = (t["gband_stash_hi"][s] == hi_c) & (t["gband_stash_lo"][s] == lo_c)
            idx = jnp.where(m, t["gband_stash_idx_s"][s], idx)
            idx_d = jnp.where(m, t["gband_stash_idx_d"][s], idx_d)
            mword = mword | jnp.where(m, t["gband_stash_mask"][s], 0)
        mword = jnp.where(valid_c & (idx >= 0), mword, 0)
        return idx, mword, fwd_cc, jstar

    def stage_band(t, codes, lens):
        idx, mword, fwd_cc, jstar = stage_probe(t, codes, lens)
        brow = t["gband_table"][jnp.clip(idx, 0, None)]
        return brow, mword, fwd_cc, jstar

    def stage_tree(t, codes, lens):
        brow, mword, fwd_cc, jstar = stage_band(t, codes, lens)
        page_sel = brow[..., 0]
        band_sel = brow[..., 1:]
        gmask = jnp.int32((1 << g) - 1)
        mask_f = jnp.where(fwd_cc, mword, mword >> 8) & gmask
        has_sel = mask_f != 0
        pg, bd, has = E._band_tree(page_sel, band_sel, has_sel, Pw)
        return pg, bd, has

    def stage_expand(t, codes, lens):
        pg, bd, has = stage_tree(t, codes, lens)
        return E._expand_band(pg, bd, has, W, Pw)

    def stage_score(t, codes, lens):
        # the two coverage scores alone (no bands)
        idx, mword, fwd_cc, jstar = stage_probe(t, codes, lens)
        Q = mword.shape[1] - 1
        gmask = jnp.int32((1 << g) - 1)
        mask_f = jnp.where(fwd_cc, mword, mword >> 8) & gmask
        mask_r = jnp.where(fwd_cc, mword >> 24, mword >> 16) & gmask
        s_f = E.coverage_score(E.group_win_matched(mask_f, Q, g, P, jstar),
                               lens, p.k, L, 1)
        s_r = E.coverage_score(E.group_win_matched(mask_r, Q, g, P, jstar),
                               lens, p.k, L, 1)
        return s_f + s_r

    def stage_full(t, codes, lens):
        bits, score, sf, sr = E._score_mate_groupband(codes, lens, t, p)
        return bits, score

    def stage_keys_pallas(t, codes, lens):
        from nimble_tpu.align.kernels import kmer_keys_pallas

        return kmer_keys_pallas(codes, lens, kg, nb)

    def chk(x):
        if isinstance(x, (tuple, list)):
            return sum(jnp.sum(v.astype(jnp.int32) & 0xFFFF) for v in x)
        return jnp.sum(x.astype(jnp.int32) & 0xFFFF)

    variants = [
        ("keys-pallas", stage_keys_pallas),
        ("keys", stage_keys),
        ("probe", stage_probe),
        ("band-gather", stage_band),
        ("tree", stage_tree),
        ("expand", stage_expand),
        ("score-only", stage_score),
        ("full-mate", stage_full),
        ("align_step", None),
    ]
    if len(sys.argv) > 2:
        want = set(sys.argv[2].split(","))
        variants = [v for v in variants if v[0] in want]
    results = {}
    for name, f in variants:
        if f is None:
            fn = eng._fn
            def run():
                r = fn(t, c_dev, l_dev)
                return int(jnp.sum(r["score"]))
        else:
            fn = jax.jit(lambda T, c, l, _f=f: chk(_f(T, c, l)))
            def run(_fn=fn):
                return int(_fn(eng.tables, c_dev, l_dev))
        t0 = time.time()
        run()
        compile_s = time.time() - t0
        best = 1e9
        for _ in range(8):
            t0 = time.time()
            acc = 0
            for _ in range(4):
                acc += run()
            best = min(best, (time.time() - t0) / 4)
        results[name] = best
        print(f"{name:12s}: {best*1000:8.2f} ms/chunk "
              f"({chunk/best/1e6:6.3f} M reads/s)  [compile {compile_s:.0f}s]",
              flush=True)

    order = [n for n in
             ("keys", "probe", "band-gather", "tree", "expand")
             if n in results]
    if len(order) > 1:
        print("\ndeltas (consecutive prefixes):")
        for a, b in zip(order, order[1:]):
            print(f"  {b:12s}: +{(results[b]-results[a])*1000:7.2f} ms")


if __name__ == "__main__":
    main()

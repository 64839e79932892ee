"""Pallas kernel parity tests (interpret mode on CPU): the fused window
stage must reproduce the engine's jnp computation bit-for-bit."""
import numpy as np
import pytest

import jax.numpy as jnp

from nimble_tpu import seq as seqmod
from nimble_tpu.align.engine import _bitcast_i32, kmer_hi_lo, revcomp_hi_lo
from nimble_tpu.align.kernels import kmer_keys_pallas
from nimble_tpu.index.hashing import bucket_hashes_jnp


@pytest.mark.parametrize("k", [15, 21, 31])
def test_kmer_keys_kernel_matches_jnp(k):
    rng = np.random.default_rng(0)
    B, L = 16, 80
    codes = rng.integers(0, 5, size=(B, L)).astype(np.int8)  # includes Ns
    lens = rng.integers(k, L + 1, size=B).astype(np.int32)
    n_buckets = 1 << 12

    c_hi, c_lo, h1, h2, fwd_canon, palin, valid = kmer_keys_pallas(
        jnp.asarray(codes), jnp.asarray(lens), k, n_buckets, interpret=True
    )

    # jnp reference path
    hi, lo, valid_ref = kmer_hi_lo(jnp.asarray(codes), jnp.asarray(lens), k)
    rc_hi, rc_lo = revcomp_hi_lo(hi, lo, k)
    fwd_ref = (hi < rc_hi) | ((hi == rc_hi) & (lo <= rc_lo))
    pal_ref = (hi == rc_hi) & (lo == rc_lo)
    ch_ref = jnp.where(fwd_ref, hi, rc_hi)
    cl_ref = jnp.where(fwd_ref, lo, rc_lo)
    h1_ref, h2_ref = bucket_hashes_jnp(ch_ref, cl_ref, n_buckets)

    assert np.array_equal(np.asarray(valid), np.asarray(valid_ref))
    assert np.array_equal(np.asarray(c_hi), np.asarray(_bitcast_i32(ch_ref)))
    assert np.array_equal(np.asarray(c_lo), np.asarray(_bitcast_i32(cl_ref)))
    assert np.array_equal(np.asarray(h1), np.asarray(h1_ref).astype(np.int32))
    assert np.array_equal(np.asarray(h2), np.asarray(h2_ref).astype(np.int32))
    assert np.array_equal(np.asarray(fwd_canon), np.asarray(fwd_ref))
    assert np.array_equal(np.asarray(palin), np.asarray(pal_ref))


def test_mono_select_kernel_matches_jnp():
    """mono_select_pallas (interpret) must reproduce engine.mono_probe."""
    import jax
    from nimble_tpu.align import engine as E
    from nimble_tpu.align.kernels import mono_select_pallas
    from nimble_tpu.config import Config, Data
    from nimble_tpu.index.builder import build_index

    rng = np.random.default_rng(4)
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, size=300)) for _ in range(40)]
    data = Data()
    for i, s in enumerate(seqs):
        data.columns[0].append("lib"); data.columns[1].append(f"f{i}")
        data.columns[2].append(str(len(s))); data.columns[3].append(s)
    k = 15
    idx = build_index(data, Config(), k=k)
    tables = E._device_tables(idx, group_ok=False)  # pin the mono layout
    assert "mono_bucket" in tables
    W = idx.bitset_words

    B, L = 33, 60  # non-multiple of block sizes
    codes = rng.integers(0, 5, size=(B, L)).astype(np.int8)
    lens = rng.integers(k, L + 1, size=B).astype(np.int32)
    hi, lo, valid = E.kmer_hi_lo(jnp.asarray(codes), jnp.asarray(lens), k)
    c_hi, c_lo, fc, pal = E._canonical_keys(hi, lo, k)
    from nimble_tpu.index.hashing import bucket_hashes_jnp
    nb2 = tables["mono_bucket"].shape[0]
    h1, _ = bucket_hashes_jnp(c_hi, c_lo, nb2)
    hi_i = E._bitcast_i32(c_hi); lo_i = E._bitcast_i32(c_lo)

    ref_f, ref_r = E.mono_probe(hi_i, lo_i, h1, fc, pal, valid, tables, W)
    S = tables["mono_bucket"].shape[1] // (2 + 2 * W)
    rowT = jnp.transpose(tables["mono_bucket"][h1.astype(jnp.int32)], (2, 0, 1))
    stash = jnp.concatenate(
        [tables["mono_stash_hi"][:, None], tables["mono_stash_lo"][:, None],
         tables["mono_stash_vs_bits"], tables["mono_stash_vd_bits"]], axis=1)
    got_f, got_r = mono_select_pallas(
        rowT, hi_i, lo_i, fc, pal, valid, stash, S, W, interpret=True, block_b=16
    )
    assert np.array_equal(np.asarray(got_f).transpose(1, 2, 0), np.asarray(ref_f))
    assert np.array_equal(np.asarray(got_r).transpose(1, 2, 0), np.asarray(ref_r))


@pytest.mark.parametrize("W,Pw,Q1", [(625, 32, 14), (100, 16, 7), (70, 8, 5)])
def test_band_tree_expand_kernel_matches_jnp(W, Pw, Q1):
    from nimble_tpu.align.engine import _band_tree, _expand_band
    from nimble_tpu.align.kernels import band_tree_expand_pallas

    rng = np.random.default_rng(3)
    B, Wb = 24, 2 * Pw
    n_pages_payload = -(-W // Pw)
    page = rng.integers(0, n_pages_payload, size=(B, Q1)).astype(np.int32)
    band = rng.integers(0, 1 << 31, size=(B, Q1, Wb), dtype=np.int64).astype(
        np.int32
    )
    # realistic structure: many positions share the previous position's
    # band (family runs), some positions miss entirely
    for j in range(1, Q1):
        same = rng.random(B) < 0.6
        page[same, j] = page[same, j - 1]
        band[same, j] = band[same, j - 1]
    has = (rng.random((B, Q1)) < 0.8)
    # a few reads with zero contributions (must expand to all-zero bits)
    has[:3] = False

    pg, bd, hs = _band_tree(
        jnp.asarray(page), jnp.asarray(band), jnp.asarray(has), Pw
    )
    want = np.asarray(_expand_band(pg, bd, hs, W, Pw))

    packed = np.concatenate(
        [
            np.transpose(band, (1, 0, 2)),
            page.T[..., None],
            has.T[..., None].astype(np.int32),
        ],
        axis=-1,
    )
    got = np.asarray(
        band_tree_expand_pallas(jnp.asarray(packed), W, Pw, interpret=True)
    )
    assert np.array_equal(want, got)


def test_band_tree_expand_kernel_blocks():
    """Multi-block grid path (B > block_b) slices padding correctly."""
    from nimble_tpu.align.engine import _band_tree, _expand_band
    from nimble_tpu.align.kernels import band_tree_expand_pallas

    rng = np.random.default_rng(5)
    B, Q1, Pw, W = 50, 4, 8, 40
    Wb = 2 * Pw
    page = rng.integers(0, 5, size=(B, Q1)).astype(np.int32)
    band = rng.integers(0, 1 << 31, size=(B, Q1, Wb), dtype=np.int64).astype(
        np.int32
    )
    has = rng.random((B, Q1)) < 0.7
    pg, bd, hs = _band_tree(
        jnp.asarray(page), jnp.asarray(band), jnp.asarray(has), Pw
    )
    want = np.asarray(_expand_band(pg, bd, hs, W, Pw))
    packed = np.concatenate(
        [
            np.transpose(band, (1, 0, 2)),
            page.T[..., None],
            has.T[..., None].astype(np.int32),
        ],
        axis=-1,
    )
    got = np.asarray(
        band_tree_expand_pallas(
            jnp.asarray(packed), W, Pw, interpret=True, block_b=16
        )
    )
    assert np.array_equal(want, got)

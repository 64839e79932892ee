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

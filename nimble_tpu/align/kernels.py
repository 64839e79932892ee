"""Pallas TPU kernels for the alignment hot path.

What is (and is not) in Pallas here, and why:

  * `kmer_keys_kernel` — the fused window stage: rolling 2-bit k-mer packing,
    elementwise reverse-complement, canonical selection, validity masking and
    both bucket hashes, in one VMEM-resident pass over the read block. This
    is the VPU-bound half of the probe; fusing it keeps every intermediate
    (the k shifted views, rc words, hash mixes) out of HBM.

  * The table probe itself stays on XLA's row-gather path (engine.py).
    Measured on this toolchain, XLA lowers 2D row gathers at ~170M rows/s
    while Mosaic's `tpu.dynamic_gather` only supports single-vreg tables
    (<= 8 sublanes along the gather dim) or within-row lane gathers, so a
    VMEM-table Pallas probe would need a full lane-routing network for no
    measured win. See scripts/ablate2.py for the stage timings that back
    this choice.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nimble_tpu.index.hashing import _C1, _C2, _GOLDEN  # type: ignore

N_CODE = 4


def _mix32(a, b):
    x = a * jnp.uint32(_GOLDEN) + b
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(_C1)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(_C2)
    return x ^ (x >> jnp.uint32(16))


def _rev2_32(y):
    y = ((y & jnp.uint32(0x33333333)) << jnp.uint32(2)) | (
        (y >> jnp.uint32(2)) & jnp.uint32(0x33333333)
    )
    y = ((y & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4)) | (
        (y >> jnp.uint32(4)) & jnp.uint32(0x0F0F0F0F)
    )
    y = ((y & jnp.uint32(0x00FF00FF)) << jnp.uint32(8)) | (
        (y >> jnp.uint32(8)) & jnp.uint32(0x00FF00FF)
    )
    return (y << jnp.uint32(16)) | (y >> jnp.uint32(16))


def _kmer_keys_body(k: int, n_buckets: int, codes_ref, lens_ref, c_hi_ref,
                    c_lo_ref, h1_ref, h2_ref, fwd_canon_ref, palin_ref,
                    valid_ref):
    codes = codes_ref[:]
    B, L = codes.shape
    P = L - k + 1
    c = codes.astype(jnp.uint32)

    hi = jnp.zeros((B, P), dtype=jnp.uint32)
    lo = jnp.zeros((B, P), dtype=jnp.uint32)
    for j in range(k):
        bitpos = 2 * (k - 1 - j)
        window = c[:, j : j + P] & jnp.uint32(3)
        if bitpos >= 32:
            hi = hi | (window << jnp.uint32(bitpos - 32))
        else:
            lo = lo | (window << jnp.uint32(bitpos))

    bad = (codes == N_CODE).astype(jnp.int32)
    bad_cum = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=jnp.int32), jnp.cumsum(bad, axis=1)], axis=1
    )
    no_n = (bad_cum[:, k:] - bad_cum[:, :-k]) == 0
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)
    valid = no_n & (pos + k <= lens_ref[:][:, None])

    # elementwise reverse complement (see engine.revcomp_hi_lo)
    nh = _rev2_32(~lo)
    nl = _rev2_32(~hi)
    s = 64 - 2 * k
    if s >= 32:
        rc_lo = nh >> jnp.uint32(s - 32) if s > 32 else nh
        rc_hi = jnp.zeros_like(nh)
    else:
        rc_lo = (nl >> jnp.uint32(s)) | (nh << jnp.uint32(32 - s))
        rc_hi = nh >> jnp.uint32(s)
    if 2 * k > 32:
        rc_hi = rc_hi & jnp.uint32((1 << (2 * k - 32)) - 1)
    else:
        rc_hi = jnp.zeros_like(rc_hi)
        if 2 * k < 32:
            rc_lo = rc_lo & jnp.uint32((1 << (2 * k)) - 1)

    fwd_canon = (hi < rc_hi) | ((hi == rc_hi) & (lo <= rc_lo))
    palin = (hi == rc_hi) & (lo == rc_lo)
    c_hi = jnp.where(fwd_canon, hi, rc_hi)
    c_lo = jnp.where(fwd_canon, lo, rc_lo)

    mask = jnp.uint32(n_buckets - 1)
    h1 = _mix32(c_lo, c_hi) & mask
    h2 = _mix32(c_hi ^ jnp.uint32(_C2), c_lo ^ jnp.uint32(_C1)) & mask

    c_hi_ref[:] = jax.lax.bitcast_convert_type(c_hi, jnp.int32)
    c_lo_ref[:] = jax.lax.bitcast_convert_type(c_lo, jnp.int32)
    h1_ref[:] = h1.astype(jnp.int32)
    h2_ref[:] = h2.astype(jnp.int32)
    fwd_canon_ref[:] = fwd_canon
    palin_ref[:] = palin
    valid_ref[:] = valid


def kmer_keys_pallas(codes, lens, k: int, n_buckets: int, interpret: bool = False):
    """Fused Pallas window stage. codes (B, L) int8, lens (B,) int32 ->
    (c_hi, c_lo [int32 bitcast], h1, h2 [int32], fwd_canon, palindrome,
    valid [bool]) each (B, P)."""
    B, L = codes.shape
    P = L - k + 1
    out = jax.ShapeDtypeStruct((B, P), jnp.int32)
    outb = jax.ShapeDtypeStruct((B, P), jnp.bool_)
    return pl.pallas_call(
        partial(_kmer_keys_body, k, n_buckets),
        out_shape=(out, out, out, out, outb, outb, outb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(7)),
        interpret=interpret,
    )(codes, lens)

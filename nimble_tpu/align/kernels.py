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


def _shl(x, n: int):
    """Left shift by a trace-time constant, as a multiply. Mosaic's vector
    left-shift miscompiles to ZEROS for shift amounts 16..22 when the
    operand's known value range lets the compiler narrow lanes (measured on
    this libtpu: (x & 3) << 20 == 0); multiplies take the correct widening
    path at identical VPU cost and wrap identically mod 2^32."""
    if n == 0:
        return x
    return x * x.dtype.type((1 << n) & 0xFFFFFFFF)


def _mix32(a, b):
    x = a * jnp.uint32(_GOLDEN) + b
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(_C1)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(_C2)
    return x ^ (x >> jnp.uint32(16))


def _rev2_32(y):
    y = _shl(y & jnp.uint32(0x33333333), 2) | (
        (y >> jnp.uint32(2)) & jnp.uint32(0x33333333)
    )
    y = _shl(y & jnp.uint32(0x0F0F0F0F), 4) | (
        (y >> jnp.uint32(4)) & jnp.uint32(0x0F0F0F0F)
    )
    y = _shl(y & jnp.uint32(0x00FF00FF), 8) | (
        (y >> jnp.uint32(8)) & jnp.uint32(0x00FF00FF)
    )
    return _shl(y, 16) | (y >> jnp.uint32(16))


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
            hi = hi | _shl(window, bitpos - 32)
        else:
            lo = lo | _shl(window, bitpos)

    # window-has-no-N via log-step shifted ANDs (cumsum has no Mosaic
    # lowering): after the loop acc[i] = AND(good[i..i+w)) with w the
    # largest power of two <= k, and two overlapping w-windows cover [p, p+k)
    good = c != jnp.uint32(N_CODE)  # int8 vector cmp has no Mosaic lowering
    acc = good
    w = 1
    while w * 2 <= k:
        acc = acc[:, : acc.shape[1] - w] & acc[:, w:]
        w *= 2
    no_n = acc[:, :P] & acc[:, k - w : k - w + P]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)
    valid = no_n & (pos + k <= lens_ref[:])  # lens is (B, 1)

    # elementwise reverse complement (see engine.revcomp_hi_lo)
    nh = _rev2_32(~lo)
    nl = _rev2_32(~hi)
    s = 64 - 2 * k
    if s >= 32:
        rc_lo = nh >> jnp.uint32(s - 32) if s > 32 else nh
        rc_hi = jnp.zeros_like(nh)
    else:
        rc_lo = (nl >> jnp.uint32(s)) | _shl(nh, 32 - s)
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


# Mosaic's stack allocation for a kmer_keys block measures ~35 live
# (block_b, P) int32 planes at k=21 (hi/lo accumulators, rc words, hash
# mixes, the 7 outputs and their copies); 48 planes of budget leaves
# headroom for other k. Round-1 shipped a fixed block_b=512 that exceeded
# the 16MB scoped-VMEM limit at the CLI's max_len=256 geometry (P=236).
KMER_KEYS_VMEM_BUDGET = 12 << 20
KMER_KEYS_PLANES = 48


def _lane_pad(n: int) -> int:
    """VMEM vectors pad their minor dim to 128 lanes: a (b, P) int32 plane
    occupies b * round_up(P, 128) * 4 bytes regardless of P. Block-size
    models must budget the padded width (round-1's stride-2 OOM came from
    modeling P=40 planes at 40 lanes when the hardware stores 128)."""
    return -(-n // 128) * 128


def kmer_keys_block_b(L: int, k: int) -> int:
    P = _lane_pad(L - k + 1)
    bb = KMER_KEYS_VMEM_BUDGET // (KMER_KEYS_PLANES * P * 4 + _lane_pad(L))
    return int(min(512, max(8, (bb // 8) * 8)))


def kmer_keys_pallas(
    codes,
    lens,
    k: int,
    n_buckets: int,
    interpret: bool = False,
    block_b: int = 0,
):
    """Fused Pallas window stage. codes (B, L) int8, lens (B,) int32 ->
    (c_hi, c_lo [int32 bitcast], h1, h2 [int32], fwd_canon, palindrome,
    valid [bool]) each (B, P).

    Grids over the read axis in block_b-row blocks so each block's working
    set (codes slab + ~20 (block_b, P) uint32 intermediates) stays well
    inside the ~16MB VMEM; B is padded up to a multiple of block_b."""
    B, L = codes.shape
    P = L - k + 1
    if block_b <= 0:
        block_b = kmer_keys_block_b(L, k)
    if B <= block_b:
        grid_b = 1
        block_b = B
        pad = 0
    else:
        grid_b = -(-B // block_b)
        pad = grid_b * block_b - B
        if pad:
            codes = jnp.pad(codes, ((0, pad), (0, 0)), constant_values=N_CODE)
            lens = jnp.pad(lens, (0, pad))
    # 2-D lens: 1-D int32 operands hit an XLA(T(1024))/Mosaic(T(512))
    # layout mismatch at block sizes < 1024
    lens2 = lens.reshape(-1, 1)
    out = jax.ShapeDtypeStruct((grid_b * block_b, P), jnp.int32)
    outb = jax.ShapeDtypeStruct((grid_b * block_b, P), jnp.bool_)
    res = pl.pallas_call(
        partial(_kmer_keys_body, k, n_buckets),
        grid=(grid_b,),
        out_shape=(out, out, out, out, outb, outb, outb),
        in_specs=[
            pl.BlockSpec((block_b, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((block_b, P), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(7)
        ),
        interpret=interpret,
    )(codes, lens2)
    if pad:
        res = tuple(r[:B] for r in res)
    return res


def _mono_select_body(S: int, W: int, n_stash: int, rowT_ref, hi_ref, lo_ref,
                      fc_ref, pal_ref, valid_ref, stash_ref, bits_f_ref,
                      bits_r_ref):
    """Slot select for mono-table probes, all in 2-D (b, P) planes.

    XLA's fusion of this select materializes multiple (B, P, W*S) HBM
    intermediates (~2x the gather cost at stacked widths), and a naive
    Pallas version using (b, P, S) rank-3 vectors pads the size-S minor dim
    to 128 lanes (32x VMEM blowup -> register spills). Here the gathered
    rows arrive TRANSPOSED as (RW, B, P): every field/slot plane rowT[j]
    is a clean 2-D (b, P) vector and selects are int32 mask arithmetic
    (Mosaic cannot insert a minor dim on i1 vectors either).

    Outputs are (W, b, P) planes; the stash is (n_stash, 2 + 2W) rows of
    [hi, lo, vs_bits, vd_bits]."""
    hi_i = hi_ref[:]
    lo_i = lo_ref[:]

    vs = [None] * W
    vd = [None] * W
    for s in range(S):
        m = -(((rowT_ref[s] == hi_i) & (rowT_ref[S + s] == lo_i)).astype(jnp.int32))
        for w in range(W):
            vsw = m & rowT_ref[2 * S + w * S + s]
            vdw = m & rowT_ref[2 * S + (W + w) * S + s]
            vs[w] = vsw if vs[w] is None else (vs[w] | vsw)
            vd[w] = vdw if vd[w] is None else (vd[w] | vdw)

    for s in range(n_stash):
        m = -(((hi_i == stash_ref[s, 0]) & (lo_i == stash_ref[s, 1])).astype(jnp.int32))
        for w in range(W):
            vs[w] = vs[w] | (m & stash_ref[s, 2 + w])
            vd[w] = vd[w] | (m & stash_ref[s, 2 + W + w])

    m_fc = -(fc_ref[:].astype(jnp.int32))
    m_pal = -(pal_ref[:].astype(jnp.int32))
    m_v = -(valid_ref[:].astype(jnp.int32))
    for w in range(W):
        f = vd[w] ^ ((vs[w] ^ vd[w]) & m_fc)    # fc ? vs : vd
        alt = vs[w] ^ ((vd[w] ^ vs[w]) & m_fc)  # fc ? vd : vs
        r = alt ^ ((vs[w] ^ alt) & m_pal)       # pal ? vs : alt
        bits_f_ref[w] = f & m_v
        bits_r_ref[w] = r & m_v


# scoped-VMEM budget for a mono_select block: the kernel's block working set
# (double-buffered rowT input + key/mask planes + both W-plane outputs) must
# stay under the hardware's ~16MB scoped VMEM with headroom for Mosaic's own
# temporaries. Round-1 shipped a fixed block_b=512 that blew this budget
# (24MB > 16MB) at the bench's W=4 geometry — block_b is now derived.
MONO_SELECT_VMEM_BUDGET = 8 << 20


def mono_select_block_b(RW: int, P: int, W: int) -> int:
    """Largest multiple-of-8 block_b whose double-buffered working set
    (RW rowT planes + 5 key/mask planes + 2W output planes, int32 each)
    fits MONO_SELECT_VMEM_BUDGET. 0 = no feasible block (caller must use
    the XLA select path)."""
    per_row = (RW + 5 + 2 * W) * _lane_pad(P) * 4
    bb = MONO_SELECT_VMEM_BUDGET // (2 * per_row)
    return int(min(512, (bb // 8) * 8))


def mono_select_pallas(rowT, hi_i, lo_i, fc, pal, valid, stash, S: int, W: int,
                       interpret: bool = False, block_b: int = 0):
    """rowT (RW, B, P) transposed gathered bucket rows + (B, P) keys/masks +
    stash (n_stash, 2+2W) -> (bits_f, bits_r) each (W, B, P) int32."""
    RW, B, P = rowT.shape
    n_stash = stash.shape[0]
    if block_b <= 0:
        block_b = mono_select_block_b(RW, P, W)
        if block_b <= 0:
            raise ValueError(
                f"mono_select block does not fit VMEM (RW={RW}, P={P}, W={W})"
            )
    if B <= block_b:
        grid_b, block_b, pad = 1, B, 0
    else:
        grid_b = -(-B // block_b)
        pad = grid_b * block_b - B
        if pad:
            rowT = jnp.pad(rowT, ((0, 0), (0, pad), (0, 0)))
            hi_i, lo_i = (jnp.pad(a, ((0, pad), (0, 0))) for a in (hi_i, lo_i))
            fc, pal, valid = (
                jnp.pad(a, ((0, pad), (0, 0))) for a in (fc, pal, valid)
            )
    out = jax.ShapeDtypeStruct((W, grid_b * block_b, P), jnp.int32)
    spec2 = lambda: pl.BlockSpec((block_b, P), lambda i: (i, 0), memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        partial(_mono_select_body, S, W, n_stash),
        grid=(grid_b,),
        out_shape=(out, out),
        in_specs=[
            pl.BlockSpec((RW, block_b, P), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            spec2(),
            spec2(),
            spec2(),
            spec2(),
            spec2(),
            pl.BlockSpec((n_stash, 2 + 2 * W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((W, block_b, P), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, block_b, P), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(rowT, hi_i, lo_i, fc, pal, valid, stash)
    if pad:
        res = tuple(r[:, :B] for r in res)
    return res


def _band_tree_body(Pw: int, W: int, Q1: int, in_ref, out_ref):
    """Fused banded-intersection tree + band->full-width expansion for one
    read block: the jnp halving tree materializes ~2 GB of (B, Q+1, Wb)
    temporaries per 65536-chunk (measured +17.8 ms + 2.7 ms expand,
    docs/PERF.md round-4); here every level lives in VMEM.

    in_ref rows pack [band (Wb) | page | has] in the lane axis (all three
    share one 128-lane tile; separate (.., 1)-minor arrays each pad to a
    full tile and blow the scoped-VMEM budget). The AND-combine is
    associative and commutative and a zero band expands to zero bits
    regardless of its page, so any pairing order yields bit-identical
    output to engine._band_tree + _expand_band."""
    Wb = 2 * Pw

    def comb(a, b):
        p1, b1, h1 = a
        p2, b2, h2 = b
        zeros = jnp.zeros_like(b1[:, :Pw])
        up1 = jnp.concatenate([b1[:, Pw:], zeros], axis=1)
        up2 = jnp.concatenate([b2[:, Pw:], zeros], axis=1)
        d = p2 - p1
        nb = jnp.where(d == 0, b1 & b2, 0)
        nb = jnp.where(d == 1, up1 & b2, nb)
        nb = jnp.where(d == -1, b1 & up2, nb)
        both = h1 & h2
        band = jnp.where(both != 0, nb, jnp.where(h1 != 0, b1, b2))
        page = jnp.where(
            both != 0, jnp.maximum(p1, p2), jnp.where(h1 != 0, p1, p2)
        )
        return page, band, h1 | h2

    vals = []
    for i in range(Q1):
        row = in_ref[i]
        vals.append((row[:, Wb : Wb + 1], row[:, :Wb], row[:, Wb + 1 : Wb + 2]))
    n = Q1
    while n > 1:
        half = n // 2
        for i in range(half):
            vals[i] = comb(vals[i], vals[half + i])
        if n % 2:
            vals[0] = comb(vals[0], vals[n - 1])
        n = half

    page, band, has = vals[0]
    lo = band[:, :Pw]
    hi = band[:, Pw:]
    n_pages = -(-W // Pw) + 1
    for p in range(n_pages):
        seg = jnp.where(page == p, lo, 0)
        if p > 0:
            seg = seg | jnp.where(page == p - 1, hi, 0)
        seg = jnp.where(has != 0, seg, 0)
        start = p * Pw
        width = min(Pw, W - start)
        if width > 0:
            out_ref[:, start : start + width] = seg[:, :width]


BAND_TREE_VMEM_BUDGET = 8 << 20


def band_tree_block_b(Q1: int, Wb: int, W: int) -> int:
    """Block rows sized so the double-buffered input block plus Mosaic's
    conservatively-live tree temporaries (measured ~58 KB/row at Q1=14,
    Wb=64, W=625 — about 7 lane-padded tiles per position) plus the output
    block fit the budget."""
    per_row = 7 * Q1 * _lane_pad(Wb + 2) * 4 + _lane_pad(W) * 4
    bb = BAND_TREE_VMEM_BUDGET // per_row
    return max((bb // 8) * 8, 8)


def band_tree_expand_pallas(packed, W: int, Pw: int,
                            interpret: bool = False, block_b: int = 0):
    """packed (Q1, B, Wb+2) int32 rows [band | page | has] -> bits (B, W).
    Bit-identical to engine._band_tree + _expand_band."""
    Q1, B, Wb2 = packed.shape
    Wb = Wb2 - 2
    if block_b <= 0:
        block_b = band_tree_block_b(Q1, Wb, W)
    if B <= block_b:
        grid_b, block_b, pad = 1, B, 0
    else:
        grid_b = -(-B // block_b)
        pad = grid_b * block_b - B
        if pad:
            packed = jnp.pad(packed, ((0, 0), (0, pad), (0, 0)))
    out = jax.ShapeDtypeStruct((grid_b * block_b, W), jnp.int32)
    res = pl.pallas_call(
        partial(_band_tree_body, Pw, W, Q1),
        grid=(grid_b,),
        out_shape=out,
        in_specs=[
            pl.BlockSpec(
                (Q1, block_b, Wb2), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_b, W), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(packed)
    if pad:
        res = res[:B]
    return res

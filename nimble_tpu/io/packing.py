"""2-bit wire packing for the host->device read transfer.

The alignment device step only needs 2 bits per base plus which positions
are N; shipping int8 codes (1 byte/base at the reader's max_len stride)
makes the CLI transfer-bound long before the device saturates (measured
~55 MB/s H2D through the dev relay, scripts/tunnelbw.py). The packed wire
format is:

  r1_words  (B, ceil(L/16)) int32  -- base j in word j//16 at bit 2*(j%16)
  r1_lens   (B,)            int32
  r1_nidx   (k,)            int32  -- indices of reads containing N
  r1_nrows  (k, ceil(L/32)) int32  -- those reads' N-position bit rows

N's are rare in real data, so the flag plane ships as a sparse sidecar
(engine-side scatter rebuilds the dense plane); the engine falls back to a
dense-flags dispatch variant when a span exceeds its sidecar capacity.

Semantics are bit-identical to the int8 path: padding beyond a read's
length packs as A, but every window crossing the length boundary is
already invalidated by the device's `inside` mask, and N positions are
restored to N_CODE on device before the window stage.
"""
from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from nimble_tpu.io import native as _native


def pack_codes_np(codes: np.ndarray, lens: np.ndarray, L: int):
    """Numpy reference implementation of native nt_pack_2bit.

    Returns (words (B, Lw) int32, nidx (k,) int32, nrows (k, Lf) int32)."""
    B = codes.shape[0]
    Lw = (L + 15) // 16
    Lf = (L + 31) // 32
    c = codes[:, :L].astype(np.uint32) if codes.shape[1] >= L else None
    if c is None:
        pad = np.full((B, L - codes.shape[1]), 4, dtype=np.uint32)
        c = np.concatenate([codes.astype(np.uint32), pad], axis=1)
    in_read = np.arange(L)[None, :] < np.minimum(lens, L)[:, None]
    isn = (c >= 4) & in_read
    v = np.where(isn | ~in_read, 0, c & 3)
    vp = np.zeros((B, Lw * 16), dtype=np.uint32)
    vp[:, :L] = v
    shifts = (2 * (np.arange(16, dtype=np.uint32) % 16)).astype(np.uint32)
    words = (
        (vp.reshape(B, Lw, 16) << shifts[None, None, :])
        .sum(axis=2, dtype=np.uint32)
        .view(np.int32)
    )
    fp = np.zeros((B, Lf * 32), dtype=np.uint32)
    fp[:, :L] = isn.astype(np.uint32)
    fsh = np.arange(32, dtype=np.uint32)
    nflags = (
        (fp.reshape(B, Lf, 32) << fsh[None, None, :])
        .sum(axis=2, dtype=np.uint32)
        .view(np.int32)
    )
    has_n = isn.any(axis=1)
    nidx = np.flatnonzero(has_n).astype(np.int32)
    return words, nidx, np.ascontiguousarray(nflags[nidx])


_PACK_BOUND = False


def _bind_pack(lib):
    global _PACK_BOUND
    if _PACK_BOUND:
        return True
    try:
        lib.nt_pack_2bit.restype = None
        lib.nt_pack_2bit.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
    except AttributeError:
        return False
    _PACK_BOUND = True
    return True


def pack_codes(codes: np.ndarray, lens: np.ndarray, L: int):
    """Pack int8 codes to the 2-bit wire format (native when available).

    Returns (words, nidx, nrows) as pack_codes_np."""
    lib = _native._load()
    if lib is None or not _bind_pack(lib) or codes.shape[1] < L:
        return pack_codes_np(codes, lens, L)
    B = codes.shape[0]
    Lw = (L + 15) // 16
    Lf = (L + 31) // 32
    codes = np.ascontiguousarray(codes)
    lens32 = np.ascontiguousarray(lens, dtype=np.int32)
    words = np.empty((B, Lw), dtype=np.int32)
    nflags = np.empty((B, Lf), dtype=np.int32)
    has_n = np.empty(B, dtype=np.uint8)
    lib.nt_pack_2bit(
        codes.ctypes.data_as(ctypes.c_void_p),
        lens32.ctypes.data_as(ctypes.c_void_p),
        B,
        codes.shape[1],
        L,
        words.ctypes.data_as(ctypes.c_void_p),
        nflags.ctypes.data_as(ctypes.c_void_p),
        has_n.ctypes.data_as(ctypes.c_void_p),
    )
    nidx = np.flatnonzero(has_n).astype(np.int32)
    return words, nidx, np.ascontiguousarray(nflags[nidx])


def pack_batch(batch: dict, L: int) -> dict:
    """Reader batch dict -> packed wire dict for engine.align_packed_async.

    Keeps non-sequence fields (cbs/umis/poss/gns/lens) by reference."""
    w1, i1, r1 = pack_codes(batch["r1_codes"], batch["r1_lens"], L)
    out = {
        "r1_words": w1,
        "r1_lens": batch["r1_lens"],
        "r1_nidx": i1,
        "r1_nrows": r1,
    }
    if batch.get("r2_codes") is not None:
        w2, i2, r2 = pack_codes(batch["r2_codes"], batch["r2_lens"], L)
        out.update(
            {
                "r2_words": w2,
                "r2_lens": batch["r2_lens"],
                "r2_nidx": i2,
                "r2_nrows": r2,
            }
        )
    for k in ("cbs", "umis", "poss", "gns", "names"):
        if k in batch:
            out[k] = batch[k]
    return out

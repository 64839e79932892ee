"""Distributed quantification: cb-bucketed all-to-all + host-0 merge.

The reference has no distributed runtime at all (single host, threads;
SURVEY §2.8/§5.8). This module is the scale-out counting layer:

  1. each data shard (host/chip) aligns its own slice of the read stream;
  2. rows are routed so each shard owns a disjoint set of (cb, umi) pairs:
     bucket = hash(cb, umi) mod n_shards, exchanged with jax.lax.all_to_all
     inside shard_map over the "data" axis (rides ICI on a pod slice);
  3. every shard runs the device UMI pipeline (quant.device) on the rows it
     owns — (cb, umi) grouping is now shard-local by construction;
  4. per-shard count rows are gathered host-side and merged (host 0 in a
     multihost deployment writes the TSV), summing per (cb, feature).

Bucketing on the (cb, umi) PAIR rather than cb alone is deliberate: the
UMI algorithms (thresholding fixpoint, intersection) are per-(cb, umi)
group and the final counts are summed per (cb, feature) at the merge, so
pair-level co-location is sufficient for exactness — and it makes the
exchange skew-proof. A dataset where one barcode holds half the rows
(common: an over-sequenced cell) still spreads evenly across shards
because its UMIs hash independently; bucketing on cb alone would pad every
shard's exchange buffer to that one hot bucket's size.

Keys travel as 64-bit string hashes (two int32 lanes); the host keeps
hash -> string maps for final decoding. If the 64-bit hashes of two
distinct strings ever collide, the whole batch is re-hashed with a salted
family (blake2b salt) until collision-free — no hard failure.

`init_distributed()` wires jax.distributed for real multi-host pods; the
same shard_map code runs unmodified on the single-process CPU/TPU meshes
used in tests.
"""
from __future__ import annotations

import hashlib
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or env (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID). Returns True if multi-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coordinator_address:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes or os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=int(process_id or os.environ.get("JAX_PROCESS_ID", 0)),
    )
    return True


def hash64(value: str, salt: int = 0) -> Tuple[np.int32, np.int32]:
    """Stable 64-bit string hash as two int32 words. salt > 0 selects an
    independent blake2b family (collision fallback)."""
    key = b"s%d" % salt if salt else b""
    digest = hashlib.blake2b(value.encode(), digest_size=8, salt=key).digest()
    v = int.from_bytes(digest, "little")
    return np.int32((v >> 32) - (1 << 31)), np.int32((v & 0xFFFFFFFF) - (1 << 31))


def _hash_unique(strings: np.ndarray, salt: int) -> np.ndarray:
    """Hash an array of (unique) strings to (n, 2) int32 words. Python-level
    blake2b per string, but callers only pass the UNIQUE cb/umi sets — the
    per-row work stays vectorized."""
    out = np.empty((len(strings), 2), dtype=np.int32)
    key = b"s%d" % salt if salt else b""
    off = 1 << 31
    for i, s in enumerate(strings):
        digest = hashlib.blake2b(s.encode(), digest_size=8, salt=key).digest()
        v = int.from_bytes(digest, "little")
        out[i, 0] = (v >> 32) - off
        out[i, 1] = (v & 0xFFFFFFFF) - off
    return out


def _collision_free_hashes(uniq: np.ndarray, max_salts: int = 8) -> np.ndarray:
    """Hash the unique-string array, retrying with salted families until the
    64-bit keys are collision-free (VERDICT r2: rehash instead of raising)."""
    for salt in range(max_salts):
        h = _hash_unique(uniq, salt)
        if np.unique(h, axis=0).shape[0] == len(uniq):
            return h
    raise RuntimeError(
        f"64-bit hash collisions persisted across {max_salts} salted families"
    )


def _combined_key(words: np.ndarray) -> np.ndarray:
    """(n, 2) int32 hash words -> (n,) int64 sortable key."""
    hi = words[:, 0].astype(np.int64)
    lo = words[:, 1].astype(np.int64) & 0xFFFFFFFF
    return (hi << 32) | lo


def _bucket_exchange_fn(n_shards: int, rows_per_shard: int, width: int):
    """Build the shard_mapped exchange: each shard holds (rows_per_shard,
    width) int32 row records + validity; rows are regrouped so shard s
    receives every row whose bucket == s.

    Rows are pre-sorted by bucket on the host side of each shard, with equal
    per-bucket capacity (rows_per_shard // n_shards) enforced by padding —
    all_to_all then delivers bucket b's block to shard b.
    """

    def exchange(rows, valid):
        # rows: (rows_per_shard, width); blocks of size rows_per_shard/n_shards
        # laid out per destination shard
        blk = rows_per_shard // n_shards
        r = rows.reshape(n_shards, blk, width)
        v = valid.reshape(n_shards, blk)
        r_out = jax.lax.all_to_all(r, "data", split_axis=0, concat_axis=0, tiled=False)
        v_out = jax.lax.all_to_all(v, "data", split_axis=0, concat_axis=0, tiled=False)
        return r_out.reshape(n_shards * blk, width), v_out.reshape(n_shards * blk)

    return exchange


def cb_bucket_all_to_all(
    mesh: Mesh,
    rows: np.ndarray,  # (n_shards, rows_per_shard, width) int32
    valid: np.ndarray,  # (n_shards, rows_per_shard) bool
):
    """Run the bucket exchange over the mesh's "data" axis. Each source
    shard's rows must already be laid out as n_shards equal blocks by
    destination bucket. Returns (rows, valid) with shard s holding all rows
    of bucket s."""
    n_shards, rows_per_shard, width = rows.shape
    fn = _bucket_exchange_fn(n_shards, rows_per_shard, width)
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("data", None), P("data")),
        out_specs=(P("data", None), P("data")),
    )
    rows_flat = rows.reshape(n_shards * rows_per_shard, width)
    valid_flat = valid.reshape(n_shards * rows_per_shard)
    out_rows, out_valid = jax.jit(sharded)(rows_flat, valid_flat.astype(np.int32))
    return (
        np.asarray(out_rows).reshape(n_shards, rows_per_shard, width),
        np.asarray(out_valid).reshape(n_shards, rows_per_shard).astype(bool),
    )


def distributed_report(
    mesh: Mesh,
    shard_rows: Sequence[Sequence[Tuple[str, str, np.ndarray, float]]],
    feature_names: Sequence[str],
    threshold: float = 0.05,
    disable_thresholding: bool = False,
    with_dropped: bool = False,
    with_stats: bool = False,
):
    """End-to-end distributed counting over an in-process mesh.

    shard_rows[s] = rows aligned by data-shard s, each (cb, umi, bits, score)
    with bits an (W,) int32 array. Returns merged (feature, count, cb) rows
    identical to the single-host pipeline. with_stats=True appends a dict of
    exchange-buffer statistics (padding factor, block size) for tests.

    Host side is fully vectorized (numpy over the flattened row set; blake2b
    only over the UNIQUE cb/umi strings) — the round-2 per-row Python loops
    were the scaling bottleneck.
    """
    from nimble_tpu.quant.device import report_device

    n_shards = mesh.shape["data"]
    W = len(shard_rows[0][0][2]) if shard_rows and shard_rows[0] else 1
    width = 4 + W + 1  # cb_hi, cb_lo, umi_hi, umi_lo, bits..., score(bitcast)

    # flatten every shard's rows into parallel arrays
    src_shard: List[int] = []
    cb_strs: List[str] = []
    umi_strs: List[str] = []
    bits_rows: List[np.ndarray] = []
    score_vals: List[float] = []
    for s, rows in enumerate(shard_rows):
        for cb, umi, bits, score in rows:
            src_shard.append(s)
            cb_strs.append(cb)
            umi_strs.append(umi)
            bits_rows.append(bits)
            score_vals.append(score)
    n_total = len(cb_strs)

    stats = {"rows": n_total, "blk": 0, "buffer_rows": 0}
    if n_total == 0:
        empty: List[Tuple[str, int, str]] = []
        out: Tuple = (empty,)
        if with_dropped:
            out += (0,)
        if with_stats:
            out += (stats,)
        return out if len(out) > 1 else empty

    uniq_cb, inv_cb = np.unique(np.asarray(cb_strs, dtype=object), return_inverse=True)
    uniq_umi, inv_umi = np.unique(np.asarray(umi_strs, dtype=object), return_inverse=True)
    cb_hash = _collision_free_hashes(uniq_cb)
    umi_hash = _collision_free_hashes(uniq_umi)

    rec = np.empty((n_total, width), dtype=np.int32)
    rec[:, 0:2] = cb_hash[inv_cb]
    rec[:, 2:4] = umi_hash[inv_umi]
    rec[:, 4 : 4 + W] = np.asarray(bits_rows, dtype=np.int32).reshape(n_total, W)
    rec[:, 4 + W] = np.asarray(score_vals, dtype=np.float32).view(np.int32)

    # skew-proof bucket: the (cb, umi) pair key (module docstring)
    pair = (
        rec[:, 1].astype(np.int64) ^ (rec[:, 3].astype(np.int64) * 0x9E3779B9)
    ) & 0x7FFFFFFFFFFFFFFF
    bucket = (pair % n_shards).astype(np.int64)

    # vectorized placement into per-(source, destination) blocks of equal
    # capacity blk (the all_to_all split must be uniform across shards; with
    # pair-bucketing the per-block occupancies are near-uniform so blk stays
    # close to the mean, not the hot-cb max)
    shard_arr = np.asarray(src_shard, dtype=np.int64)
    group = shard_arr * n_shards + bucket
    counts = np.bincount(group, minlength=n_shards * n_shards)
    blk = max(1, int(counts.max()))
    order = np.argsort(group, kind="stable")
    sorted_group = group[order]
    starts = np.zeros_like(counts)
    starts[1:] = np.cumsum(counts)[:-1]
    within = np.arange(n_total, dtype=np.int64) - starts[sorted_group]
    dest_shard = sorted_group // n_shards
    dest_row = (sorted_group % n_shards) * blk + within

    rows_arr = np.zeros((n_shards, n_shards * blk, width), dtype=np.int32)
    valid_arr = np.zeros((n_shards, n_shards * blk), dtype=bool)
    rows_arr[dest_shard, dest_row] = rec[order]
    valid_arr[dest_shard, dest_row] = True
    stats["blk"] = blk
    stats["buffer_rows"] = int(rows_arr.shape[0] * rows_arr.shape[1])

    out_rows, out_valid = cb_bucket_all_to_all(mesh, rows_arr, valid_arr)

    # vectorized hash -> string decode via sorted 64-bit keys
    cb_keys = _combined_key(cb_hash)
    cb_order = np.argsort(cb_keys)
    umi_keys = _combined_key(umi_hash)
    umi_order = np.argsort(umi_keys)

    def decode(words: np.ndarray, keys, key_order, names) -> np.ndarray:
        pos = np.searchsorted(keys[key_order], _combined_key(words))
        return names[key_order[pos]]

    # each shard now owns disjoint (cb, umi) pairs: run the device pipeline
    # per shard, then sum per (cb, feature) at the merge
    merged: Dict[Tuple[str, str], int] = {}
    dropped_total = 0
    for s in range(n_shards):
        recs = out_rows[s][out_valid[s]]
        if recs.shape[0] == 0:
            continue
        cbs = decode(recs[:, 0:2], cb_keys, cb_order, uniq_cb).tolist()
        umis = decode(recs[:, 2:4], umi_keys, umi_order, uniq_umi).tolist()
        bits = recs[:, 4 : 4 + W]
        scores = recs[:, 4 + W].view(np.float32).astype(np.float64)
        counts_s, dropped = report_device(
            cbs, umis, bits, scores, feature_names, threshold,
            disable_thresholding, with_dropped=True,
        )
        dropped_total += dropped
        for feature, count, cb in counts_s:
            merged[(cb, feature)] = merged.get((cb, feature), 0) + count

    rows = [(feature, c, cb) for (cb, feature), c in sorted(merged.items())]
    out = (rows,)
    if with_dropped:
        out += (dropped_total,)
    if with_stats:
        out += (stats,)
    return out if len(out) > 1 else rows

"""Distributed quantification: cb-bucketed all-to-all + host-0 merge.

The reference has no distributed runtime at all (single host, threads;
SURVEY §2.8/§5.8). This module is the scale-out counting layer:

  1. each data shard (host/chip) aligns its own slice of the read stream;
  2. rows are routed so each shard owns a disjoint set of cell barcodes:
     bucket = hash(cb) mod n_shards, exchanged with jax.lax.all_to_all
     inside shard_map over the "data" axis (rides ICI on a pod slice);
  3. every shard runs the device UMI pipeline (quant.device) on the rows it
     owns — (cb, umi) grouping is now shard-local by construction;
  4. per-shard count rows are gathered host-side and merged (host 0 in a
     multihost deployment writes the TSV).

Keys travel as 64-bit string hashes (two int32 lanes); the host keeps
hash -> string maps for final decoding and verifies collisions.

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


def hash64(value: str) -> Tuple[np.int32, np.int32]:
    """Stable 64-bit string hash as two int32 words."""
    digest = hashlib.blake2b(value.encode(), digest_size=8).digest()
    v = int.from_bytes(digest, "little")
    return np.int32((v >> 32) - (1 << 31)), np.int32((v & 0xFFFFFFFF) - (1 << 31))


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
):
    """End-to-end distributed counting demo/impl over an in-process mesh.

    shard_rows[s] = rows aligned by data-shard s, each (cb, umi, bits, score)
    with bits an (W,) int32 array. Returns merged (feature, count, cb) rows
    identical to the single-host pipeline.
    """
    from nimble_tpu.quant.device import report_device

    n_shards = mesh.shape["data"]
    W = len(shard_rows[0][0][2]) if shard_rows and shard_rows[0] else 1

    # host side of each shard: bucket rows by cb hash, build hash->string maps
    hash_to_cb: Dict[Tuple[int, int], str] = {}
    hash_to_umi: Dict[Tuple[int, int], str] = {}
    width = 4 + W + 1  # cb_hi, cb_lo, umi_hi, umi_lo, bits..., score(bitcast)

    buckets: List[List[List[np.ndarray]]] = [
        [[] for _ in range(n_shards)] for _ in range(n_shards)
    ]
    for s, rows in enumerate(shard_rows):
        for cb, umi, bits, score in rows:
            ch = hash64(cb)
            uh = hash64(umi)
            for d, prev in ((ch, hash_to_cb), (uh, hash_to_umi)):
                key = (int(d[0]), int(d[1]))
                existing = prev.get(key)
                if existing is not None and existing != (cb if prev is hash_to_cb else umi):
                    raise RuntimeError("64-bit key hash collision")
                prev[key] = cb if prev is hash_to_cb else umi
            bucket = (int(ch[1]) & 0x7FFFFFFF) % n_shards
            rec = np.empty(width, dtype=np.int32)
            rec[0], rec[1], rec[2], rec[3] = ch[0], ch[1], uh[0], uh[1]
            rec[4 : 4 + W] = bits
            rec[4 + W] = np.float32(score).view(np.int32)
            buckets[s][bucket].append(rec)

    blk = max(
        (len(b) for shard in buckets for b in shard), default=0
    )
    blk = max(blk, 1)
    rows_arr = np.zeros((n_shards, n_shards * blk, width), dtype=np.int32)
    valid_arr = np.zeros((n_shards, n_shards * blk), dtype=bool)
    for s in range(n_shards):
        for b in range(n_shards):
            recs = buckets[s][b]
            if recs:
                rows_arr[s, b * blk : b * blk + len(recs)] = np.stack(recs)
                valid_arr[s, b * blk : b * blk + len(recs)] = True

    out_rows, out_valid = cb_bucket_all_to_all(mesh, rows_arr, valid_arr)

    # each shard now owns disjoint cbs: run the device pipeline per shard
    merged: Dict[Tuple[str, str], int] = {}
    dropped_total = 0
    for s in range(n_shards):
        recs = out_rows[s][out_valid[s]]
        if recs.shape[0] == 0:
            continue
        cbs = [hash_to_cb[(int(r[0]), int(r[1]))] for r in recs]
        umis = [hash_to_umi[(int(r[2]), int(r[3]))] for r in recs]
        bits = recs[:, 4 : 4 + W]
        scores = recs[:, 4 + W].view(np.float32).astype(np.float64)
        counts, dropped = report_device(
            cbs, umis, bits, scores, feature_names, threshold,
            disable_thresholding, with_dropped=True,
        )
        dropped_total += dropped
        for feature, count, cb in counts:
            merged[(cb, feature)] = merged.get((cb, feature), 0) + count

    rows = [(feature, c, cb) for (cb, feature), c in sorted(merged.items())]
    return (rows, dropped_total) if with_dropped else rows

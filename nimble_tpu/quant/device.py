"""Device-side quantification: the UMI pipeline as XLA segment ops.

The scale path for per-cell counting: per-read (cb, umi) group ids, feature
bitsets and scores stay on device, and the whole
  groupby -> per-UMI proportional-thresholding fixpoint -> intersection
pipeline runs as vectorized segment operations (segment_sum / segment_min /
bitset algebra) over ALL UMI groups simultaneously — no per-group Python.
Under a ("data",) mesh the same code runs sharded with XLA-inserted
collectives (see parallel/dist.py for the cross-host cb-bucket exchange).

Semantics match quant.exact (reference: nimble/utils.py:119-224) with one
caveat: device accumulation is float32 in hardware-determined order, so
score ratios landing exactly on the threshold boundary can differ from the
float64 host path in pathological ties. The host path is the bit-exactness
oracle (used by the report CLI); this path is validated count-equal on
realistic data (see tests/test_quant_device.py).

Duplicate-row merging (convert_df_to_proper_umi's groupby-sum) is provably
unnecessary here: merging rows with equal (group, features) leaves both the
proportional score distribution and the intersection invariant, so the
device path skips it.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def factorize(values: Sequence) -> Tuple[np.ndarray, List]:
    """Host helper: values -> (int32 codes, uniques in first-seen order)."""
    codes = np.empty(len(values), dtype=np.int32)
    uniq: Dict = {}
    order = []
    for i, v in enumerate(values):
        code = uniq.get(v)
        if code is None:
            code = len(order)
            uniq[v] = code
            order.append(v)
        codes[i] = code
    return codes, order


def popcount32(x: jnp.ndarray) -> jnp.ndarray:
    """Per-element popcount of int32 bit patterns."""
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24 & 0x3F


def _expand_bits(bits: jnp.ndarray, n_features: int) -> jnp.ndarray:
    """(N, W) int32 bitsets -> (N, n_features) bool membership."""
    N, W = bits.shape
    shifts = jnp.arange(32, dtype=jnp.int32)
    expanded = (bits[:, :, None] >> shifts[None, None, :]) & 1  # (N, W, 32)
    return expanded.reshape(N, W * 32)[:, :n_features].astype(bool)


def _pack_bits(mask: jnp.ndarray, W: int) -> jnp.ndarray:
    """(G, n_features) bool -> (G, W) int32 bitsets."""
    G, n_features = mask.shape
    padded = jnp.zeros((G, W * 32), dtype=jnp.int32).at[:, :n_features].set(
        mask.astype(jnp.int32)
    )
    shifts = jnp.arange(32, dtype=jnp.int32)
    words = (padded.reshape(G, W, 32) << shifts[None, None, :]).sum(axis=2)
    return words.astype(jnp.int32)


def device_umi_pipeline(
    group_ids: jnp.ndarray,  # (N,) int32, values in [0, n_groups)
    bits: jnp.ndarray,  # (N, W) int32 feature bitsets
    scores: jnp.ndarray,  # (N,) float32
    n_groups: int,
    n_features: int,
    threshold: float,
):
    """Full thresholding + intersection over all groups at once.

    Returns (inter_bits (n_groups, W) int32, group_alive (n_groups,) bool):
    the per-group feature intersection after thresholding, and whether the
    group survived (non-empty intersection).
    """
    N, W = bits.shape
    member = _expand_bits(bits, n_features)  # (N, F) bool

    def feature_scores(surviving_mask):
        """Per-group per-feature proportional score sums + group totals."""
        active = member & surviving_mask[group_ids]  # (N, F)
        k = active.sum(axis=1)  # features per row
        has = k > 0
        spf = jnp.where(has, scores / jnp.maximum(k, 1), 0.0)
        contrib = active.astype(jnp.float32) * spf[:, None]  # (N, F)
        fscores = jax.ops.segment_sum(contrib, group_ids, num_segments=n_groups)
        totals = jax.ops.segment_sum(
            jnp.where(has, scores, 0.0), group_ids, num_segments=n_groups
        )
        return fscores, totals

    init_surviving = jnp.ones((n_groups, n_features), dtype=bool)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        surviving, _ = state
        fscores, totals = feature_scores(surviving)
        safe_tot = jnp.maximum(totals, 1e-30)[:, None]
        ratios = fscores / safe_tot
        # drop features strictly below threshold among current survivors;
        # groups with zero total drop nothing (0/0 -> NaN -> no drop in the
        # reference)
        drops = surviving & (ratios < threshold) & (totals[:, None] > 0)
        new_surviving = surviving & ~drops
        changed = jnp.any(drops)
        return new_surviving, changed

    if threshold > 0:
        surviving, _ = jax.lax.while_loop(
            cond, body, (init_surviving, jnp.bool_(True))
        )
    else:
        surviving = init_surviving

    # per-row filtered features; rows with empty filtered sets drop out
    filtered = member & surviving[group_ids]
    row_kept = filtered.any(axis=1)

    # segmented intersection: min over kept rows per group (excluded rows
    # contribute all-ones)
    neutral = jnp.ones_like(filtered, dtype=jnp.int32)
    vals = jnp.where(row_kept[:, None], filtered.astype(jnp.int32), neutral)
    inter = jax.ops.segment_min(vals, group_ids, num_segments=n_groups)
    kept_counts = jax.ops.segment_sum(
        row_kept.astype(jnp.int32), group_ids, num_segments=n_groups
    )
    group_alive = (kept_counts > 0) & (inter == 1).any(axis=1)
    inter_mask = (inter == 1) & group_alive[:, None]
    return _pack_bits(inter_mask, W), group_alive


def report_device(
    cbs: Sequence[str],
    umis: Sequence[str],
    bits: np.ndarray,
    scores: np.ndarray,
    feature_names: Sequence[str],
    threshold: float = 0.05,
    disable_thresholding: bool = False,
) -> List[Tuple[str, int, str]]:
    """Per-cell count matrix from align outputs via the device pipeline.

    Input rows are (cb, umi, feature-bitset, score) straight from the
    alignment engine (no TSV round-trip needed). Output rows are
    (feature, count, cell_barcode) sorted like the reference.
    """
    n = len(cbs)
    if n == 0:
        return []
    keys = [(cb, umi) for cb, umi in zip(cbs, umis)]
    group_ids_np, uniq_keys = factorize(keys)
    n_groups = len(uniq_keys)
    n_features = len(feature_names)

    inter_bits, alive = jax.jit(
        device_umi_pipeline, static_argnums=(3, 4, 5)
    )(
        jnp.asarray(group_ids_np),
        jnp.asarray(bits.astype(np.int32)),
        jnp.asarray(scores.astype(np.float32)),
        n_groups,
        n_features,
        0.0 if disable_thresholding else float(threshold),
    )
    inter_bits = np.asarray(jnp.reshape(inter_bits, (-1,))).reshape(n_groups, -1)
    alive = np.asarray(alive)

    # host finish: decode intersections, count per (cb, feature-string)
    from nimble_tpu.align.pipeline import decode_bitsets

    member = decode_bitsets(inter_bits.view(np.uint32), n_features)
    counts: Dict[Tuple[str, str], int] = {}
    for g in range(n_groups):
        if not alive[g]:
            continue
        feats = np.nonzero(member[g])[0]
        if feats.size == 0:
            continue
        feature = ",".join(sorted(feature_names[f] for f in feats))
        key = (uniq_keys[g][0], feature)
        counts[key] = counts.get(key, 0) + 1
    return [(feature, c, cb) for (cb, feature), c in sorted(counts.items())]

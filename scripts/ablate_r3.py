"""Round-3 dissection at the 65536-read operating point: where do the
~0.30 us/read go now that the relay overhead is amortized?
(chunkscale3.py: 2^16..2^18 chunks all land at ~3.4M reads/s)."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from nimble_tpu.align import engine as E
from nimble_tpu.align.engine import AlignEngine

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CH = 1 << 16


def timeit(f, *a, reps=12, burst=4):
    r = f(*a)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        acc = None
        for _ in range(burst):
            s = f(*a)
            acc = s if acc is None else acc + s
        _ = int(acc)
        best = min(best, time.time() - t0)
    return best / burst * 1000


index, config, codes, lens = B.build_workload()
rng = np.random.default_rng(0)
engine = AlignEngine(index, config, chunk_size=CH, max_len=B.READ_LEN)
p = engine.params
tables = engine.tables
g = index.pair_g
kg = p.k + g - 1
nb = tables["group_bucket"].shape[0]
W = tables["class_bits"].shape[1]
PP = B.READ_LEN - kg + 1
Q = (PP + g - 1) // g + 1
roww = tables["group_bucket"].shape[1]
print(f"g={g} Q={Q} buckets={nb} roww={roww} W={W}", flush=True)

reps = -(-CH // codes.shape[0])
c_dev = jax.device_put(np.tile(codes, (reps, 1))[:CH])
l_dev = jax.device_put(np.tile(lens, reps)[:CH])

from nimble_tpu.align.kernels import kmer_keys_pallas


@jax.jit
def win_only(c, l):
    hi_i, lo_i, h1, _h2, fwd_c, _p, valid = kmer_keys_pallas(c, l, kg, nb)
    return jnp.sum(hi_i) + jnp.sum(h1) + jnp.sum(valid)


@jax.jit
def win_probe(c, l):
    hi_i, lo_i, h1, _h2, fwd_c, _pal, valid = kmer_keys_pallas(c, l, kg, nb)
    jstar = jnp.clip(l - kg, 0, PP - 1)
    onehot = jnp.arange(PP, dtype=jnp.int32)[None, :] == jstar[:, None]
    cat = []
    for a in (hi_i, lo_i, h1, fwd_c, valid):
        t = jnp.where(onehot, a.astype(jnp.int32), 0).sum(axis=1, keepdims=True)
        cat.append(jnp.concatenate([a[:, ::g], t.astype(a.dtype)], axis=1))
    and_f, mask_f, and_r, mask_r = E.group_probe(*cat, tables, W, g)
    return jnp.sum(and_f) + jnp.sum(mask_f) + jnp.sum(and_r) + jnp.sum(mask_r)


@jax.jit
def full(c, l):
    return jnp.sum(E._score_mate_group(c, l, tables, p)[1])


@jax.jit
def whole(c, l):
    return jnp.sum(engine._fn(engine.tables, c, l)["score"])


hq = jax.device_put(rng.integers(0, nb, size=(CH, Q)).astype(np.int32))
gt = tables["group_bucket"]


@jax.jit
def raw_gather(h):
    return jnp.sum(gt[h], dtype=jnp.int32)


print(f"raw gather ({CH}x{Q} rows x{roww}w): {timeit(raw_gather, hq):.2f} ms", flush=True)
print(f"window stage only: {timeit(win_only, c_dev, l_dev):.2f} ms", flush=True)
print(f"window+tail+probe: {timeit(win_probe, c_dev, l_dev):.2f} ms", flush=True)
print(f"score_mate_group:  {timeit(full, c_dev, l_dev):.2f} ms", flush=True)
print(f"whole step:        {timeit(whole, c_dev, l_dev):.2f} ms", flush=True)

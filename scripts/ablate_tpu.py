"""Ablation timing of align_step stages on the real TPU.

Measures steady-state time of progressively larger slices of the pipeline to
find the bottleneck: kmer packing -> hash probe -> coverage -> intersection.
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from bench import build_workload, CHUNK, READ_LEN
from nimble_tpu.align import engine as E

index, config, codes, lens = build_workload()
tables = E._device_tables(index)
p = E.AlignParams.from_config(config, index)

c_dev = jax.device_put(codes[:CHUNK])
l_dev = jax.device_put(lens[:CHUNK])
t_dev = jax.device_put(tables)


def variant_kmer(t, c, l):
    hi, lo, valid = E.kmer_hi_lo(c, l, p.k)
    return hi.sum(), lo.sum(), valid.sum()


def variant_lookup(t, c, l):
    hi, lo, valid = E.kmer_hi_lo(c, l, p.k)
    cls = E.lookup_classes(hi, lo, valid, t, p.n_buckets)
    return (cls,)


def variant_lookup_cov(t, c, l):
    hi, lo, valid = E.kmer_hi_lo(c, l, p.k)
    cls = E.lookup_classes(hi, lo, valid, t, p.n_buckets)
    matched = cls >= 0
    return (E.coverage_score(matched, l, p.k, c.shape[1]),)


def variant_mate(t, c, l):
    return E._score_mate(c, l, t, p)


def variant_full(t, c, l):
    return E.align_step(t, p, c, l)


results = {}
for name, fn in [
    ("kmer_only", variant_kmer),
    ("kmer+lookup", variant_lookup),
    ("kmer+lookup+cov", variant_lookup_cov),
    ("full_mate_fwd_rev", variant_mate),
    ("full_align_step", variant_full),
]:
    jf = jax.jit(fn)
    t0 = time.time()
    out = jf(t_dev, c_dev, l_dev)
    jax.block_until_ready(out)
    compile_t = time.time() - t0
    iters = 16
    t0 = time.time()
    outs = [jf(t_dev, c_dev, l_dev) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    results[name] = dt
    print(
        f"{name:24s} compile {compile_t:7.1f}s  step {dt*1e3:8.3f} ms  "
        f"({CHUNK/dt/1e6:.2f} M reads/s)",
        flush=True,
    )

print(json.dumps(results))

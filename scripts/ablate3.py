"""Fine-grained mono-path ablation (same-process, interleaved A/B rounds
to defeat tenancy drift): where does the per-chunk time go at stride 1?"""
import sys, time
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from bench import build_workload, CHUNK
from nimble_tpu.align import engine as E

index, config, codes, lens = build_workload()
tables = E._device_tables(index)
p = E.AlignParams.from_config(config, index)
c_dev = jax.device_put(codes[:CHUNK])
l_dev = jax.device_put(lens[:CHUNK])
W = tables["class_bits"].shape[1]
nb2 = tables["mono_bucket"].shape[0]
print(f"mono buckets {nb2}, row width {tables['mono_bucket'].shape[1]} int32, W={W}", flush=True)


def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    return sum(
        jnp.sum(l.astype(jnp.int32)) if l.dtype == jnp.bool_ else jnp.sum(l.astype(jnp.int32))
        for l in leaves
    )


def v_window(t, c, l):
    """pack + revcomp + canonical + hash (the pre-probe vector stage)"""
    hi, lo, valid = E.kmer_hi_lo(c, l, p.k)
    c_hi, c_lo, fc, pal = E._canonical_keys(hi, lo, p.k)
    from nimble_tpu.index.hashing import bucket_hashes_jnp
    h1, _ = bucket_hashes_jnp(c_hi, c_lo, nb2)
    return E._bitcast_i32(c_hi), E._bitcast_i32(c_lo), h1.astype(jnp.int32), fc, pal, valid


def v_gather(t, c, l):
    """window + the single mono row gather (no slot select / intersection)"""
    hi, lo, valid = E.kmer_hi_lo(c, l, p.k)
    c_hi, c_lo, fc, pal = E._canonical_keys(hi, lo, p.k)
    from nimble_tpu.index.hashing import bucket_hashes_jnp
    h1, _ = bucket_hashes_jnp(c_hi, c_lo, nb2)
    row = t["mono_bucket"][h1.astype(jnp.int32)]
    return row


def v_probe(t, c, l):
    """window + full mono probe (gather + slot select + stash)"""
    hi, lo, valid = E.kmer_hi_lo(c, l, p.k)
    bits_f, bits_r = E.lookup_mono_bits(hi, lo, valid, t, p.k, W)
    return bits_f, bits_r


def v_mate(t, c, l):
    return E._score_mate(c, l, t, p)


def v_full(t, c, l):
    return E.align_step(t, p, c, l)


variants = [
    ("window", v_window),
    ("window+gather", v_gather),
    ("window+probe", v_probe),
    ("mate", v_mate),
    ("full", v_full),
]

jits = {}
for name, fn in variants:
    jf = jax.jit(lambda t, c, l, fn=fn: force(fn(t, c, l)))
    t0 = time.time()
    _ = int(jf(tables, c_dev, l_dev))
    print(f"{name:16s} compiled in {time.time()-t0:5.1f}s", flush=True)
    jits[name] = jf

N_ROUNDS = 8
BURST = 4
best = {name: float("inf") for name, _ in variants}
for r in range(N_ROUNDS):
    for name, _ in variants:
        jf = jits[name]
        t0 = time.time()
        acc = 0
        for _ in range(BURST):
            acc = acc + jf(tables, c_dev, l_dev)
        _ = int(acc)
        best[name] = min(best[name], (time.time() - t0) / BURST)

for name, _ in variants:
    dt = best[name]
    print(f"{name:16s} {dt*1e3:7.2f} ms/chunk  {CHUNK/dt/1e6:6.2f} M reads/s", flush=True)

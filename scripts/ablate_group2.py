"""Dissect group-path cost: raw row gathers, tail take_along_axis, selects."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
import bench as B
from nimble_tpu.align.engine import AlignEngine

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
index, config, codes, lens = B.build_workload()
CH = B.CHUNK
e = AlignEngine(index, config, chunk_size=CH, max_len=B.READ_LEN, group_probe=True)
gt = e.tables["group_bucket"]
em = AlignEngine(index, config, chunk_size=CH, max_len=B.READ_LEN, group_probe=False)
mt = em.tables["mono_bucket"]
print(f"group table {gt.shape} mono table {mt.shape} stash {e.tables['group_stash_hi'].shape}", file=sys.stderr)

rng = np.random.default_rng(0)
B_, P = CH, 79
hg = jax.device_put(rng.integers(0, gt.shape[0], size=(B_, 41)).astype(np.int32))
hm = jax.device_put(rng.integers(0, mt.shape[0], size=(B_, 80)).astype(np.int32))
arrs = [jax.device_put(rng.integers(0, 100, size=(B_, P)).astype(np.int32)) for _ in range(5)]
jidx = jax.device_put(rng.integers(0, P, size=B_).astype(np.int32))

@jax.jit
def g_group(h): return jnp.sum(gt[h], dtype=jnp.int32)
@jax.jit
def g_mono(h): return jnp.sum(mt[h], dtype=jnp.int32)
@jax.jit
def g_tail(j, *a):
    bi = jnp.arange(B_)
    return sum(jnp.sum(x[bi, j], dtype=jnp.int32) for x in a)

def t(f, *a):
    r = f(*a); jax.block_until_ready(r)
    best = 1e9
    for _ in range(12):
        t0 = time.time()
        acc = None
        for _ in range(4):
            s = f(*a); acc = s if acc is None else acc + s
        _ = int(acc)
        best = min(best, time.time() - t0)
    return best / 4 * 1000

print(f"group gather (8192x41 rows of {gt.shape[1]}w): {t(g_group, hg):.2f} ms")
print(f"mono  gather (8192x80 rows of {mt.shape[1]}w): {t(g_mono, hm):.2f} ms")
print(f"tail take_along_axis x5: {t(g_tail, jidx, *arrs):.2f} ms")

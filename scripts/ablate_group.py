"""Same-process A/B: mono vs group probe on the bench workload."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
import bench as B
from nimble_tpu.align.engine import AlignEngine

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

index, config, codes, lens = B.build_workload()
print("pairs:", index.pair_hi.shape[0] if index.has_pairs else 0, file=sys.stderr)
CH = B.CHUNK
c_dev = jax.device_put(codes[:CH]); l_dev = jax.device_put(lens[:CH])

engines = {}
for name, gp in (("mono", False), ("group", True)):
    t0 = time.time()
    e = AlignEngine(index, config, chunk_size=CH, max_len=B.READ_LEN, group_probe=gp)
    r = e._fn(e.tables, c_dev, l_dev); jax.block_until_ready(r)
    if gp: assert "group_bucket" in e.tables
    print(f"{name}: tables+compile {time.time()-t0:.1f}s "
          f"pass={np.asarray(jnp.reshape(r['pass_'],(-1,))).mean():.3f}", file=sys.stderr)
    engines[name] = e

best = {n: 1e9 for n in engines}
for rnd in range(16):
    for n, e in engines.items():
        t0 = time.time()
        acc = None
        for _ in range(4):
            s = e._fn(e.tables, c_dev, l_dev)["score"]
            acc = s if acc is None else acc + s
        _ = int(jnp.sum(acc))
        best[n] = min(best[n], time.time() - t0)
for n, dt in best.items():
    print(f"{n}: {dt*1000/4:.2f} ms/chunk = {4*CH/dt/1e6:.2f}M reads/s")

"""Chunk-size scaling: distinguishes per-execution overhead (relay RPC
round trips) from real device throughput."""
import sys, time
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
import bench as B
from nimble_tpu.align.engine import AlignEngine

index, config, codes, lens = B.build_workload()

for chunk in (2048, 8192, 32768):
    reps = max(1, 32768 // chunk)
    c = np.tile(codes, (max(1, chunk // codes.shape[0] + 1), 1))[:chunk]
    l = np.full(chunk, B.READ_LEN, dtype=np.int32)
    engine = AlignEngine(index, config, chunk_size=chunk, max_len=B.READ_LEN)
    c_dev = jax.device_put(c)
    l_dev = jax.device_put(l)
    t0 = time.time()
    _ = int(jnp.sum(engine._fn(engine.tables, c_dev, l_dev)["score"]))
    comp = time.time() - t0
    N = max(4, 262144 // chunk)
    t0 = time.time()
    acc = None
    for _ in range(N):
        s = engine._fn(engine.tables, c_dev, l_dev)["score"]
        acc = s if acc is None else acc + s
    _ = int(jnp.sum(acc))
    dt = (time.time() - t0) / N
    print(
        f"chunk {chunk:6d}: compile {comp:6.1f}s  {dt*1e3:8.2f} ms/call  "
        f"{chunk/dt/1e6:6.2f} M reads/s",
        flush=True,
    )

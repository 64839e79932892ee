"""Round-3 chunk-size scaling on the real chip: does 2^17/2^18 close the
relay-overhead gap to the ~4.9M reads/s pure-device rate (docs/PERF.md
round-2 finding 2)? Reuses bench.py's workload."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import bench


def main():
    cache_dir = str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from nimble_tpu.align.engine import AlignEngine

    index, config, codes, lens = bench.build_workload()
    sizes = [1 << 16, 1 << 17, 1 << 18]
    if len(sys.argv) > 1:
        sizes = [int(s) for s in sys.argv[1:]]
    for chunk in sizes:
        engine = AlignEngine(index, config, chunk_size=chunk, max_len=bench.READ_LEN)
        reps = -(-chunk // codes.shape[0])
        c = np.tile(codes, (reps, 1))[:chunk]
        l = np.tile(lens, reps)[:chunk]
        c_dev = jax.device_put(c)
        l_dev = jax.device_put(l)
        t0 = time.time()
        r = engine._fn(engine.tables, c_dev, l_dev)
        jax.block_until_ready(r)
        bench.log(f"chunk {chunk}: compile+first {time.time()-t0:.1f}s")
        burst = max(1, (1 << 18) // chunk)
        best = float("inf")
        for _ in range(12):
            t0 = time.time()
            acc = None
            for _ in range(burst):
                s = engine._fn(engine.tables, c_dev, l_dev)["score"]
                acc = s if acc is None else acc + s
            _ = int(jnp.sum(acc))
            best = min(best, time.time() - t0)
        rate = burst * chunk / best
        bench.log(
            f"chunk {chunk}: burst {burst}x in {best*1e3:.1f}ms -> {rate/1e6:.2f}M reads/s"
        )
        del engine


if __name__ == "__main__":
    main()

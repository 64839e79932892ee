"""Separate fixed per-call cost from true device time: trivial-call floor,
raw-gather slope vs row count, and a lax.scan multi-chunk fused dispatch."""
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
tables = engine.tables
nb = tables["group_bucket"].shape[0]
gt = tables["group_bucket"]

# 1. trivial-call floor
x = jax.device_put(np.arange(1024, dtype=np.int32))


@jax.jit
def trivial(v):
    return jnp.sum(v * 2)


print(f"trivial call: {timeit(trivial, x):.2f} ms", flush=True)

# 2. raw gather slope: rows 0.5x, 1x, 2x the engine's 14/read
for mult, Q in ((0.5, 7), (1.0, 14), (2.0, 28)):
    hq = jax.device_put(rng.integers(0, nb, size=(CH, Q)).astype(np.int32))

    @jax.jit
    def raw_gather(h):
        return jnp.sum(gt[h], dtype=jnp.int32)

    dt = timeit(raw_gather, hq)
    print(
        f"raw gather {CH}x{Q} rows: {dt:.2f} ms ({CH*Q/dt*1000/1e6:.0f}M rows/s incl fixed)",
        flush=True,
    )

# 3. fused multi-chunk dispatch via lax.scan: S chunks per call
reps_t = -(-CH // codes.shape[0])
c1 = np.tile(codes, (reps_t, 1))[:CH]
l1 = np.tile(lens, reps_t)[:CH]
for S in (2, 4, 8):
    cs = jax.device_put(np.broadcast_to(c1, (S,) + c1.shape).copy())
    ls = jax.device_put(np.broadcast_to(l1, (S,) + l1.shape).copy())

    @jax.jit
    def fused(cc, ll):
        def body(acc, xs):
            c, l = xs
            out = engine._fn(engine.tables, c, l)
            return acc + jnp.sum(out["score"]), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), (cc, ll))
        return acc

    t0 = time.time()
    r = fused(cs, ls)
    jax.block_until_ready(r)
    print(f"scan S={S}: compile {time.time()-t0:.1f}s", flush=True)
    dt = timeit(fused, cs, ls, burst=2)
    print(
        f"scan S={S}: {dt:.2f} ms/call = {S*CH/dt*1000/1e6:.2f} M reads/s",
        flush=True,
    )

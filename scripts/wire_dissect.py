"""Dissect the e2e wire: numpy-in vs device-in x scalar-out vs full-out on
the bench workload at the CLI operating point (packed span dispatch).

  D: device in, scalar out   -> pure exec (bench.py's number)
  A: numpy  in, scalar out   -> exec + H2D
  C: device in, full out     -> exec + D2H
  B: numpy  in, full out     -> exec + H2D + D2H (the CLI's per-span cost)

Overlap probe: two spans in flight with numpy in / full out — if the relay
overlaps H2D(n+1) with exec/D2H(n), B2 < 2*B.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from nimble_tpu.align.engine import AlignEngine
from nimble_tpu.io.packing import pack_batch

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def best(f, reps=10):
    f()  # warm
    b = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        b = min(b, time.perf_counter() - t0)
    return b


def main():
    index, config, codes, lens = B.build_workload()
    engine = AlignEngine(index, config, chunk_size=None, max_len=B.READ_LEN)
    span = engine.scan_chunks * engine.chunk_size
    reps = -(-span // codes.shape[0])
    codes = np.tile(codes, (reps, 1))[:span]
    lens = np.tile(lens, reps)[:span]
    pb = pack_batch({"r1_codes": codes, "r1_lens": lens}, B.READ_LEN)

    sparse, a1 = engine._mate_span_args(
        pb["r1_words"], pb["r1_lens"], pb["r1_nidx"], pb["r1_nrows"], 0, span, span
    )
    fn = engine._scan_fn_packed if sparse else engine._scan_fn_packed_dense
    w_np, l_np, f_np = a1
    if isinstance(f_np, tuple):
        args_np = (w_np, l_np, (f_np[0], f_np[1]))
        f_dev = (jax.device_put(f_np[0]), jax.device_put(f_np[1]))
        in_mb = (w_np.nbytes + l_np.nbytes + f_np[0].nbytes + f_np[1].nbytes) / 1e6
    else:
        args_np = (w_np, l_np, f_np)
        f_dev = jax.device_put(f_np)
        in_mb = (w_np.nbytes + l_np.nbytes + f_np.nbytes) / 1e6
    args_dev = (jax.device_put(w_np), jax.device_put(l_np), f_dev)

    out_rows = [0]

    def run(args, full):
        r = fn(engine.tables, *args)
        if full:
            h = np.asarray(r)
            out_rows[0] = h.size
            return h[0]
        return int(jnp.sum(r & 0xFFFF))

    tD = best(lambda: run(args_dev, False))
    tA = best(lambda: run(args_np, False))
    tC = best(lambda: run(args_dev, True))
    tB = best(lambda: run(args_np, True))

    out_mb = out_rows[0] * 4 / 1e6
    print(f"span={span}; in {in_mb:.1f} MB, out {out_mb:.1f} MB "
          f"({out_rows[0]//span} int32/read)")
    for name, t in (("D dev/scalar", tD), ("A np/scalar", tA),
                    ("C dev/full", tC), ("B np/full", tB)):
        print(f"  {name:13s}: {t*1000:7.1f} ms  {span/t/1e6:6.2f} M reads/s")
    if tA > tD:
        print(f"  H2D implied: {in_mb/(tA-tD):.0f} MB/s", end="")
    if tC > tD:
        print(f"; D2H implied: {out_mb/(tC-tD):.0f} MB/s")

    def two_inflight():
        r1 = fn(engine.tables, *args_np)
        r2 = fn(engine.tables, *args_np)
        return np.asarray(r1)[0] + np.asarray(r2)[0]

    t2 = best(two_inflight, reps=6)
    print(f"  B2 (2 inflight): {t2*1000:7.1f} ms  {2*span/t2/1e6:6.2f} M reads/s "
          f"(vs serial 2B {2*tB*1000:.1f} ms)")


if __name__ == "__main__":
    main()

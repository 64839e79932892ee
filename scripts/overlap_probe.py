"""Can the axon relay overlap H2D (TransferToDevice), Execute, and D2H
(TransferFromDevice) issued as SEPARATE RPCs from different threads?

block_until_ready does not reliably block on this relay, so every leg is
forced result-dependently: H2D legs end with a tiny device reduction whose
scalar is fetched; D2H legs fetch from device buffers that were
materialized (and never host-transferred) beforehand; exec legs fetch their
own scalar. Fresh buffers each round defeat caching.
"""
import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_IN = 16 << 20
N_OUT = 6 << 20
ROUNDS = 6

rng = np.random.default_rng(0)
base = rng.integers(-100, 100, size=N_IN, dtype=np.int8)
x_in = []
for r in range(ROUNDS + 2):
    c = base.copy()
    c[0] = r
    x_in.append(c)


@jax.jit
def tiny_sum(x):
    return jnp.sum(x[:: 65537].astype(jnp.int32))


@jax.jit
def heavy(x, r):
    a = jnp.reshape(x[: 1 << 20].astype(jnp.float32), (1024, 1024)) * 1e-3 + r
    for _ in range(96):
        a = jnp.tanh(a @ a * 1e-3)
    return jnp.sum(a)


@jax.jit
def make_out(x, r):
    return x[:N_OUT].astype(jnp.int32) + r


x_dev = jax.device_put(base)
# warm compiles
int(tiny_sum(x_dev))
float(heavy(x_dev, 0))
outs = [make_out(x_dev, r) for r in range(2 * (ROUNDS + 2))]
for o in outs:
    int(tiny_sum(o))  # force materialization on device without host copy

oi = [0]


def leg_h2d(r):
    y = jax.device_put(x_in[r])
    return int(tiny_sum(y))


def leg_d2h():
    o = outs[oi[0]]
    oi[0] += 1
    return int(np.asarray(o)[-1])


def leg_exec(r):
    return float(heavy(x_dev, r))


def timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


t_put = min(timed(lambda r=r: leg_h2d(r)) for r in range(2))
t_get = min(timed(leg_d2h) for _ in range(2))
t_exec = min(timed(lambda r=r: leg_exec(r)) for r in range(2))
print(f"H2D 16MB : {t_put*1000:7.1f} ms ({N_IN/1e6/t_put:.0f} MB/s)")
print(f"D2H 24MB : {t_get*1000:7.1f} ms ({N_OUT*4/1e6/t_get:.0f} MB/s)")
print(f"exec     : {t_exec*1000:7.1f} ms")

best = 1e9
for r in range(2, ROUNDS):
    th = [
        threading.Thread(target=leg_h2d, args=(r,)),
        threading.Thread(target=leg_d2h),
    ]
    t0 = time.perf_counter()
    for t in th:
        t.start()
    leg_exec(r)
    for t in th:
        t.join()
    best = min(best, time.perf_counter() - t0)
serial = t_put + t_get + t_exec
print(f"3-way    : {best*1000:7.1f} ms (serial sum {serial*1000:.1f}) -> "
      f"overlap {serial/best:.2f}x")

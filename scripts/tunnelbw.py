"""Measure the axon relay's host<->device transfer bandwidth.

The round-2 e2e CLI run was transfer-bound (docs/PERF.md); before designing
the packed-input wire format, measure what the tunnel actually delivers:
  - H2D: numpy arg into a jitted call (the fast path per round-1 finding 5)
  - D2H: np.asarray of a flat device array
at several payload sizes, plus whether two directions overlap.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, __import__("pathlib").Path(__file__).resolve().parents[1].as_posix())

dev = jax.devices()[0]
print("device:", dev)

# H2D: jit a trivial reduction so the arg must actually arrive; result is tiny
@jax.jit
def sink(x):
    return jnp.sum(x[:: 4097])  # touch scattered elements; returns scalar

@jax.jit
def make(n):
    pass

for mb in (1, 4, 16, 64):
    n = mb << 20
    x = np.random.randint(0, 127, size=n, dtype=np.int8)
    sink(x).block_until_ready()  # warm compile per shape
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        r = sink(x)
    float(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"H2D {mb:3d} MB: {dt*1e3:8.1f} ms  -> {mb/dt:7.1f} MB/s")

# D2H: flat int32 array generated on device, transferred back
for mb in (1, 4, 16, 64):
    n = (mb << 20) // 4
    gen = jax.jit(lambda: jnp.arange(n, dtype=jnp.int32), static_argnums=())
    a = gen()
    _ = np.asarray(a)  # warm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(a)
    dt = (time.perf_counter() - t0) / reps
    print(f"D2H {mb:3d} MB: {dt*1e3:8.1f} ms  -> {mb/dt:7.1f} MB/s")

# fixed per-transfer cost: tiny arrays
for nbytes in (4, 4096, 65536):
    a = jax.jit(lambda: jnp.zeros(nbytes // 4, dtype=jnp.int32))()
    _ = np.asarray(a)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(a)
    dt = (time.perf_counter() - t0) / reps
    print(f"D2H {nbytes:6d} B: {dt*1e3:8.1f} ms fixed")

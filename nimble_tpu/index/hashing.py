"""Shared hash spec for the two-choice bucketed k-mer table.

The same uint32 arithmetic is implemented twice — numpy (host build / oracle
lookup) and jnp (device lookup) — and tested for exact agreement, so the
device probe hits exactly the buckets the host builder filled.
"""
from __future__ import annotations

import numpy as np

# murmur3-style finalizer constants
_C1 = 0x85EBCA6B
_C2 = 0xC2B2AE35
_GOLDEN = 0x9E3779B1


def mix32_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Mix two uint32 streams into one well-distributed uint32."""
    if a.dtype != np.uint32:
        a = a.astype(np.uint32)
    if b.dtype != np.uint32:
        b = b.astype(np.uint32)
    x = a * np.uint32(_GOLDEN)
    x += b
    x ^= x >> np.uint32(16)
    x *= np.uint32(_C1)
    x ^= x >> np.uint32(13)
    x *= np.uint32(_C2)
    x ^= x >> np.uint32(16)
    return x


def bucket_hashes_np(hi: np.ndarray, lo: np.ndarray, n_buckets: int):
    """The two candidate bucket ids for each (hi, lo) key. n_buckets must be a
    power of two."""
    mask = np.uint32(n_buckets - 1)
    h1 = mix32_np(lo, hi) & mask
    h2 = mix32_np(hi ^ np.uint32(_C2), lo ^ np.uint32(_C1)) & mask
    return h1, h2


def mix32_jnp(a, b):
    import jax.numpy as jnp

    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    x = a * jnp.uint32(_GOLDEN) + b
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(_C1)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(_C2)
    x = x ^ (x >> jnp.uint32(16))
    return x


def bucket_hashes_jnp(hi, lo, n_buckets: int):
    import jax.numpy as jnp

    mask = jnp.uint32(n_buckets - 1)
    h1 = mix32_jnp(lo, hi) & mask
    h2 = mix32_jnp(hi ^ jnp.uint32(_C2), lo ^ jnp.uint32(_C1)) & mask
    return h1, h2

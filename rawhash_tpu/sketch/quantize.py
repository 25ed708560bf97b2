"""Adaptive quantization of normalized event values and the seed hash.

Numerics mirror the reference exactly:
  * dynamic_quantize   (reference: src/rsketch.c:18-53) — fine-grained buckets
    inside [fine_min, fine_max] mapped to a `fine_range` fraction of the code
    space, coarse buckets outside.
  * hash64 with a 32-bit mask (reference: src/rsketch.c:7-16).  Because every
    mixing step is masked to 32 bits, the hash depends only on the low 32 bits
    of the packed event word — so the whole seed pipeline runs in uint32.

Both numpy (host/oracle) and jax.numpy variants are provided; the jnp variants
are shape-polymorphic elementwise ops that fuse into the surrounding kernels.
"""

from __future__ import annotations

import numpy as np


def dynamic_quantize_np(
    signal: np.ndarray,
    fine_min: float,
    fine_max: float,
    fine_range: float,
    n_buckets: int,
) -> np.ndarray:
    """Vectorized dynamic quantization (numpy). Returns int32 codes; callers
    mask with (n_buckets - 1)."""
    sig = np.asarray(signal, dtype=np.float32)
    min_val, max_val = np.float32(-3.0), np.float32(3.0)
    rng = max_val - min_val
    coarse1 = np.float32((1.0 - fine_range) / 2.0)
    coarse2 = np.float32(fine_range) + coarse1
    normalized = (sig - min_val) / rng
    a = (np.float32(fine_min) - min_val) / rng
    b = (np.float32(fine_max) - min_val) / rng
    fine = np.float32(fine_range) * ((normalized - a) / (b - a))
    coarse = np.where(
        normalized < 0.5,
        np.float32(fine_range) + coarse1 * normalized,
        coarse2 + coarse1 * normalized,
    )
    quantized = np.where((sig >= fine_min) & (sig <= fine_max), fine, coarse)
    scaled = quantized * np.float32(n_buckets - 1)
    return np.trunc(scaled).astype(np.int64).astype(np.int32)


def hash32_np(key: np.ndarray) -> np.ndarray:
    """32-bit invertible mixing hash (reference: hash64 with mask=(1<<32)-1,
    src/rsketch.c:7-16).  Input/output uint32."""
    key = np.asarray(key, dtype=np.uint32)
    with np.errstate(over="ignore"):
        key = (~key + (key << np.uint32(21)))
        key = key ^ (key >> np.uint32(24))
        key = (key + (key << np.uint32(3))) + (key << np.uint32(8))
        key = key ^ (key >> np.uint32(14))
        key = (key + (key << np.uint32(2))) + (key << np.uint32(4))
        key = key ^ (key >> np.uint32(28))
        key = key + (key << np.uint32(31))
    return key


def dynamic_quantize_jnp(signal, fine_min, fine_max, fine_range, n_buckets):
    """JAX elementwise dynamic quantization; same numerics as the numpy
    version (float32 in, int32 codes out, caller masks)."""
    import jax.numpy as jnp

    sig = signal.astype(jnp.float32)
    min_val, max_val = jnp.float32(-3.0), jnp.float32(3.0)
    rng = max_val - min_val
    coarse1 = jnp.float32((1.0 - fine_range) / 2.0)
    coarse2 = jnp.float32(fine_range) + coarse1
    normalized = (sig - min_val) / rng
    a = (jnp.float32(fine_min) - min_val) / rng
    b = (jnp.float32(fine_max) - min_val) / rng
    fine = jnp.float32(fine_range) * ((normalized - a) / (b - a))
    coarse = jnp.where(
        normalized < 0.5,
        jnp.float32(fine_range) + coarse1 * normalized,
        coarse2 + coarse1 * normalized,
    )
    quantized = jnp.where((sig >= fine_min) & (sig <= fine_max), fine, coarse)
    scaled = quantized * jnp.float32(n_buckets - 1)
    return jnp.trunc(scaled).astype(jnp.int32)


def hash32_jnp(key):
    """JAX uint32 mixing hash, bit-identical to hash32_np."""
    import jax.numpy as jnp

    key = key.astype(jnp.uint32)
    key = (~key + (key << jnp.uint32(21)))
    key = key ^ (key >> jnp.uint32(24))
    key = (key + (key << jnp.uint32(3))) + (key << jnp.uint32(8))
    key = key ^ (key >> jnp.uint32(14))
    key = (key + (key << jnp.uint32(2))) + (key << jnp.uint32(4))
    key = key ^ (key >> jnp.uint32(28))
    key = key + (key << jnp.uint32(31))
    return key

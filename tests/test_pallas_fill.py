"""Pallas chain-fill kernel must be bit-identical to the lax.scan oracle.

Runs the Pallas kernel in interpret mode on CPU (tests force the CPU
backend); the real-TPU path is exercised by bench.py and the engine when a
TPU backend is present (reference recurrence: mg_lchain_dp, lchain.c:385).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rawhash_tpu.chain.device import chain_fill_batch
from rawhash_tpu.chain.pallas_fill import chain_fill_pallas


@pytest.mark.parametrize("seed,b,n,max_iter", [(3, 8, 300, 64), (7, 4, 513, 200)])
def test_pallas_fill_matches_scan(seed, b, n, max_iter):
    rng = np.random.default_rng(seed)
    key = np.sort(rng.integers(0, 2, (b, n)).astype(np.uint32) << 31, axis=1)
    tpos = np.sort(rng.integers(0, 5000, (b, n)), axis=1).astype(np.int32)
    qpos = rng.integers(0, 700, (b, n)).astype(np.int32)
    n_anchors = rng.integers(n // 4, n + 1, b).astype(np.int32)
    args = dict(
        q_span=13, max_dist_t=2500, max_dist_q=2500, bw=500, max_iter=max_iter,
        chn_pen_gap=0.1352, chn_pen_skip=0.0,
    )
    f0, p0 = chain_fill_batch(
        jnp.asarray(key), jnp.asarray(tpos), jnp.asarray(qpos),
        jnp.asarray(n_anchors), **args,
    )
    interp = jax.default_backend() != "tpu"
    f1, p1 = chain_fill_pallas(
        jnp.asarray(key), jnp.asarray(tpos), jnp.asarray(qpos),
        jnp.asarray(n_anchors), **args, interpret=interp,
    )
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))

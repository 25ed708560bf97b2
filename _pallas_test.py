import os
import numpy as np, jax, jax.numpy as jnp
from rawhash_tpu.chain.device import chain_fill_batch
from rawhash_tpu.chain.pallas_fill import chain_fill_pallas

rng = np.random.default_rng(3)
B, N = 8, 300
key = rng.integers(0, 2, (B, N)).astype(np.uint32) << 31
order = np.argsort(key + rng.integers(0, 1000, (B, N)).astype(np.uint32), axis=1)
tpos = np.sort(rng.integers(0, 5000, (B, N)), axis=1).astype(np.int32)
key = np.sort(key, axis=1)
qpos = rng.integers(0, 700, (B, N)).astype(np.int32)
n_anchors = rng.integers(50, N+1, B).astype(np.int32)
args = dict(q_span=13, max_dist_t=2500, max_dist_q=2500, bw=500, max_iter=64,
            chn_pen_gap=0.1352, chn_pen_skip=0.0)
f0, p0 = chain_fill_batch(jnp.asarray(key), jnp.asarray(tpos), jnp.asarray(qpos),
                          jnp.asarray(n_anchors), **args)
interp = jax.default_backend() == "cpu"
f1, p1 = chain_fill_pallas(jnp.asarray(key), jnp.asarray(tpos), jnp.asarray(qpos),
                           jnp.asarray(n_anchors), **args, interpret=interp)
f0, p0, f1, p1 = map(np.asarray, (f0, p0, f1, p1))
print("f equal:", np.array_equal(f0, f1), "p equal:", np.array_equal(p0, p1))
if not np.array_equal(f0, f1):
    d = np.argwhere(f0 != f1)[:5]
    for b, i in d:
        print(b, i, f0[b,i], f1[b,i], p0[b,i], p1[b,i])

"""Probe: per-stage cold-compile times of the chunk_step pipeline on TPU.

Compiles each device stage in isolation (fresh shapes so the persistent
cache can't hit unless primed) and prints wall time per stage.  Run with
RAWHASH_TPU_CACHE=/tmp/empty_cache_$RANDOM to force cold compiles.
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args, **statics):
    t0 = time.perf_counter()
    jf = jax.jit(lambda *a: fn(*a, **statics))
    out = jf(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} {time.perf_counter() - t0:8.1f}s", file=sys.stderr)
    return out


def main():
    B, L, E, A, P = 256, 4000, 768, 2048, 1026
    from rawhash_tpu.signal.events import NormCarry, detect_events_batch
    from rawhash_tpu.sketch.device import sketch_batch
    from rawhash_tpu.chain.device import chain_fill_batch
    from rawhash_tpu.chain.pallas_fill import chain_fill_pallas

    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.normal(90, 10, (B, L)).astype(np.float32))
    slen = jnp.full((B,), L, jnp.int32)
    carry = NormCarry.zeros(B)

    ev = timed(
        "detect_events_batch", detect_events_batch, sig, slen, carry,
        window_length1=3, window_length2=9, threshold1=4.0, threshold2=3.5,
        peak_height=0.4, e_cap=E,
    )
    events, n_ev = ev[0], ev[1]

    timed(
        "sketch_batch", sketch_batch, events, n_ev,
        diff=0.35, w=0, e=6, q=4, k=6,
        fine_min=-2.0, fine_max=2.0, fine_range=0.4,
    )

    N = A + P
    key = jnp.asarray(rng.integers(0, 2**31, (B, N), dtype=np.int64).astype(np.uint32))
    tpos = jnp.asarray(rng.integers(0, 30000, (B, N), dtype=np.int64).astype(np.int32))
    qpos = jnp.asarray(rng.integers(0, 3000, (B, N), dtype=np.int64).astype(np.int32))
    n_anchors = jnp.full((B,), N, jnp.int32)

    timed(
        "lax.sort4",
        lambda k, t, q: jax.lax.sort((k, t, q), dimension=1, num_keys=2, is_stable=True),
        key, tpos, qpos,
    )

    timed(
        "chain_fill_pallas", chain_fill_pallas, key, tpos, qpos, n_anchors,
        q_span=11, max_dist_t=500, max_dist_q=500, bw=100, max_iter=200,
        chn_pen_gap=0.132, chn_pen_skip=0.033,
    )

    timed(
        "chain_fill_scan", chain_fill_batch, key, tpos, qpos, n_anchors,
        q_span=11, max_dist_t=500, max_dist_q=500, bw=100, max_iter=200,
        chn_pen_gap=0.132, chn_pen_skip=0.033,
    )


if __name__ == "__main__":
    main()

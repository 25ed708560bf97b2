"""Probe: which sub-stage of detect_events_batch dominates TPU compile time.

Run with RAWHASH_TPU_CACHE=/tmp/fresh_$RANDOM for cold numbers.
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from rawhash_tpu.signal import events as EV


def timed(name, fn, *args):
    t0 = time.perf_counter()
    jf = jax.jit(fn)
    out = jf(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {time.perf_counter() - t0:8.1f}s", file=sys.stderr)
    return out


def main():
    B, L, E = 256, 4000, 768
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.normal(0, 1, (B, L)).astype(np.float32))
    n_sig = jnp.full((B,), L, jnp.int32)

    timed("dense_compact", lambda s: EV.dense_compact(s, s > 0), sig)

    prefix = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), jnp.cumsum(sig, axis=1)], axis=1)
    prefix_sq = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), jnp.cumsum(sig * sig, axis=1)], axis=1)
    timed("tstat_w3+w9",
          lambda p, q, n: (EV._tstat(p, q, n, 3), EV._tstat(p, q, n, 9)),
          prefix, prefix_sq, n_sig)

    ts = jnp.abs(sig)
    peaks = timed(
        "gen_peaks(scan)",
        lambda a, b2, n: EV._gen_peaks(a, b2, n, 4.0, 3.5, 3, 9, 0.4),
        ts, ts, n_sig)
    ok = (peaks > 0) & (peaks < n_sig[:, None])
    n_peaks = jnp.sum(ok, axis=1).astype(jnp.int32)

    timed("segment_events",
          lambda s, n, em, okk, np_: EV._segment_events(s, n, em, okk, np_, E),
          sig, n_sig, peaks, ok, n_peaks)

    timed("sort2_4000",
          lambda a: jax.lax.sort((jnp.astype(a, jnp.int32), a), dimension=1,
                                 num_keys=2),
          sig)


if __name__ == "__main__":
    main()

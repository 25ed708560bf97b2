"""On-chip A/B of the chain-backtrack formulations at large anchor widths.

Compares, on identical fill outputs:
  - lockstep ``lax.while_loop`` (chain/backtrack_device.py)
  - width-unbounded Pallas kernel (chain/backtrack_pallas_big.py)
and checks bit-identical outputs on the live prefix.

Usage: python tools/profiling/backtrack_ab.py [N_total] [B] [reps]

Timing discipline: jax.block_until_ready returns at enqueue on this
backend; every sample ends with a small D2H fetch (the honest barrier),
so subtract the reported round-trip estimate when comparing kernels.
"""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

from rawhash_tpu.utils.xla_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from rawhash_tpu.chain.backtrack_device import backtrack_batch
from rawhash_tpu.chain.backtrack_pallas_big import backtrack_pallas_big
from rawhash_tpu.chain.device import chain_fill_batch

SPAN = 13


def synth_anchors(rng, b, n_cap, frac_live=1.0):
    """Diagonal runs + noise, the test fixture's shape at scale."""
    keys = np.zeros((b, n_cap), np.uint32)
    tposs = np.full((b, n_cap), 0x7FFFFFFF, np.int32)
    qposs = np.zeros((b, n_cap), np.int32)
    n_live = np.full(b, int(n_cap * frac_live), np.int32)
    for i in range(b):
        m = 0
        ks, ts, qs = [], [], []
        nl = int(n_live[i])
        while m < nl:
            run = min(int(rng.integers(3, 40)), nl - m)
            k0 = rng.integers(0, 3, dtype=np.uint32) | (
                np.uint32(rng.integers(0, 2)) << np.uint32(31)
            )
            t0 = int(rng.integers(0, 2_000_000))
            q0 = int(rng.integers(0, 6000))
            step = rng.integers(5, 40, size=run)
            jit = rng.integers(-3, 4, size=run)
            ks.extend([k0] * run)
            ts.extend((t0 + np.cumsum(step)).tolist())
            qs.extend(np.clip(q0 + np.cumsum(step + jit), 0, None).tolist())
            m += run
        ks = np.asarray(ks, np.uint32)
        ts = np.asarray(ts, np.int32)
        qs = np.asarray(qs, np.int32)
        order = np.lexsort((ts, ks))
        keys[i, :nl], tposs[i, :nl], qposs[i, :nl] = (
            ks[order], ts[order], qs[order],
        )
    return keys, tposs, qposs, n_live


def main():
    n_cap = int(sys.argv[1]) if len(sys.argv) > 1 else 147456
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    rng = np.random.default_rng(3)
    keys, tposs, qposs, n_live = synth_anchors(rng, b, n_cap)

    t0 = time.perf_counter()
    f, p = chain_fill_batch(
        jnp.asarray(keys), jnp.asarray(tposs), jnp.asarray(qposs),
        jnp.asarray(n_live),
        q_span=SPAN, max_dist_t=2500, max_dist_q=2500, bw=500, max_iter=64,
        chn_pen_gap=0.104, chn_pen_skip=0.0,
    )
    f = f.astype(jnp.int32)
    np.asarray(f[:2, :2])
    print(f"fill: {time.perf_counter()-t0:.1f}s (compile+run)")

    kw = dict(min_cnt=2, min_sc=20, max_drop=500, k_cap=512)
    na = jnp.asarray(n_live)

    variants = {
        "lockstep": lambda: backtrack_batch(f, p, na, **kw),
        "pallas_big": lambda: backtrack_pallas_big(f, p, na, **kw),
    }
    outs = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        out = fn()
        scal = np.asarray(out[2])  # honest barrier
        print(f"{name}: first call {time.perf_counter()-t0:.1f}s "
              f"(compile+load+run), n_u[:4]={scal[:4]}")
        outs[name] = [np.asarray(o) for o in out]

    # bit-exactness on the live prefixes
    a, c = outs["lockstep"], outs["pallas_big"]
    assert np.array_equal(a[2], c[2]), "n_u mismatch"
    assert np.array_equal(a[4], c[4]), "n_v mismatch"
    assert np.array_equal(a[5], c[5]), "ovf mismatch"
    for i in range(b):
        nu, nv = int(a[2][i]), int(a[4][i])
        assert np.array_equal(a[0][i, :nu], c[0][i, :nu]), f"u_sc row {i}"
        assert np.array_equal(a[1][i, :nu], c[1][i, :nu]), f"u_cnt row {i}"
        assert np.array_equal(a[3][i, :nv], c[3][i, :nv]), f"v row {i}"
    print("outputs bit-identical on live prefixes")

    # interleaved A/B, best-of-reps (tunnel weather discipline)
    for name, fn in variants.items():
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out[2][:8])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: best-of-{reps} {best:.3f}s")


if __name__ == "__main__":
    main()

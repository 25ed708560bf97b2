"""Isolate the chain-fill kernel's per-iteration overhead.

The fill runs ~21 us/anchor-step at W=64 regardless of lane width —
far above the ~0.7 us the op count predicts.  This probe times a
stripped kernel: a fori_loop over N iterations whose body does K VPU ops
on a [W, B] VMEM tile plus the same ring-style dynamic read/write mix,
for K in {small, fill-like}.  If us/iter is flat in K, loop/carry
overhead dominates and batching anchors per iteration is the fix; if it
scales with K, the ops themselves are slow (relayouts).

Usage: python tools/profiling/fill_loop_overhead.py [iters]
"""
import sys
import time

sys.path.insert(0, ".")

from rawhash_tpu.utils.xla_cache import enable_compile_cache

enable_compile_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W, B = 64, 256


def make(n_iter: int, k_ops: int, carry_rows: int):
    def kern(x_ref, o_ref, ring, mii):
        def body(i, carry):
            acc = carry
            r = ring[:, :]
            for _ in range(k_ops):
                r = jnp.maximum(r + 1, acc)
            acc = jnp.max(r, axis=0, keepdims=True)
            slot = i % W
            ring[:, :] = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (W, B), 0) == slot,
                acc, r,
            )
            return acc

        init = mii[pl.ds(0, 1), :]
        out = jax.lax.fori_loop(0, n_iter, body, init)
        mii[pl.ds(0, 1), :] = out
        o_ref[:, :] = ring[:, :]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((W, B), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((W, B), jnp.int32),
                pltpu.VMEM((carry_rows, B), jnp.int32),
            ],
        )(x)

    return run


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    x = jnp.zeros((W, B), jnp.int32)
    for k_ops in (2, 20, 60):
        run = make(n_iter, k_ops, 8)
        np.asarray(run(x))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(x))
            best = min(best, time.perf_counter() - t0)
        print(f"k_ops={k_ops}: {best*1e6/n_iter:.2f} us/iter "
              f"({best:.3f}s total)")


if __name__ == "__main__":
    main()

"""Bisect _segment_events' 80s TPU compile: compile cumulative prefixes."""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from rawhash_tpu.signal.events import BIG_I32


def timed(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {time.perf_counter() - t0:8.1f}s", file=sys.stderr)


def main():
    B, L, E = 256, 4000, 768
    e_cap = E
    rng = np.random.default_rng(0)
    norm = jnp.asarray(rng.normal(0, 1, (B, L)).astype(np.float32))
    n_sig = jnp.full((B,), L, jnp.int32)
    emitted = jnp.asarray(
        rng.integers(-1, L, (B, 2 * L), dtype=np.int64).astype(np.int32))
    emit_ok = emitted > 0
    n_peaks = jnp.sum(emit_ok, axis=1).astype(jnp.int32)

    def stage(upto):
        def f(norm, n_sig, emitted, emit_ok, n_peaks):
            b, l = norm.shape
            n_ev = jnp.minimum(n_peaks, e_cap)
            pos = jax.lax.broadcasted_iota(jnp.int32, (b, l), 1)
            erows = jax.lax.broadcasted_iota(jnp.int32, emitted.shape, 0)
            ind = (
                jnp.zeros((b, l + 1), jnp.int32)
                .at[erows, jnp.where(emit_ok, jnp.minimum(emitted, l), l)]
                .add(1, mode="drop")[:, :l]
            )
            seg = jnp.cumsum(ind, axis=1)
            invalid = (seg >= n_ev[:, None]) | (pos >= n_sig[:, None])
            seg = jnp.where(invalid, e_cap, seg)
            if upto == 1:
                return seg
            seg_s, val_s = jax.lax.sort((seg, norm), dimension=1, num_keys=2)
            if upto == 2:
                return seg_s, val_s
            pk_sorted = jax.lax.sort(
                jnp.where(emit_ok, emitted, BIG_I32), dimension=1
            )[:, :e_cap]
            if upto == 3:
                return seg_s, val_s, pk_sorted
            qs = jnp.arange(e_cap, dtype=jnp.int32)
            s_q = jnp.concatenate(
                [jnp.zeros((b, 1), jnp.int32), pk_sorted[:, : e_cap - 1]], axis=1)
            e_q = pk_sorted
            lens = jnp.where(
                qs[None, :] < n_ev[:, None],
                jnp.maximum(jnp.minimum(e_q, n_sig[:, None])
                            - jnp.minimum(s_q, n_sig[:, None]), 0), 0)
            bound = jnp.cumsum(lens, axis=1)
            starts = jnp.concatenate(
                [jnp.zeros((b, 1), jnp.int32), bound[:, :-1]], axis=1)
            q1_idx = jnp.clip(starts + lens // 4, 0, l - 1)
            q3_idx = jnp.clip(starts + (3 * lens) // 4, 0, l - 1)
            q1 = jnp.take_along_axis(val_s, q1_idx, axis=1)
            q3 = jnp.take_along_axis(val_s, q3_idx, axis=1)
            if upto == 4:
                return q1, q3
            iqr = q3 - q1
            lohi = jnp.pad(
                jnp.stack([q1 - iqr, q3 + iqr], axis=2),
                ((0, 0), (0, 1), (0, 0)), constant_values=0.0)
            seg_sc = jnp.clip(seg_s, 0, e_cap)
            bnd = jnp.take_along_axis(lohi, seg_sc[:, :, None], axis=1)
            keep_s = (seg_s < e_cap) & (val_s >= bnd[:, :, 0]) & (val_s <= bnd[:, :, 1])
            if upto == 5:
                return keep_s
            psum = jnp.concatenate(
                [jnp.zeros((b, 1), jnp.float32),
                 jnp.cumsum(jnp.where(keep_s, val_s, 0.0), axis=1)], axis=1)
            pcnt = jnp.concatenate(
                [jnp.zeros((b, 1), jnp.int32),
                 jnp.cumsum(keep_s.astype(jnp.int32), axis=1)], axis=1)
            ends = starts + lens
            sums = jnp.take_along_axis(psum, ends, axis=1) - jnp.take_along_axis(
                psum, starts, axis=1)
            counts = jnp.take_along_axis(pcnt, ends, axis=1) - jnp.take_along_axis(
                pcnt, starts, axis=1)
            events = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), 0.0)
            ev_mask = qs[None, :] < n_ev[:, None]
            return jnp.where(ev_mask, events, 0.0), n_ev
        return f

    for upto in [1, 2, 3, 4, 5, 6]:
        timed(f"upto={upto}", stage(upto), norm, n_sig, emitted, emit_ok, n_peaks)


if __name__ == "__main__":
    main()

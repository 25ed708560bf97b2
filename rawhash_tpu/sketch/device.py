"""Device sketching: events -> 32-bit seed hashes, batched.

Mirrors the host/path semantics (sketch/host.py, itself mirroring reference
src/rsketch.c): the sequential event-diff filter runs as a tiny lax.scan over
the event axis with a [B]-wide carry (last kept value); quantization, the
e-event rolling pack (a static shift-or loop), the hash, and the minimizer
window masks are all elementwise/windowed tensor ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..signal.events import dense_compact
from .quantize import dynamic_quantize_jnp, hash32_jnp


def _diff_filter(events, n_ev, diff: float):
    """Keep events differing from the last *kept* event by >= diff
    (reference: rsketch.c:95,187). Returns keep mask [B, E]."""
    b, e = events.shape
    pos_valid = jnp.arange(e)[None, :] < n_ev[:, None]

    def step(last, xs):
        v, valid, first = xs
        keep = valid & (first | (jnp.abs(v - last) >= diff))
        new_last = jnp.where(keep, v, last)
        return new_last, keep

    firsts = jnp.zeros(e, dtype=bool).at[0].set(True)
    _, keep = jax.lax.scan(
        step,
        jnp.zeros(b, jnp.float32),
        (
            jnp.swapaxes(events, 0, 1),
            jnp.swapaxes(pos_valid, 0, 1),
            firsts,
        ),
    )
    return jnp.swapaxes(keep, 0, 1)


@functools.partial(
    jax.jit, static_argnames=("diff", "w", "e", "q", "k", "fine_min", "fine_max",
                              "fine_range"),
)
def sketch_batch(
    events: jnp.ndarray,  # f32 [B, E]
    n_ev: jnp.ndarray,  # i32 [B]
    *,
    diff: float,
    w: int,
    e: int,
    q: int,
    k: int,
    fine_min: float,
    fine_max: float,
    fine_range: float,
):
    """Returns (hashes u32 [B,E], qpos i32 [B,E] within-chunk event position
    of the window's first event, valid [B,E]).  Seed t covers kept events
    t-e+1..t; at most n_kept-e+1 seeds are valid per row."""
    b, cap = events.shape
    keep = _diff_filter(events, n_ev, diff)
    vals, n_kept = dense_compact(events, keep)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, cap), 1)
    kept_pos, _ = dense_compact(pos, keep)

    codes = (
        dynamic_quantize_jnp(vals, fine_min, fine_max, fine_range, 1 << q)
        .astype(jnp.uint32)
        & jnp.uint32((1 << q) - 1)
    )
    # rolling pack: seed at kept-index t packs codes[t-e+1..t], oldest highest
    packed = jnp.zeros((b, cap), jnp.uint32)
    for j in range(e):
        # code of kept event t-(e-1-j), shifted into bits q*(e-1-j)..
        shift = jnp.uint32(q * j)
        rolled = jnp.pad(codes, ((0, 0), (j, 0)))[:, :cap]
        packed = packed | (rolled << shift)
    if q * e < 32:
        packed = packed & jnp.uint32((1 << (q * e)) - 1)
    hashes = hash32_jnp(packed)

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (b, cap), 1)
    valid = (t_idx >= e - 1) & (t_idx < n_kept[:, None])
    qpos = jnp.take_along_axis(
        kept_pos, jnp.clip(t_idx - (e - 1), 0, cap - 1), axis=1
    )

    if w:
        hm = jnp.where(valid, hashes, jnp.uint32(0xFFFFFFFF))
        # window minima over w consecutive seeds; a window starting at t-index
        # s is valid iff it lies fully inside the seed stream
        wmin = hm
        for d in range(1, w):
            wmin = jnp.minimum(wmin, jnp.pad(hm, ((0, 0), (0, d)),
                                             constant_values=np.uint32(0xFFFFFFFF))[:, d:])
        winv = (t_idx >= e - 1) & (t_idx + (w - 1) < n_kept[:, None])
        # seed t emitted iff it equals the min of some valid window holding it
        emit = jnp.zeros_like(valid)
        for d in range(w):
            shifted = jnp.pad(wmin, ((0, 0), (d, 0)),
                              constant_values=np.uint32(0xFFFFFFFF))[:, :cap]
            shifted_ok = jnp.pad(winv, ((0, 0), (d, 0)))[:, :cap]
            emit = emit | ((hm == shifted) & shifted_ok)
        valid = valid & emit
    return hashes, qpos, valid

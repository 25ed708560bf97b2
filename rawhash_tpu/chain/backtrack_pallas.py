"""Chain backtracking as a Pallas TPU kernel: VMEM-resident scalar walks.

The XLA ``lax.while_loop`` formulation (chain/backtrack_device.py) advances
every read's walk in lockstep, paying per-iteration HBM scatter/gather on
[B, N] state — ~0.4 s per viral chunk on one chip.  Here the whole greedy
backtrack (reference: mg_chain_backtrack, lchain.c:95-194) runs per read
inside one kernel program with the mark array, predecessor pointers and
candidate order resident in VMEM, so each walk step is a couple of
dynamic-lane loads/stores instead of HBM round trips.

Grid = (batch,), one read per program; the candidate sort (f, idx) happens
in XLA (lax.sort) before the kernel.  Claimed-vs-visit marks share one
array: t[i] == CLAIMED (-2) means claimed by a finished chain, t[i] == k
means visited by candidate k's bk_end walk (the reference's mark-2-then-
reset, valid because candidate indices strictly decrease), anything else
means untouched.

Outputs are bit-identical to backtrack_device.backtrack_batch (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT32_MIN = -(2**31)
CLAIMED = -2


def _kernel(
    zf_ref, zi_ref, f_ref, p_ref,
    usc_ref, ucnt_ref, v_ref, nu_ref, nv_ref, ovf_ref,
    t_ref,
    *, n: int, k_cap: int, min_cnt: int, min_sc: int, max_drop: int,
):
    # all walk state lives in SMEM: untiled, native scalar random access
    def init(ref, val, m):
        def body(j, _):
            ref[0, 0, j] = val
            return 0
        jax.lax.fori_loop(0, m, body, 0)

    init(t_ref, jnp.int32(-3), n)  # t_ref is 3D SMEM scratch too
    init(usc_ref, jnp.int32(0), k_cap)
    init(ucnt_ref, jnp.int32(0), k_cap)

    def ld(ref, i):
        return ref[0, 0, i]

    def stv(ref, i, val):
        ref[0, 0, i] = val

    def walk_a(carry):
        # one bk_end step (lchain.c:57-70)
        i, max_i, max_s, k, zsc, go = carry
        stv(t_ref, i, k)
        ni = ld(p_ref, i)
        s = jnp.where(ni < 0, zsc, zsc - ld(f_ref, jnp.maximum(ni, 0)))
        better = s > max_s
        brk = ~better & (max_s - s > max_drop)
        max_s = jnp.where(better, s, max_s)
        max_i = jnp.where(better, ni, max_i)
        tni = ld(t_ref, jnp.maximum(ni, 0))
        cont = ~brk & (ni >= 0) & (tni != CLAIMED) & (tni != k)
        return jnp.where(cont, ni, i), max_i, max_s, k, zsc, cont

    def claim(carry):
        i, end_i, n_v, go = carry
        stv(v_ref, n_v, i)
        stv(t_ref, i, CLAIMED)
        ni = ld(p_ref, jnp.maximum(i, 0))
        return ni, end_i, n_v + 1, ni != end_i

    def outer(carry):
        k, n_v, n_u, ovf, go = carry
        idx = ld(zi_ref, k)
        zsc = ld(zf_ref, k)
        unclaimed = ld(t_ref, idx) != CLAIMED

        def run_chain(args):
            n_v, n_u, ovf = args
            # bk_end walk (mg_chain_bk_end, lchain.c:47-75)
            i0, max_i, max_s, _, _, _ = jax.lax.while_loop(
                lambda c: c[5],
                walk_a,
                (idx, idx, jnp.int32(0), k, zsc, jnp.bool_(True)),
            )
            end_i = max_i
            # claim walk (lchain.c:139-146)
            fin_i, _, n_v2, _ = jax.lax.while_loop(
                lambda c: c[3],
                claim,
                (idx, end_i, n_v, idx != end_i),
            )
            fin_i = jnp.where(idx != end_i, fin_i, idx)
            sc = jnp.where(
                fin_i < 0, zsc, zsc - ld(f_ref, jnp.maximum(fin_i, 0))
            )
            cnt = n_v2 - n_v
            accept = (sc >= min_sc) & (cnt > 0) & (cnt >= min_cnt)
            fits = n_u < k_cap

            def record(args):
                n_u, ovf = args
                stv(usc_ref, n_u, sc)
                stv(ucnt_ref, n_u, cnt)
                return n_u + 1, ovf

            n_u2, ovf2 = jax.lax.cond(
                accept & fits, record,
                lambda a: (a[0], a[1] + jnp.where(accept, 1, 0)),
                (n_u, ovf),
            )
            n_v3 = jnp.where(accept & fits, n_v2, n_v)
            return n_v3, n_u2, ovf2

        n_v, n_u, ovf = jax.lax.cond(
            unclaimed, run_chain, lambda a: a, (n_v, n_u, ovf)
        )
        k2 = k - 1
        nxt = ld(zf_ref, jnp.maximum(k2, 0))
        return k2, n_v, n_u, ovf, (k2 >= 0) & (nxt >= min_sc)

    first = zf_ref[0, 0, n - 1]
    _, n_v, n_u, ovf, _ = jax.lax.while_loop(
        lambda c: c[4],
        outer,
        (jnp.int32(n - 1), jnp.int32(0), jnp.int32(0), jnp.int32(0),
         first >= min_sc),
    )
    nu_ref[0, 0, 0] = n_u
    nv_ref[0, 0, 0] = n_v
    ovf_ref[0, 0, 0] = ovf


@functools.partial(
    jax.jit,
    static_argnames=(
        "min_cnt", "min_sc", "max_drop", "k_cap", "interpret",
    ),
)
def backtrack_pallas(
    f: jnp.ndarray,  # i32 [B, N]
    p: jnp.ndarray,  # i32 [B, N]
    n_anchors: jnp.ndarray,  # i32 [B]
    *,
    min_cnt: int,
    min_sc: int,
    max_drop: int,
    k_cap: int,
    interpret: bool = False,
):
    """Same contract as backtrack_device.backtrack_batch."""
    b, n = f.shape
    slots = jnp.arange(n, dtype=jnp.int32)
    f_m = jnp.where(
        slots[None, :] < n_anchors[:, None], f, jnp.int32(INT32_MIN)
    )
    z_f, z_idx = jax.lax.sort(
        (f_m, jnp.broadcast_to(slots[None, :], (b, n))),
        dimension=1, num_keys=1, is_stable=True,
    )

    # every ref rides SMEM: the walks are scalar pointer chases, and SMEM
    # is the TPU memory with native unaligned scalar access (VMEM dynamic
    # lane offsets must be 128-aligned)
    # 3D (B, 1, X) arrays with (1, 1, X) blocks: the lowering requires the
    # last two block dims to divide (8, 128) OR equal the array dims — the
    # (1, X) block equals the (1, X) tail of the 3D array
    row3 = lambda i, *_: (i, 0, 0)
    kernel = functools.partial(
        _kernel, n=n, k_cap=k_cap,
        min_cnt=min_cnt, min_sc=min_sc, max_drop=max_drop,
    )
    smem = lambda m: pl.BlockSpec((1, 1, m), row3, memory_space=pltpu.SMEM)
    r3 = lambda a: a.reshape(b, 1, a.shape[1])
    u_sc, u_cnt, v, n_u, n_v, ovf = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[smem(n), smem(n), smem(n), smem(n)],
        out_specs=[
            smem(k_cap), smem(k_cap), smem(n), smem(1), smem(1), smem(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, k_cap), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, k_cap), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1, 1, n), jnp.int32)],
        interpret=interpret,
    )(r3(z_f), r3(z_idx), r3(f), r3(p))
    return (
        u_sc[:, 0], u_cnt[:, 0], n_u[:, 0, 0],
        v[:, 0], n_v[:, 0, 0], ovf[:, 0, 0],
    )

"""Width-unbounded chain backtracking: Pallas kernel for N > 32768 anchors.

The SMEM kernel (backtrack_pallas.py) holds all six per-read [N] arrays in
SMEM *blocks*, which pallas double-buffers — ~21·N·4 B of the 1 MB SMEM
budget, capping it at N <= 32768.  The lockstep ``lax.while_loop``
formulation (backtrack_device.py) that takes over past that width costs
12-17 s/chunk at 147k anchors: ~40 tiny [B]-wide gather/scatter ops per
iteration, one iteration per walk step of the SLOWEST read.

This kernel re-partitions the state by access pattern instead (reference
semantics: mg_chain_backtrack, lchain.c:95-194):

- ``f`` (chain scores) — random-access, read-only: VMEM ``[N/128, 128]``,
  bulk-DMA'd from HBM once per read; each scalar read is a dynamic
  sublane-line load + lane mask-sum (~150 ns measured on v5e).
- ``p`` (predecessors) — random-access, read-only: SMEM ``(1, N)`` when it
  fits (N <= 196608 with the other residents), else VMEM like ``f``.
- claimed marks — random-access, read-write: a 1-bit/anchor SMEM bitmask
  (N/32 words).  The lockstep kernel's second mark plane (per-candidate
  visit stamps) is PROVABLY dead: predecessors strictly decrease
  (``p[i] < i``, the DP looks back), so a walk can never revisit a node it
  stamped, and the stamp test ``t2[ni] != k`` is always true.
- ``zf/zi`` (score-sorted candidates) — sequential descending: streamed
  through a 2048-word SMEM block buffer (two DMAs per 2048 candidates).
- ``v``/``u_sc``/``u_cnt`` (outputs) — append-only: 128-word SMEM line
  buffers flushed to HBM by DMA.  Append-only holds because chain
  acceptance is decided BEFORE the claim walk: walk A's running maximum
  IS the chain score the claim walk would recompute (``sc = zsc -
  f[end_i] = max_s``) and the claimed count is the step index of the last
  maximum, so the lockstep's reject-rollback of ``n_v`` never happens
  here — rejected chains walk (their claim marks persist, as in the
  reference) but write nothing.

Bit-identical to backtrack_device.backtrack_batch (tested against the
same host oracle).  VMEM bounds the width at ~1.5M anchors — beyond every
capacity the engine can configure (max_anchor_cap = 2^17 per side).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT32_MIN = -(2**31)
LANES = 128
P_SMEM_MAX = 196608  # p resident in SMEM up to here (1 MB budget)


def _kernel(
    zf_hbm, zi_hbm, f_hbm, p_hbm, d_hbm, t_hbm, q_hbm,  # inputs (ANY)
    scal_ref,  # out [1, 1, 4] SMEM block: n_u, n_v, ovf
    v_hbm, usc_hbm, ucnt_hbm, uml_hbm, ubl_hbm, ulo_hbm, uhi_hbm,  # (ANY)
    f_vmem, p_res, d_sm, t_vmem, q_vmem,
    zbuf_f, zbuf_i, vbuf, ubuf_sc, ubuf_cnt,
    ubuf_ml, ubuf_bl, ubuf_lo, ubuf_hi, tbits,
    sem_a, sem_b,
    *, n: int, k_cap: int, min_cnt: int, min_sc: int, max_drop: int,
    zbl: int, p_in_smem: bool, use_delta: bool,
    emit_stats: bool, q_span: int,
):
    b = pl.program_id(0)
    nl = n // LANES
    nw = n // 32
    zb = zbl * LANES  # candidates per stream block

    cp_f = pltpu.make_async_copy(f_hbm.at[b], f_vmem, sem_a)
    cp_f.start()
    cp_p = pltpu.make_async_copy(p_hbm.at[b], p_res, sem_b)
    cp_p.start()

    # clear the claimed bitmask while the bulk loads fly
    def clr(w, _):
        tbits[0, w] = 0
        return 0

    jax.lax.fori_loop(0, nw, clr, 0)
    cp_f.wait()
    cp_p.wait()
    if use_delta:
        cp_d = pltpu.make_async_copy(d_hbm.at[b], d_sm, sem_a)
        cp_d.start()
        cp_d.wait()
    if emit_stats:
        cp_t = pltpu.make_async_copy(t_hbm.at[b], t_vmem, sem_a)
        cp_t.start()
        cp_q = pltpu.make_async_copy(q_hbm.at[b], q_vmem, sem_b)
        cp_q.start()
        cp_t.wait()
        cp_q.wait()

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def vget(ref, i):
        row = ref[pl.ds(i // LANES, 1), :]
        return jnp.sum(jnp.where(lane_iota == (i % LANES), row, 0))

    def f_get(i):
        return vget(f_vmem, i)

    if p_in_smem:
        def p_get(i):
            return p_res[0, i]
    else:
        def p_get(i):
            return vget(p_res, i)

    def t_get(i):
        return (tbits[0, i >> 5] >> (i & 31)) & 1

    def t_set(i):
        tbits[0, i >> 5] = tbits[0, i >> 5] | (jnp.int32(1) << (i & 31))

    def d_get(i):
        # two i16 edge deltas per SMEM word, sign-extended; -32768 is the
        # "overflowed, fetch exact f from VMEM" sentinel
        w = d_sm[0, i >> 1]
        half = (w >> (16 * (i & 1))) & 0xFFFF
        return (half ^ 0x8000) - 0x8000

    def refill(blk_cur, k):
        blk_need = k // zb

        def do(_):
            c1 = pltpu.make_async_copy(
                zf_hbm.at[b, pl.ds(blk_need * zbl, zbl)], zbuf_f, sem_a
            )
            c1.start()
            c2 = pltpu.make_async_copy(
                zi_hbm.at[b, pl.ds(blk_need * zbl, zbl)], zbuf_i, sem_b
            )
            c2.start()
            c1.wait()
            c2.wait()
            return blk_need

        return jax.lax.cond(blk_need != blk_cur, do, lambda _: blk_cur, 0)

    def zread(buf, k):
        r = (k % zb) // LANES
        return buf[r, k % LANES]

    def flush_v(pos):
        # line `pos >> 7` is complete in vbuf; DMA it out
        c = pltpu.make_async_copy(vbuf, v_hbm.at[b, pl.ds(pos // LANES, 1)], sem_a)
        c.start()
        c.wait()

    def flush_u(pos):
        line = pl.ds(pos // LANES, 1)
        c1 = pltpu.make_async_copy(ubuf_sc, usc_hbm.at[b, line], sem_a)
        c1.start()
        c2 = pltpu.make_async_copy(ubuf_cnt, ucnt_hbm.at[b, line], sem_b)
        c2.start()
        c1.wait()
        c2.wait()
        if emit_stats:
            c3 = pltpu.make_async_copy(ubuf_ml, uml_hbm.at[b, line], sem_a)
            c3.start()
            c4 = pltpu.make_async_copy(ubuf_bl, ubl_hbm.at[b, line], sem_b)
            c4.start()
            c3.wait()
            c4.wait()
            c5 = pltpu.make_async_copy(ubuf_lo, ulo_hbm.at[b, line], sem_a)
            c5.start()
            c6 = pltpu.make_async_copy(ubuf_hi, uhi_hbm.at[b, line], sem_b)
            c6.start()
            c5.wait()
            c6.wait()

    def do_chain(idx, zsc, n_v, n_u, ovf):
        # --- walk A (mg_chain_bk_end, lchain.c:47-75): find the score peak.
        # f along the walk path is reconstructed from the i16 edge deltas
        # (f[ni] = f[i] - d[i], carried as f_i; exact integer chain since
        # every non-sentinel delta is exact), so the hot loop is pure SMEM;
        # the -32768 sentinel falls back to the exact VMEM f.
        def wa_body(carry):
            i, f_i, max_i, max_s, cbest, c, _ = carry
            ni = p_get(i)
            nic = jnp.maximum(ni, 0)
            if use_delta:
                dv = d_get(i)
                f_ni = jax.lax.cond(
                    dv == -32768,
                    lambda _: f_get(nic),
                    lambda _: f_i - dv,
                    0,
                )
            else:
                f_ni = f_get(nic)
            s = jnp.where(ni < 0, zsc, zsc - f_ni)
            better = s > max_s
            brk = ~better & (max_s - s > max_drop)
            max_s = jnp.where(better, s, max_s)
            max_i = jnp.where(better, ni, max_i)
            cbest = jnp.where(better, c + 1, cbest)
            cont = ~brk & (ni >= 0) & (t_get(nic) == 0)
            return (jnp.where(cont, ni, i), jnp.where(cont, f_ni, f_i),
                    max_i, max_s, cbest, c + 1, cont)

        _, _, end_i, max_s, cnt, _, _ = jax.lax.while_loop(
            lambda c: c[6],
            wa_body,
            (idx, zsc, idx, jnp.int32(0), jnp.int32(0), jnp.int32(0),
             jnp.bool_(True)),
        )
        # acceptance before the claim walk: sc == max_s, claimed count ==
        # cbest (the step index of the last improvement), see module doc
        accept = (max_s >= min_sc) & (cnt > 0) & (cnt >= min_cnt)
        fits = n_u < k_cap
        write_v = accept & fits

        # --- claim walk (lchain.c:139-146): marks ALWAYS persist (the
        # reference keeps t[i]=1 even for rejected chains); v only commits
        # for accepted ones.  In emit_stats mode the walk also accumulates
        # the chain's fuzzy lengths (mm_cal_fuzzy_len, hit.c:10-40): the
        # consecutive-ascending anchor pairs are exactly (p[i], i) for
        # every claimed i whose predecessor is also claimed, so tl/ql come
        # from the VMEM tpos/qpos planes without any [B, N] host-side
        # gathers.  lo (the ascending-first anchor) is the last claimed.
        if emit_stats:
            tp0 = jnp.where(
                write_v | accept, vget(t_vmem, idx), jnp.int32(0)
            )
            qp0 = jnp.where(
                write_v | accept, vget(q_vmem, idx), jnp.int32(0)
            )
        else:
            tp0 = qp0 = jnp.int32(0)

        def cl_body(carry):
            i, m, tp_i, qp_i, ml, bl, lo = carry
            t_set(i)

            def put(_):
                pos = n_v + m
                vbuf[0, pos % LANES] = i
                jax.lax.cond(
                    pos % LANES == LANES - 1,
                    lambda __: (flush_v(pos), 0)[1],
                    lambda __: 0,
                    0,
                )
                return 0

            jax.lax.cond(write_v, put, lambda _: 0, 0)
            i2 = p_get(i)
            if emit_stats:
                pair = accept & (i2 != end_i)
                i2c = jnp.maximum(i2, 0)
                tp_n = jnp.where(pair, vget(t_vmem, i2c), 0)
                qp_n = jnp.where(pair, vget(q_vmem, i2c), 0)
                tl = tp_i - tp_n
                ql = qp_i - qp_n
                mn = jnp.minimum(tl, ql)
                mx = jnp.maximum(tl, ql)
                contrib = jnp.where((tl > q_span) & (ql > q_span), q_span, mn) + mn
                ml = jnp.where(pair, ml + contrib, ml)
                bl = jnp.where(pair, bl + mx, bl)
                tp_i = jnp.where(pair, tp_n, tp_i)
                qp_i = jnp.where(pair, qp_n, qp_i)
            return i2, m + 1, tp_i, qp_i, ml, bl, i

        def cl_cond(carry):
            return carry[0] != end_i

        _, _, _, _, ml_f, bl_f, lo_f = jax.lax.while_loop(
            cl_cond, cl_body,
            (idx, jnp.int32(0), tp0, qp0, jnp.int32(q_span),
             jnp.int32(q_span), idx),
        )
        n_v2 = jnp.where(write_v, n_v + cnt, n_v)

        def rec(_):
            ku = n_u % LANES
            ubuf_sc[0, ku] = max_s
            ubuf_cnt[0, ku] = cnt
            if emit_stats:
                ubuf_ml[0, ku] = ml_f
                ubuf_bl[0, ku] = bl_f
                ubuf_lo[0, ku] = lo_f
                ubuf_hi[0, ku] = idx
            jax.lax.cond(
                ku == LANES - 1,
                lambda __: (flush_u(n_u), 0)[1],
                lambda __: 0,
                0,
            )
            return 0

        jax.lax.cond(accept & fits, rec, lambda _: 0, 0)
        n_u2 = jnp.where(accept & fits, n_u + 1, n_u)
        ovf2 = jnp.where(accept & ~fits, ovf + 1, ovf)
        return n_v2, n_u2, ovf2

    # --- outer candidate loop (lchain.c:127-158), descending score order.
    # At 100k+ widths most candidates are already claimed by an earlier
    # chain; burning one loop iteration per skip dominates the scan, so
    # probe a short run of candidates per iteration and jump past the
    # leading skips (identical to the sequential scan: a "skip" is exactly
    # a candidate the sequential loop would have passed without touching
    # any state, and the probe stops at the first non-skip)
    def body(carry):
        k, blk, n_v, n_u, ovf, _ = carry
        blk = refill(blk, k)
        zf_k = zread(zbuf_f, k)
        zi_k = zread(zbuf_i, k)
        stop = zf_k < min_sc
        skip = ~stop & (t_get(zi_k) != 0)
        blk_lo = blk * zb
        lead = skip.astype(jnp.int32)
        still = skip
        for d in range(1, 4):
            kd = k - d
            ok_d = kd >= blk_lo  # stay inside the streamed block
            kc = jnp.maximum(kd, blk_lo)
            zf_d = zread(zbuf_f, kc)
            zi_d = zread(zbuf_i, kc)
            still = still & ok_d & (zf_d >= min_sc) & (t_get(zi_d) != 0)
            lead = lead + still.astype(jnp.int32)
        run = ~stop & (lead == 0)
        n_v, n_u, ovf = jax.lax.cond(
            run,
            lambda a: do_chain(zi_k, zf_k, *a),
            lambda a: a,
            (n_v, n_u, ovf),
        )
        k2 = k - jnp.maximum(lead, 1)
        return k2, blk, n_v, n_u, ovf, ~stop & (k2 >= 0)

    _, _, n_v, n_u, ovf, _ = jax.lax.while_loop(
        lambda c: c[5],
        body,
        (jnp.int32(n - 1), jnp.int32(-1), jnp.int32(0), jnp.int32(0),
         jnp.int32(0), jnp.bool_(n >= 1)),
    )

    # final partial-line flushes (full-width DMAs; the tail beyond n_v/n_u
    # is garbage the callers mask, exactly like the lockstep's padding)
    jax.lax.cond(
        n_v % LANES != 0, lambda _: (flush_v(n_v), 0)[1], lambda _: 0, 0
    )
    jax.lax.cond(
        n_u % LANES != 0, lambda _: (flush_u(n_u), 0)[1], lambda _: 0, 0
    )
    scal_ref[0, 0, 0] = n_u
    scal_ref[0, 0, 1] = n_v
    scal_ref[0, 0, 2] = ovf
    scal_ref[0, 0, 3] = 0


@functools.partial(
    jax.jit,
    static_argnames=("min_cnt", "min_sc", "max_drop", "k_cap", "interpret",
                     "q_span"),
)
def backtrack_pallas_big(
    f: jnp.ndarray,  # i32 [B, N]
    p: jnp.ndarray,  # i32 [B, N]
    n_anchors: jnp.ndarray,  # i32 [B]
    tpos: jnp.ndarray | None = None,  # i32 [B, N]: enables chain-stat mode
    qpos: jnp.ndarray | None = None,
    *,
    min_cnt: int,
    min_sc: int,
    max_drop: int,
    k_cap: int,
    q_span: int = 0,
    interpret: bool = False,
):
    """Same contract as backtrack_device.backtrack_batch; when tpos/qpos
    are given, additionally returns per-chain (mlen, blen, lo_idx, hi_idx)
    accumulated during the claim walks (mm_cal_fuzzy_len, hit.c:10-40) —
    the compaction stage then needs no [B, N]-sized host-side gathers."""
    b, n = f.shape
    if n % LANES:
        raise ValueError(f"anchor width {n} must be a multiple of {LANES}")
    nl = n // LANES
    slots = jnp.arange(n, dtype=jnp.int32)
    f_m = jnp.where(
        slots[None, :] < n_anchors[:, None], f, jnp.int32(INT32_MIN)
    )
    z_f, z_idx = jax.lax.sort(
        (f_m, jnp.broadcast_to(slots[None, :], (b, n))),
        dimension=1, num_keys=1, is_stable=True,
    )

    kp = max(k_cap, LANES)
    if kp % LANES:
        kp = (kp // LANES + 1) * LANES
    kl = kp // LANES
    zbl = min(16, nl)
    # SMEM residency plan against the 1.00 MB budget (measured): p wants
    # 4n, the packed edge deltas 2n, the claimed bitmask n/8, stream/line
    # buffers ~40 KB.  Deltas win more than p (they remove the VMEM f read
    # from every walk step), so they get SMEM first.
    use_delta = n % 256 == 0 and 2.125 * n + 40_000 <= 1_000_000
    p_in_smem = (6.125 if use_delta else 4.125) * n + 40_000 <= 1_000_000

    # i16 edge deltas, two per i32 word: d[i] = f[i] - f[p[i]] (the DP
    # transition score of the chosen edge).  -32768 marks "not exactly
    # representable" (or p < 0); the kernel then reads the exact f from
    # VMEM for that step only, so results stay bit-exact at any score
    # magnitude.
    if use_delta:
        p_c = jnp.clip(p, 0, n - 1)
        fp = jnp.take_along_axis(f, p_c, axis=1)
        d32 = f - fp
        d16 = jnp.clip(d32, -32767, 32767).astype(jnp.int16)
        ok = (p >= 0) & (d32 == d16.astype(jnp.int32))
        d16 = jnp.where(ok, d16, jnp.int16(-32768))
        dpk = jax.lax.bitcast_convert_type(
            d16.reshape(b, n // 2, 2), jnp.int32
        ).reshape(b, n // 256, LANES)
    else:
        dpk = jnp.zeros((b, 1, LANES), jnp.int32)

    emit_stats = tpos is not None
    r3 = lambda a: a.reshape(b, nl, LANES)
    kernel = functools.partial(
        _kernel, n=n, k_cap=k_cap, min_cnt=min_cnt, min_sc=min_sc,
        max_drop=max_drop, zbl=zbl, p_in_smem=p_in_smem,
        use_delta=use_delta, emit_stats=emit_stats, q_span=q_span,
    )
    p_scratch = (
        pltpu.SMEM((1, n), jnp.int32)
        if p_in_smem
        else pltpu.VMEM((nl, LANES), jnp.int32)
    )
    # the bulk DMA needs src and dst shapes to match: p rides [B, 1, N]
    # when SMEM-resident, [B, N/128, 128] when in VMEM
    p_in = p.reshape(b, 1, n) if p_in_smem else r3(p)
    dummy = jnp.zeros((b, 1, LANES), jnp.int32)
    t_in = r3(tpos) if emit_stats else dummy
    q_in = r3(qpos) if emit_stats else dummy
    tq_scratch = pltpu.VMEM((nl if emit_stats else 1, LANES), jnp.int32)
    kstat = kl if emit_stats else 1
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7,
        out_specs=[
            # 3D with a (1, 1, 4) block: the lowering requires the last
            # two block dims to divide (8, 128) OR equal the array dims
            pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * 7,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, 4), jnp.int32),
            jax.ShapeDtypeStruct((b, nl, LANES), jnp.int32),
            jax.ShapeDtypeStruct((b, kl, LANES), jnp.int32),
            jax.ShapeDtypeStruct((b, kl, LANES), jnp.int32),
            jax.ShapeDtypeStruct((b, kstat, LANES), jnp.int32),
            jax.ShapeDtypeStruct((b, kstat, LANES), jnp.int32),
            jax.ShapeDtypeStruct((b, kstat, LANES), jnp.int32),
            jax.ShapeDtypeStruct((b, kstat, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nl, LANES), jnp.int32),  # f
            p_scratch,  # p
            pltpu.SMEM((1, n // 2 if use_delta else 1), jnp.int32),  # deltas
            tq_scratch,  # tpos
            tq_scratch,  # qpos
            pltpu.SMEM((zbl, LANES), jnp.int32),  # zf stream
            pltpu.SMEM((zbl, LANES), jnp.int32),  # zi stream
            pltpu.SMEM((1, LANES), jnp.int32),  # v line buffer
            pltpu.SMEM((1, LANES), jnp.int32),  # u_sc line buffer
            pltpu.SMEM((1, LANES), jnp.int32),  # u_cnt line buffer
            pltpu.SMEM((1, LANES), jnp.int32),  # u_mlen line buffer
            pltpu.SMEM((1, LANES), jnp.int32),  # u_blen line buffer
            pltpu.SMEM((1, LANES), jnp.int32),  # u_lo line buffer
            pltpu.SMEM((1, LANES), jnp.int32),  # u_hi line buffer
            pltpu.SMEM((1, n // 32), jnp.int32),  # claimed bitmask
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(r3(z_f), r3(z_idx), r3(f), p_in,
      dpk.reshape(b, 1, -1) if use_delta else dpk, t_in, q_in)
    scal, v, usc, ucnt, uml, ubl, ulo, uhi = outs
    n_u = scal[:, 0, 0]
    n_v = scal[:, 0, 1]
    ovf = scal[:, 0, 2]
    # mask the streamed outputs' undefined tails to the lockstep contract
    # (zeros beyond the live prefix) so downstream consumers see identical
    # buffers
    ks = jnp.arange(kp, dtype=jnp.int32)
    live_k = ks[None, :] < n_u[:, None]
    u_sc = jnp.where(live_k, usc.reshape(b, kp), 0)
    u_cnt = jnp.where(live_k, ucnt.reshape(b, kp), 0)
    v = jnp.where(slots[None, :] < n_v[:, None], v.reshape(b, n), 0)
    base = (u_sc[:, :k_cap], u_cnt[:, :k_cap], n_u, v, n_v, ovf)
    if not emit_stats:
        return base
    u_ml = jnp.where(live_k, uml.reshape(b, kp), 0)[:, :k_cap]
    u_bl = jnp.where(live_k, ubl.reshape(b, kp), 0)[:, :k_cap]
    u_lo = jnp.where(live_k, ulo.reshape(b, kp), 0)[:, :k_cap]
    u_hi = jnp.where(live_k, uhi.reshape(b, kp), 0)[:, :k_cap]
    return base + (u_ml, u_bl, u_lo, u_hi)


def compact_from_chain_stats(
    u_sc, u_cnt, u_ml, u_bl, u_lo, u_hi, n_u, v, n_v,
    s_key, s_tpos, s_qpos,
    *,
    q_span: int,
    p_out: int,
):
    """compact_batch's outputs from the kernel's per-chain stats: all work
    is O(B x K) or O(B x p_out) — the [B, N] gathers that made
    compact_batch cost ~4.8 s at N=147456/B=256 (one 0.585 s gather each)
    are gone because the claim walks already aggregated coordinates and
    fuzzy lengths (mm_cal_fuzzy_len, hit.c:10-40; mm_gen_regs coordinate
    rules, hit.c:100-150).

    Returns (asc_prefix i32 [B, p_out], order, summaries) with identical
    semantics to compact_batch's (asc[:, :p_out], order, summaries)."""
    b, n = v.shape
    k_cap = u_sc.shape[1]
    rows = jnp.arange(b, dtype=jnp.int32)
    cids = jnp.arange(k_cap, dtype=jnp.int32)
    chain_valid = cids[None, :] < n_u[:, None]
    cnts = jnp.where(chain_valid, u_cnt, 0)
    ends = jnp.cumsum(cnts, axis=1)
    starts = ends - cnts

    lo = jnp.clip(u_lo, 0, n - 1)
    hi = jnp.clip(u_hi, 0, n - 1)
    key0 = jnp.take_along_axis(s_key, lo, axis=1)
    tpos0 = jnp.take_along_axis(s_tpos, lo, axis=1)
    qpos0 = jnp.take_along_axis(s_qpos, lo, axis=1)
    tposL = jnp.take_along_axis(s_tpos, hi, axis=1)
    qposL = jnp.take_along_axis(s_qpos, hi, axis=1)
    live = chain_valid & (cnts > 0)
    mlen = jnp.where(live, u_ml, 0)
    blen = jnp.where(live, u_bl, 0)

    sk1 = jnp.where(live, key0, jnp.uint32(0xFFFFFFFF))
    sk2 = jnp.where(live, tpos0, jnp.int32(0x7FFFFFFF))
    (_, _, order) = jax.lax.sort(
        (sk1, sk2, jnp.broadcast_to(cids[None, :], (b, k_cap))),
        dimension=1, num_keys=2, is_stable=True,
    )

    def pick(arr):
        return jnp.take_along_axis(arr, order, axis=1)

    summaries = jnp.stack(
        [
            pick(jnp.where(chain_valid, u_sc, 0)),
            pick(cnts),
            pick(jax.lax.bitcast_convert_type(key0, jnp.int32)),
            pick(tpos0), pick(qpos0), pick(tposL), pick(qposL),
            pick(mlen), pick(blen),
            pick(live.astype(jnp.int32)),
        ],
        axis=2,
    )

    # carried-anchor prefix: same mirrored segment gather as compact_batch
    # but built only on the first p_out slots (cid via scatter + cummax;
    # starts/ends are non-decreasing so cummax forward-fills exactly)
    po = min(p_out, n)
    pslots = jnp.arange(po, dtype=jnp.int32)
    tgt = jnp.where(live & (starts < po), starts, po)
    def ffill(vals):
        m = (
            jnp.zeros((b, po + 1), jnp.int32)
            .at[rows[:, None], tgt]
            .max(jnp.broadcast_to(vals, (b, k_cap)))[:, :po]
        )
        return jax.lax.cummax(m, axis=1)
    st_m = ffill(starts.astype(jnp.int32))
    en_m = ffill(ends.astype(jnp.int32))
    g = jnp.clip(st_m + en_m - 1 - pslots[None, :], 0, n - 1)
    asc = jnp.take_along_axis(v, g, axis=1)
    valid_slot = pslots[None, :] < jnp.minimum(n_v, po)[:, None]
    asc = jnp.where(valid_slot, asc, 0)
    if po < p_out:
        asc = jnp.pad(asc, ((0, 0), (0, p_out - po)))
    return asc, order, summaries

"""Randomized parity sweep quantifying the device fill's max_skip deviation.

The device/Pallas chain fill (chain/device.py, chain/pallas_fill.py) drops
the reference's max_skip/t[]-claiming pruning (lchain.c:447-470): the
reference stops scanning predecessors after max_skip non-improving visits of
already-claimed anchors (a speed heuristic that can MISS the best
predecessor), while the device fill always evaluates the full max_iter
window.  Scores therefore satisfy f_device >= f_host per anchor; chains can
differ where the pruning made the reference miss.

This sweep measures how often that matters, end-to-end: for N randomized
anchor sets (clustered around diagonals like real seed hits, plus uniform
noise), both fills are backtracked + compacted identically and the resulting
primary chains are compared on (target-location, score, count).

Usage: python tools/profiling/max_skip_sweep.py [--cases 1000] [--seed 3]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def synth_anchors(rng, n_max=384):
    """Anchor set shaped like real seeding output: 1-3 diagonal clusters
    (true chains) + repeat-induced vertical smear + uniform noise, sorted
    lexicographically by (key, tpos) like the device sort."""
    parts = []
    n_chains = rng.integers(1, 4)
    for _ in range(n_chains):
        m = int(rng.integers(8, 60))
        t0 = int(rng.integers(0, 200_000))
        q0 = int(rng.integers(0, 300))
        step = rng.integers(4, 12)
        ts = t0 + np.cumsum(rng.integers(1, step, m))
        qs = q0 + np.cumsum(rng.integers(1, step, m))
        jitter = rng.integers(-2, 3, m)
        parts.append(np.stack([ts + jitter, qs], axis=1))
    # repeat smear: same qpos hitting many targets (stresses skip pruning:
    # dense same-key candidates at equal scores)
    if rng.random() < 0.7:
        m = int(rng.integers(10, 80))
        q = int(rng.integers(0, 400))
        ts = rng.integers(0, 200_000, m)
        parts.append(np.stack([ts, np.full(m, q) + rng.integers(0, 6, m)], axis=1))
    noise = int(rng.integers(5, 40))
    parts.append(
        np.stack(
            [rng.integers(0, 200_000, noise), rng.integers(0, 500, noise)],
            axis=1,
        )
    )
    a = np.concatenate(parts)[:n_max]
    key = np.zeros(a.shape[0], dtype=np.uint64)  # one target, fwd strand
    order = np.lexsort((a[:, 1], a[:, 0]))
    a = a[order]
    return key, a[:, 0].astype(np.int64), a[:, 1].astype(np.int64)


def run_sweep(cases: int, seed: int = 3, max_skip: int = 5,
              max_iter: int = 64) -> dict:
    """Core sweep, importable by tests (tests/test_chain_maxskip.py)."""
    import jax.numpy as jnp

    from rawhash_tpu.chain.device import chain_fill_batch
    from rawhash_tpu.chain.host import (
        chain_backtrack,
        compact_chains,
        lchain_dp_fill_np,
    )

    span, bw, max_dist = 6, 500, 2000
    pen_gap = 0.12 * span
    pen_skip = 0.0
    rng = np.random.default_rng(seed)

    n_diff_loc = n_diff_score = n_cases_chain = 0
    score_deltas = []
    f_deltas = []
    for _case in range(cases):
        key, tpos, qpos = synth_anchors(rng)
        n = key.shape[0]
        ax = (key << np.uint64(32)) | tpos.astype(np.uint64)
        ay = (np.uint64(span) << np.uint64(32)) | qpos.astype(np.uint64)

        f_h, p_h = lchain_dp_fill_np(
            ax, ay, max_dist, max_dist, bw, max_skip, max_iter,
            pen_gap, pen_skip,
        )
        f_d, p_d = chain_fill_batch(
            jnp.asarray(key[None].astype(np.uint32)),
            jnp.asarray(tpos[None].astype(np.int32)),
            jnp.asarray(qpos[None].astype(np.int32)),
            jnp.asarray([n], dtype=jnp.int32),
            q_span=span, max_dist_t=max_dist, max_dist_q=max_dist,
            bw=bw, max_iter=max_iter,
            chn_pen_gap=pen_gap, chn_pen_skip=pen_skip,
        )
        f_d = np.asarray(f_d)[0][:n]
        p_d = np.asarray(p_d)[0][:n]
        f_deltas.append(int((f_d - f_h).max()))
        assert (f_d >= f_h).all(), "device fill must never score below host"

        def chains(f, p):
            u, v = chain_backtrack(
                f.astype(np.int32), p.astype(np.int64), min_cnt=3,
                min_sc=20, max_drop=bw,
            )
            u_s, bx, by, _, _ = compact_chains(u, v, ax, ay)
            out = []
            off = 0
            for sc, cnt in np.asarray(u_s).reshape(-1, 2):
                sc, cnt = int(sc), int(cnt)
                seg_t = int(bx[off + cnt - 1] & np.uint64(0xFFFFFFFF))
                out.append((sc, cnt, seg_t))
                off += cnt
            return out

        ch_h = chains(f_h, p_h)
        ch_d = chains(f_d, p_d)
        if not ch_h and not ch_d:
            continue
        n_cases_chain += 1
        best_h = max(ch_h, key=lambda c: c[0]) if ch_h else (0, 0, -1)
        best_d = max(ch_d, key=lambda c: c[0]) if ch_d else (0, 0, -1)
        loc_h, loc_d = best_h[2], best_d[2]
        if abs(loc_h - loc_d) > 100:
            n_diff_loc += 1
        sc_h, sc_d = best_h[0], best_d[0]
        if sc_h != sc_d:
            n_diff_score += 1
            score_deltas.append(sc_d - sc_h)

    return {
        "cases": cases,
        "cases_with_chains": n_cases_chain,
        "primary_location_diff": n_diff_loc,
        "primary_score_diff": n_diff_score,
        "max_fill_score_delta": max(f_deltas) if f_deltas else 0,
        "mean_fill_score_delta_when_nonzero": (
            round(float(np.mean([d for d in f_deltas if d > 0])), 2)
            if any(d > 0 for d in f_deltas) else 0.0
        ),
        "score_delta_stats": {
            "max": max(score_deltas) if score_deltas else 0,
            "mean": round(float(np.mean(score_deltas)), 2) if score_deltas else 0.0,
        },
        "max_skip": max_skip,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--max-skip", type=int, default=5)
    ap.add_argument("--max-iter", type=int, default=64)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    out = run_sweep(args.cases, args.seed, args.max_skip, args.max_iter)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

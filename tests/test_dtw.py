import numpy as np
import pytest

from rawhash_tpu.dtw.host import dtw_banded_np, dtw_global_np


def dtw_reference_full(a, b):
    """Textbook full-matrix DTW (oracle for both implementations)."""
    n, m = len(a), len(b)
    dp = np.full((n, m), np.inf, dtype=np.float64)
    dp[0, 0] = abs(a[0] - b[0])
    for i in range(1, n):
        dp[i, 0] = dp[i - 1, 0] + abs(a[i] - b[0])
    for j in range(1, m):
        dp[0, j] = dp[0, j - 1] + abs(a[0] - b[j])
    for i in range(1, n):
        for j in range(1, m):
            dp[i, j] = min(dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1]) + abs(
                a[i] - b[j]
            )
    return dp[n - 1, m - 1]


@pytest.mark.parametrize("n,m", [(20, 20), (30, 17), (5, 40)])
def test_dtw_global_matches_full_matrix(n, m):
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, n).astype(np.float32)
    b = rng.normal(0, 1, m).astype(np.float32)
    got = dtw_global_np(a, b)
    want = dtw_reference_full(a, b)
    assert abs(got - want) < 1e-3


def test_dtw_banded_wide_band_equals_global():
    rng = np.random.default_rng(1)
    a = rng.normal(0, 1, 40).astype(np.float32)
    b = rng.normal(0, 1, 35).astype(np.float32)
    got = dtw_banded_np(a, b, band_radius=40)
    want = dtw_global_np(a, b)
    assert abs(got - want) < 1e-3


def test_dtw_identical_sequences_zero_cost():
    a = np.sin(np.arange(50) * 0.3).astype(np.float32)
    assert dtw_global_np(a, a) < 1e-6
    assert dtw_banded_np(a, a, 5) < 1e-6


def test_dtw_exclude_last():
    rng = np.random.default_rng(2)
    a = rng.normal(0, 1, 15).astype(np.float32)
    b = rng.normal(0, 1, 15).astype(np.float32)
    full = dtw_global_np(a, b)
    excl = dtw_global_np(a, b, exclude_last=True)
    assert abs((full - excl) - abs(a[-1] - b[-1])) < 1e-5


def test_dtw_evaluation_e2e():
    """--store-sig index + --dtw-evaluate-chains mapping: true mappings score
    well above noise (reference: align_chain, rmap.cpp:128-208)."""
    from rawhash_tpu.config import (
        IndexFlag,
        IndexOptions,
        MapFlag,
        MapOptions,
    )
    from rawhash_tpu.index.build import build_index_from_sequences
    from rawhash_tpu.io.signal_gen import simulate_reads
    from rawhash_tpu.map.engine import MappingEngine
    from rawhash_tpu.pore import synthetic_pore

    rng = np.random.default_rng(3)
    genome = "".join(rng.choice(list("ACGT"), size=6000))
    pore = synthetic_pore(k=6)
    iopt = IndexOptions(flag=IndexFlag.STORE_SIG)
    mopt = MapOptions()
    mopt.flag |= MapFlag.DTW_EVALUATE_CHAINS
    mopt.max_anchors_per_read = 512
    mopt.max_events_per_chunk = 768
    index = build_index_from_sequences([("chr1", genome)], pore, iopt)
    assert index.F is not None and index.R is not None
    engine = MappingEngine(index, mopt)
    reads = simulate_reads(genome, pore, n_reads=4, read_len=600, rng=rng)
    results = engine.map_batch([(n, s) for n, s, _, _ in reads])
    n_ok = 0
    for (name, sig, true_start, strand), res in zip(reads, results):
        rec = res.records[0]
        if rec.mapped and abs(rec.frag_start - true_start) < 1100:
            n_ok += 1
    assert n_ok >= 3


@pytest.mark.parametrize("n,m,r", [(50, 45, 8), (80, 80, 10), (30, 70, 12), (64, 64, 100)])
def test_banded_vec_matches_scalar(n, m, r):
    from rawhash_tpu.dtw.banded import dtw_banded_vec

    rng = np.random.default_rng(n * m + r)
    a = rng.normal(0, 1, n).astype(np.float32)
    b = rng.normal(0, 1, m).astype(np.float32)
    got = dtw_banded_vec(a, b, r)
    want = dtw_banded_np(a, b, r)
    assert abs(got - want) < 1e-2 * max(1.0, abs(want))


def test_banded_vec_exclude_last():
    from rawhash_tpu.dtw.banded import dtw_banded_vec

    rng = np.random.default_rng(9)
    a = rng.normal(0, 1, 40).astype(np.float32)
    b = rng.normal(0, 1, 40).astype(np.float32)
    d = dtw_banded_vec(a, b, 6) - dtw_banded_vec(a, b, 6, exclude_last=True)
    assert abs(d - abs(a[-1] - b[-1])) < 1e-4


@pytest.mark.parametrize("r", [4, 10])
def test_device_banded_batch_matches_host(r):
    from rawhash_tpu.dtw.banded import dtw_banded_vec
    from rawhash_tpu.dtw.device import dtw_banded_batch_host

    rng = np.random.default_rng(17 + r)
    pairs = []
    for _ in range(6):
        n = int(rng.integers(12, 60))
        m = int(rng.integers(12, 60))
        pairs.append(
            (rng.normal(0, 1, n).astype(np.float32),
             rng.normal(0, 1, m).astype(np.float32))
        )
    got = dtw_banded_batch_host(pairs, band_radius=r)
    for (a, b), g in zip(pairs, got):
        want = dtw_banded_vec(a, b, r)
        assert abs(g - want) < 1e-2 * max(1.0, abs(want)), (g, want)


def test_device_banded_batch_per_pair_radii():
    """Each pair carries its own band radius (the sparse chain-evaluation
    shape: radius = frac * query length per segment)."""
    from rawhash_tpu.dtw.banded import dtw_banded_vec
    from rawhash_tpu.dtw.device import dtw_banded_batch_host

    rng = np.random.default_rng(23)
    pairs, radii = [], []
    for _ in range(10):
        n = int(rng.integers(8, 90))
        m = int(rng.integers(8, 90))
        pairs.append(
            (rng.normal(0, 1, n).astype(np.float32),
             rng.normal(0, 1, m).astype(np.float32))
        )
        radii.append(max(1, int(rng.integers(1, 16))))
    got = dtw_banded_batch_host(pairs, band_radius=radii)
    for (a, b), r, g in zip(pairs, radii, got):
        want = dtw_banded_vec(a, b, r)
        assert abs(g - want) < 1e-2 * max(1.0, abs(want)), (g, want, r)


def test_evaluate_chains_batched_matches_sequential():
    """The batched evaluator replays align_chain's sequential accumulation
    exactly (reference: rmap.cpp:128-208): same scores as the per-chain
    host path including early termination and clamping."""
    from rawhash_tpu.chain.regions import Region
    from rawhash_tpu.config import MapOptions
    from rawhash_tpu.dtw.evaluate import evaluate_chains_batched
    from rawhash_tpu.dtw.host import align_chain_host

    rng = np.random.default_rng(31)

    class FakeIndex:
        F = [rng.normal(0, 1, 800).astype(np.float32)]
        R = [rng.normal(0, 1, 800).astype(np.float32)]

    mopt = MapOptions()
    read_events = rng.normal(0, 1, 400).astype(np.float32)

    def mk_jobs():
        jobs = []
        for _ in range(3):
            regs, n_anchor_lists = [], []
            bx_parts, by_parts = [], []
            as_ = 0
            for ci in range(int(rng.integers(1, 4))):
                cnt = int(rng.integers(2, 7))
                tp = np.sort(rng.integers(0, 700, cnt)).astype(np.uint64)
                qp = np.sort(rng.integers(0, 350, cnt)).astype(np.uint64)
                bx_parts.append(tp)
                by_parts.append(qp)
                r = Region(
                    rid=0, rev=int(rng.integers(0, 2)),
                    rs=int(tp[0]), re=int(tp[-1]),
                    qs=int(qp[0]), qe=int(qp[-1]),
                    score=50, cnt=cnt, as_=as_,
                )
                as_ += cnt
                regs.append(r)
            bx = np.concatenate(bx_parts)
            by = np.concatenate(by_parts)
            jobs.append((regs, bx, by, read_events))
        return jobs

    jobs = mk_jobs()
    # sequential oracle
    want = []
    for regs, bx, by, ev in jobs:
        best_found = 0.0
        scores = []
        for r in regs:
            align_chain_host(r, bx, by, FakeIndex, ev, mopt, min_score=best_found)
            if r.alignment_score >= mopt.dtw_min_score:
                best_found = max(best_found, r.alignment_score)
            elif r.alignment_score < mopt.dtw_min_score and r.alignment_score < 0:
                r.alignment_score = (
                    0.0 if mopt.dtw_min_score > 0 else mopt.dtw_min_score
                )
            scores.append(r.alignment_score)
        want.append(scores)

    evaluate_chains_batched(jobs, FakeIndex, mopt)
    for (regs, _, _, _), ws in zip(jobs, want):
        for r, w in zip(regs, ws):
            assert abs(r.alignment_score - w) < 1e-2 * max(1.0, abs(w)), (
                r.alignment_score, w,
            )


def test_dtw_semiglobal_substring_match():
    """Semiglobal: query aligned globally against the best substring of the
    target (reference: DTW_semiglobal, dtw.cpp:526-550)."""
    from rawhash_tpu.dtw.host import dtw_semiglobal_np

    rng = np.random.default_rng(41)
    b = rng.normal(0, 1, 120).astype(np.float32)
    a = b[40:70].copy()
    assert dtw_semiglobal_np(a, b) < 1e-6
    a_noisy = a + rng.normal(0, 0.05, a.shape).astype(np.float32)
    cost = dtw_semiglobal_np(a_noisy, b)
    assert 0 < cost < np.abs(a_noisy).sum()


def test_dtw_global_tb_cost_matches_plain_and_path_is_valid():
    """Traceback variant (reference: DTW_global_tb, dtw.cpp:595-667): same
    cost as the plain fill; path is a monotone warping path whose per-cell
    differences sum to the cost."""
    from rawhash_tpu.dtw.host import dtw_global_np, dtw_global_tb_np

    rng = np.random.default_rng(42)
    a = rng.normal(0, 1, 30).astype(np.float32)
    b = rng.normal(0, 1, 25).astype(np.float32)
    cost, aln = dtw_global_tb_np(a, b)
    assert abs(cost - dtw_global_np(a, b)) < 1e-3
    assert aln[0][:2] == (0, 0) and aln[-1][:2] == (29, 24)
    for (i0, j0, _), (i1, j1, _) in zip(aln, aln[1:]):
        assert (i1 - i0, j1 - j0) in ((0, 1), (1, 0), (1, 1))
    assert abs(sum(d for _, _, d in aln) - cost) < 1e-3
    # exclude_last drops the final element and its cost
    cost2, aln2 = dtw_global_tb_np(a, b, exclude_last=True)
    assert len(aln2) == len(aln) - 1
    assert abs((cost - cost2) - abs(a[-1] - b[-1])) < 1e-5


def test_dtw_semiglobal_tb_matches_semiglobal_cost():
    from rawhash_tpu.dtw.host import dtw_semiglobal_np, dtw_semiglobal_tb_np

    rng = np.random.default_rng(43)
    b = rng.normal(0, 1, 80).astype(np.float32)
    a = (b[30:50] + rng.normal(0, 0.02, 20)).astype(np.float32)
    cost, aln = dtw_semiglobal_tb_np(a, b)
    assert abs(cost - dtw_semiglobal_np(a, b)) < 1e-3
    # path covers all of `a` and ends inside `b`
    assert aln[0][0] == 0 and aln[-1][0] == a.shape[0] - 1
    assert 0 <= aln[-1][1] < b.shape[0]


def test_dtw_log_scores_stderr(capsys):
    """--dtw-log-scores prints one line per evaluated chain
    (reference: rmap.cpp:203-207)."""
    from rawhash_tpu.chain.regions import Region
    from rawhash_tpu.config import MapFlag, MapOptions
    from rawhash_tpu.dtw.evaluate import evaluate_chains_batched

    rng = np.random.default_rng(44)

    class FakeIndex:
        F = [rng.normal(0, 1, 400).astype(np.float32)]
        R = [rng.normal(0, 1, 400).astype(np.float32)]

    mopt = MapOptions()
    mopt.flag |= MapFlag.DTW_LOG_SCORES
    # query events = a slice of the reference signal so the alignment is
    # near-perfect and the evaluation runs to completion (the reference
    # does not log early-terminated chains)
    ev = FakeIndex.F[0][100:200].copy()
    tp = np.array([100, 130, 160, 199], dtype=np.uint64)
    qp = np.array([0, 30, 60, 99], dtype=np.uint64)
    r = Region(rid=0, rev=0, rs=100, re=199, qs=0, qe=99,
               score=50, cnt=4, as_=0)
    evaluate_chains_batched([([r], tp, qp, ev)], FakeIndex, mopt)
    err = capsys.readouterr().err
    assert "chaining_score=50 alignment_score=" in err
    assert r.alignment_score > 0

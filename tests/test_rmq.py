"""RMQ chaining mode (--rmq) tests."""

import numpy as np
import pytest

from rawhash_tpu.chain.host import lchain_dp_np
from rawhash_tpu.chain.rmq import lchain_rmq_fill_np, lchain_rmq_np
from test_chain import pack_anchors, synthetic_anchors


def test_rmq_recovers_true_chain():
    rng = np.random.default_rng(0)
    ax, ay = synthetic_anchors(rng)
    u, bx, by, px, py = lchain_rmq_np(
        ax, ay, 2500, 1000, 500, 5, 100000, 2, 15, 0.104, 0.0
    )
    assert u.shape[0] >= 1
    best = np.argmax(u[:, 0])
    assert u[best, 1] > 40


def test_rmq_close_to_dp():
    """RMQ is the reference's looser/faster mode; its best chain should be in
    the same ballpark as DP's on clean data."""
    rng = np.random.default_rng(1)
    ax, ay = synthetic_anchors(rng, n_true=70, n_noise=50)
    u_dp, *_ = lchain_dp_np(ax, ay, 2500, 2500, 500, 5, 200, 2, 15, 0.104, 0.0)
    u_rm, *_ = lchain_rmq_np(ax, ay, 2500, 1000, 500, 5, 100000, 2, 15, 0.104, 0.0)
    assert u_rm.shape[0] >= 1
    assert u_rm[:, 0].max() >= 0.8 * u_dp[:, 0].max()


def _dense_anchors(rng, n=400):
    """Repeat-dense anchor set: many co-located anchors across two targets,
    exercising delayed inserts, both eviction horizons and the inner
    refinement's skip pruning."""
    qpos = rng.integers(0, 800, size=n).astype(np.uint64)
    tpos = (rng.integers(0, 4, size=n) * 200 + rng.integers(0, 250, size=n)
            ).astype(np.uint64)
    tid = rng.integers(0, 2, size=n).astype(np.uint64)
    rev = rng.integers(0, 2, size=n).astype(np.uint64)
    return pack_anchors(rev, tid, tpos, qpos)


@pytest.mark.parametrize(
    "max_dist,inner,bw,cap",
    [
        (2500, 1000, 500, 100000),
        (2500, 0, 500, 100000),     # inner tree disabled
        (5000, 1000, 2500, 100000),  # bw-long style re-chain params
        (2500, 1000, 500, 24),       # tiny cap forces size-cap eviction
    ],
)
def test_native_rmq_fill_matches_oracle(max_dist, inner, bw, cap):
    from rawhash_tpu._native import rmq_fill_native

    rng = np.random.default_rng(5)
    for mk in range(4):
        if mk % 2 == 0:
            ax, ay = synthetic_anchors(rng, n_true=60, n_noise=80)
        else:
            ax, ay = _dense_anchors(rng)
        f_np, p_np = lchain_rmq_fill_np(
            ax, ay, max_dist, inner, bw, 5, cap, 0.104, 0.01
        )
        native = rmq_fill_native(ax, ay, max_dist, inner, bw, 5, cap, 0.104, 0.01)
        if native is None:
            pytest.skip("native toolchain unavailable")
        f_c, p_c = native
        np.testing.assert_array_equal(f_c, f_np.astype(np.int32))
        np.testing.assert_array_equal(p_c.astype(np.int64), p_np)


def test_native_rmq_full_chain_matches_oracle(monkeypatch):
    """lchain_rmq_np native path == forced-numpy path, end to end."""
    rng = np.random.default_rng(9)
    for mk in range(3):
        ax, ay = (synthetic_anchors(rng, n_true=70, n_noise=60) if mk == 0
                  else _dense_anchors(rng, n=300))
        args = (ax, ay, 2500, 1000, 500, 5, 100000, 2, 15, 0.104, 0.0)
        u_nat, bxn, byn, pxn, pyn = lchain_rmq_np(*args)
        monkeypatch.setenv("RAWHASH_TPU_NO_NATIVE_RMQ", "1")
        u_py, bxp, byp, pxp, pyp = lchain_rmq_np(*args)
        monkeypatch.delenv("RAWHASH_TPU_NO_NATIVE_RMQ")
        np.testing.assert_array_equal(np.asarray(u_nat), np.asarray(u_py))
        np.testing.assert_array_equal(bxn, bxp)
        np.testing.assert_array_equal(byn, byp)
        np.testing.assert_array_equal(pxn, pxp)
        np.testing.assert_array_equal(pyn, pyp)


def test_rmq_mapping_e2e():
    from rawhash_tpu.config import IndexOptions, MapFlag, MapOptions
    from rawhash_tpu.index.build import build_index_from_sequences
    from rawhash_tpu.io.signal_gen import simulate_reads
    from rawhash_tpu.map.engine import MappingEngine
    from rawhash_tpu.pore import synthetic_pore

    rng = np.random.default_rng(2)
    genome = "".join(rng.choice(list("ACGT"), size=6000))
    pore = synthetic_pore(k=6)
    iopt = IndexOptions()
    mopt = MapOptions()
    mopt.flag |= MapFlag.RMQ
    mopt.max_anchors_per_read = 512
    mopt.max_events_per_chunk = 768
    index = build_index_from_sequences([("chr1", genome)], pore, iopt)
    engine = MappingEngine(index, mopt)
    reads = simulate_reads(genome, pore, n_reads=4, read_len=600, rng=rng)
    results = engine.map_batch([(n, s) for n, s, _, _ in reads])
    n_ok = 0
    for (name, sig, true_start, strand), res in zip(reads, results):
        rec = res.records[0]
        if rec.mapped and abs(rec.frag_start - true_start) < 1100:
            n_ok += 1
    assert n_ok >= 3

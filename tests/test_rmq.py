"""RMQ chaining mode (--rmq) tests."""

import numpy as np

from rawhash_tpu.chain.host import lchain_dp_np
from rawhash_tpu.chain.rmq import lchain_rmq_np
from test_chain import synthetic_anchors


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

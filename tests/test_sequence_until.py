import numpy as np

from rawhash_tpu.map.sequence_until import SequenceUntil, find_outlier


def test_find_outlier_basic():
    x = np.array([[0.5, 0.5], [0.5, 0.5], [0.9, 0.1]], dtype=np.float32)
    assert find_outlier(x) > 0.3
    x2 = np.full((5, 3), 0.33, dtype=np.float32)
    assert find_outlier(x2) == 0.0


def test_sequence_until_stops_on_convergence():
    su = SequenceUntil(
        n_seq=3, t_threshold=0.01, tn_samples=3, ttest_freq=10, tmin_reads=20
    )
    rng = np.random.default_rng(0)
    stopped_at = None
    # stable abundance 60/30/10 -> estimates converge -> stop
    for i in range(500):
        ref = rng.choice(3, p=[0.6, 0.3, 0.1])
        if su.observe(int(ref), 1000):
            stopped_at = i
            break
    assert stopped_at is not None and stopped_at < 400
    ab = su.abundances()
    assert abs(ab[0] - 0.6) < 0.15


def test_sequence_until_keeps_going_when_diverging():
    su = SequenceUntil(
        n_seq=2, t_threshold=1e-9, tn_samples=3, ttest_freq=5, tmin_reads=5
    )
    # alternate hard between refs -> estimates keep moving -> no stop
    for i in range(200):
        assert not su.observe(i % 2, 1000 * (1 + i % 7))


def test_map_stream_multi_batch_ordering():
    from rawhash_tpu.config import IndexOptions, MapOptions
    from rawhash_tpu.index.build import build_index_from_sequences
    from rawhash_tpu.io.signal_gen import simulate_reads
    from rawhash_tpu.map.engine import MappingEngine
    from rawhash_tpu.pore import synthetic_pore

    rng = np.random.default_rng(3)
    genome = "".join(rng.choice(list("ACGT"), size=6000))
    pore = synthetic_pore(k=6)
    mopt = MapOptions()
    mopt.max_anchors_per_read = 512
    mopt.max_events_per_chunk = 768
    index = build_index_from_sequences([("chr1", genome)], pore, IndexOptions())
    engine = MappingEngine(index, mopt)
    reads = simulate_reads(genome, pore, n_reads=9, read_len=500, rng=rng)
    batches = [
        [(n, s) for n, s, _, _ in reads[i : i + 3]] for i in range(0, 9, 3)
    ]
    out = list(engine.map_stream(batches))
    assert len(out) == 3
    names = [r.name for res in out for r in res]
    assert names == [n for n, *_ in reads]

"""Device-tail engine == host-tail engine, record for record.

The device-tail path (chunk_step_tail) runs backtrack + compaction on-device
and ships only per-chain summaries; the host-tail path D2Hs every anchor and
backtracks in native C++.  Both must produce identical mappings
(reference semantics: rmap.cpp:389-599 + lchain.c:95-281 + hit.c:100-367).
"""

import os

import numpy as np
import pytest

from rawhash_tpu.config import IndexOptions, MapFlag, MapOptions
from rawhash_tpu.index.build import (
    build_index_from_sequences,
    build_index_from_signals,
)
from rawhash_tpu.io.signal_gen import simulate_reads
from rawhash_tpu.map.engine import MappingEngine
from rawhash_tpu.pore import synthetic_pore


def _key(res):
    return [
        (r.name, [(m.mapped, m.ref_id, m.read_start, m.read_end,
                   m.frag_start, m.frag_len, m.rev, m.mapq)
                  for m in r.records])
        for r in res
    ]


def _both(index, mo_factory, batch):
    # device-tail is opt-in since round 3 (it measured 4.8x slower than the
    # host tail end-to-end on the viral bench); parity must still hold
    os.environ["RAWHASH_TPU_DEVICE_TAIL"] = "1"
    try:
        eng = MappingEngine(index, mo_factory())
        assert eng.device_tail
        dev = eng.map_batch(batch)
    finally:
        del os.environ["RAWHASH_TPU_DEVICE_TAIL"]
    eng2 = MappingEngine(index, mo_factory())
    assert not eng2.device_tail
    host = eng2.map_batch(batch)
    return dev, host, eng


def test_device_tail_matches_host_tail_multichunk():
    """Adaptive multi-chunk workload incl. low-quality reads that never
    decide (exercises carried anchors across many chunks) + junk reads."""
    rng = np.random.default_rng(40)
    pore = synthetic_pore(k=6)
    genome = "".join(rng.choice(list("ACGT"), size=20000))
    index = build_index_from_sequences([("chr1", genome)], pore, IndexOptions())
    reads = simulate_reads(genome, pore, n_reads=10, read_len=2500, rng=rng)
    batch = [(n, s) for n, s, _, _ in reads]
    # junk reads: pure noise (never maps), and a very short one
    batch.append(("junk", rng.normal(90, 10, size=5000).astype(np.float32)))
    batch.append(("short", rng.normal(90, 10, size=50).astype(np.float32)))

    def mo():
        m = MapOptions()
        m.chunk_size = 1000  # force several chunks per read
        m.max_num_chunk = 8
        return m

    dev, host, eng = _both(index, mo, batch)
    assert _key(dev) == _key(host)
    assert any(m.mapped for r in dev for m in r.records)


def test_device_tail_matches_host_tail_ava():
    """All-vs-all (Rawsamble) flow: sig-target index + ALL_CHAINS."""
    rng = np.random.default_rng(41)
    pore = synthetic_pore(k=6)
    genome = "".join(rng.choice(list("ACGT"), size=12000))
    reads = simulate_reads(genome, pore, n_reads=8, read_len=1500, rng=rng)
    batch = [(n, s) for n, s, _, _ in reads]
    iopt = IndexOptions()
    index = build_index_from_signals(batch, pore, iopt)

    def mo():
        m = MapOptions()
        m.flag |= MapFlag.ALL_CHAINS
        m.min_mapq = 0
        return m

    dev, host, _ = _both(index, mo, batch)
    assert _key(dev) == _key(host)


def test_device_tail_disabled_for_special_modes():
    rng = np.random.default_rng(42)
    pore = synthetic_pore(k=6)
    genome = "".join(rng.choice(list("ACGT"), size=6000))
    index = build_index_from_sequences([("chr1", genome)], pore, IndexOptions())
    os.environ["RAWHASH_TPU_DEVICE_TAIL"] = "1"
    try:
        for tweak in (
            lambda m: setattr(m, "flag", m.flag | MapFlag.RMQ),
            lambda m: setattr(m, "flag", m.flag | MapFlag.DTW_EVALUATE_CHAINS),
            lambda m: setattr(m, "bw_long", m.bw * 3),
        ):
            m = MapOptions()
            tweak(m)
            eng = MappingEngine(index, m)
            assert not eng.device_tail
    finally:
        del os.environ["RAWHASH_TPU_DEVICE_TAIL"]


def test_device_tail_frame_compaction_paf_identical(monkeypatch):
    """Device-tail with the dispatch frame compacted to live rows (ladder
    base shrunk so tiny CPU batches exercise it) matches the uncompacted
    run exactly, including carried-anchor state across re-framed chunks."""
    import numpy as np

    from rawhash_tpu.config import IndexOptions, MapOptions
    from rawhash_tpu.index.build import build_index_from_sequences
    from rawhash_tpu.io.signal_gen import simulate_reads
    from rawhash_tpu.map.engine import MappingEngine
    from rawhash_tpu.pore import synthetic_pore

    rng = np.random.default_rng(27)
    genome = "".join(rng.choice(list("ACGT"), size=9000))
    pore = synthetic_pore(k=6)
    index = build_index_from_sequences([("chr1", genome)], pore, IndexOptions())
    reads = simulate_reads(genome, pore, n_reads=8, read_len=700, rng=rng)
    batch = []
    for i, (n, s, _, _) in enumerate(reads):
        if i % 2 == 0:
            s = np.concatenate(
                [rng.normal(90.0, 9.0, 6000).astype(np.float32), s]
            )
        batch.append((n, s))

    def run():
        eng = MappingEngine(index, MapOptions())
        assert eng.device_tail
        out = eng.map_batch(list(batch))
        return [
            (r.name, [(m.ref_id, m.frag_start, m.mapq, m.rev, m.mapped)
                      for m in r.records])
            for r in out
        ]

    monkeypatch.setenv("RAWHASH_TPU_DEVICE_TAIL", "1")
    monkeypatch.setenv("RAWHASH_TPU_ROW_LADDER_BASE", "2")
    framed = run()
    monkeypatch.setenv("RAWHASH_TPU_ROW_LADDER_BASE", "1024")
    full = run()
    assert framed == full


def test_auto_tail_switch_on_observed_width(monkeypatch):
    """Engines start host-tail and auto-switch NEW batches to the device
    tail once the observed anchor watermark crosses the threshold; records
    stay identical across the switch (mode binds per batch)."""
    import numpy as np

    from rawhash_tpu.config import IndexOptions, MapOptions
    from rawhash_tpu.index.build import build_index_from_sequences
    from rawhash_tpu.io.signal_gen import simulate_reads
    from rawhash_tpu.map.engine import MappingEngine
    from rawhash_tpu.pore import synthetic_pore

    rng = np.random.default_rng(31)
    genome = "".join(rng.choice(list("ACGT"), size=8000))
    pore = synthetic_pore(k=6)
    index = build_index_from_sequences([("chr1", genome)], pore, IndexOptions())
    reads = simulate_reads(genome, pore, n_reads=12, read_len=600, rng=rng)
    b1 = [(n, s) for n, s, _, _ in reads[:6]]
    b2 = [(n, s) for n, s, _, _ in reads[6:]]

    def snap(res):
        return [
            (r.name, [(m.ref_id, m.frag_start, m.mapq, m.rev, m.mapped)
                      for m in r.records])
            for r in res
        ]

    monkeypatch.delenv("RAWHASH_TPU_DEVICE_TAIL", raising=False)
    monkeypatch.setenv("RAWHASH_TPU_TAIL_SWITCH_ANCHORS", "10")
    eng = MappingEngine(index, MapOptions())
    assert not eng.device_tail and eng._tail_auto
    got1 = snap(eng.map_batch(b1))
    assert eng.device_tail, "watermark above threshold must flip the mode"
    got2 = snap(eng.map_batch(b2))  # mapped via the device tail

    monkeypatch.setenv("RAWHASH_TPU_TAIL_SWITCH_ANCHORS", str(1 << 30))
    eng2 = MappingEngine(index, MapOptions())
    want1 = snap(eng2.map_batch(b1))
    assert not eng2.device_tail
    want2 = snap(eng2.map_batch(b2))
    assert got1 == want1 and got2 == want2


def test_flat_summaries_growth_parity(monkeypatch):
    """The flat live-chain summary buffer (O(live chains) D2H) must regrow
    on flat_overflow and keep PAF identical: force a 64-row flat cap so the
    first dispatch overflows and the growth retry fires."""
    import numpy as np

    from rawhash_tpu.config import IndexOptions, MapOptions
    from rawhash_tpu.index.build import build_index_from_sequences
    from rawhash_tpu.io.signal_gen import simulate_reads
    from rawhash_tpu.map.engine import MappingEngine
    from rawhash_tpu.pore import synthetic_pore

    rng = np.random.default_rng(9)
    genome = "".join(rng.choice(list("ACGT"), size=12000))
    pore = synthetic_pore(k=6)
    index = build_index_from_sequences([("chr1", genome)], pore, IndexOptions())
    reads = simulate_reads(genome, pore, n_reads=8, read_len=900, rng=rng)
    batch = [(n, s) for n, s, _, _ in reads]

    def run():
        monkeypatch.setenv("RAWHASH_TPU_DEVICE_TAIL", "1")
        eng = MappingEngine(index, MapOptions())
        out = eng.map_batch(list(batch))
        return eng, [
            (r.name, [(m.ref_id, m.frag_start, m.frag_len, m.mapq, m.rev,
                       m.mapped) for m in r.records])
            for r in out
        ]

    _, want = run()
    monkeypatch.setenv("RAWHASH_TPU_FK_BASE", "2")
    eng, got = run()
    assert got == want
    # a 2-chain cap across 8 reads must actually overflow on this workload
    assert eng.stats.get("anchor_regrows", 0) > 0

"""Rawsamble (all-vs-all overlap) end-to-end: signal-target index + ALL_CHAINS
+ NO_ADAPTIVE mapping (reference: ava presets, main.cpp:148-166; rmap.cpp:86)."""

import numpy as np
import pytest

from rawhash_tpu.config import IndexOptions, MapOptions, set_preset
from rawhash_tpu.index.build import build_index_from_signals
from rawhash_tpu.io.signal_gen import simulate_read
from rawhash_tpu.map.engine import MappingEngine
from rawhash_tpu.pore import synthetic_pore


@pytest.fixture(scope="module")
def ava_setup():
    rng = np.random.default_rng(11)
    genome = "".join(rng.choice(list("ACGT"), size=6000))
    pore = synthetic_pore(k=6)
    iopt = IndexOptions()
    mopt = MapOptions()
    set_preset("ava-viral", iopt, mopt)
    mopt.max_anchors_per_read = 512
    # overlapping reads: read_i covers [i*800, i*800 + 2000)
    reads = []
    for i in range(5):
        sig = simulate_read(genome, pore, i * 800, 2000, 0, rng)
        reads.append((f"read_{i:02d}", sig))
    index = build_index_from_signals(reads, None, iopt)
    engine = MappingEngine(index, mopt)
    return reads, index, engine


def test_ava_index_is_signal_target(ava_setup):
    reads, index, engine = ava_setup
    assert index.sig_target
    assert index.n_seq == 5


def test_ava_finds_overlaps(ava_setup):
    reads, index, engine = ava_setup
    results = engine.map_batch(reads)
    overlaps = set()
    for res in results:
        for rec in res.records:
            if rec.mapped:
                overlaps.add((res.name, index.seq_names[rec.ref_id]))
    # name-order dedup: query must sort before target (strcmp >= 0 skipped)
    for q, t in overlaps:
        assert q < t
    # adjacent reads overlap by 1200 bases -> expect several found
    adjacent = {(f"read_{i:02d}", f"read_{i+1:02d}") for i in range(4)}
    found_adj = overlaps & adjacent
    assert len(found_adj) >= 2, f"overlaps found: {sorted(overlaps)}"


def test_ava_no_self_overlaps(ava_setup):
    reads, index, engine = ava_setup
    results = engine.map_batch(reads)
    for res in results:
        for rec in res.records:
            if rec.mapped:
                assert index.seq_names[rec.ref_id] != res.name


def test_ava_emits_multiple_chains_per_read(ava_setup):
    """ALL_CHAINS mode may emit several qualifying chains per read
    (reference: rmap.cpp:492-497)."""
    reads, index, engine = ava_setup
    results = engine.map_batch(reads)
    n_records = sum(
        sum(1 for r in res.records if r.mapped) for res in results
    )
    assert n_records >= 3

"""End-to-end: index a synthetic genome, simulate raw-signal reads, map them
with the full device pipeline, and verify placements + PAF output."""

import io

import numpy as np
import pytest

from rawhash_tpu.config import IndexOptions, MapOptions, set_preset
from rawhash_tpu.index.build import build_index_from_sequences
from rawhash_tpu.io.paf import write_paf
from rawhash_tpu.io.signal_gen import simulate_reads
from rawhash_tpu.map.engine import MappingEngine
from rawhash_tpu.pore import synthetic_pore

GENOME_LEN = 8000
READ_LEN = 600


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    genome = "".join(rng.choice(list("ACGT"), size=GENOME_LEN))
    pore = synthetic_pore(k=6)
    iopt = IndexOptions()
    mopt = MapOptions()
    set_preset("sensitive", iopt, mopt)
    # small static capacities keep test compiles quick
    mopt.max_anchors_per_read = 512
    mopt.max_events_per_chunk = 768
    index = build_index_from_sequences([("chr1", genome)], pore, iopt)
    engine = MappingEngine(index, mopt)
    return rng, genome, pore, index, engine


def test_e2e_reads_map_to_true_positions(setup):
    rng, genome, pore, index, engine = setup
    reads = simulate_reads(genome, pore, n_reads=8, read_len=READ_LEN, rng=rng)
    results = engine.map_batch([(n, s) for n, s, _, _ in reads])
    assert len(results) == 8
    n_correct = 0
    n_mapped = 0
    for (name, sig, true_start, strand), res in zip(reads, results):
        assert res.name == name
        rec = res.records[0]
        if rec.mapped:
            n_mapped += 1
            ok_pos = (
                true_start - 400 <= rec.frag_start <= true_start + READ_LEN + 400
            )
            if ok_pos and rec.rev == strand:
                n_correct += 1
    assert n_mapped >= 6, f"only {n_mapped}/8 mapped"
    assert n_correct >= 6, f"only {n_correct}/8 correct"


def test_e2e_random_signal_unmapped(setup):
    rng, genome, pore, index, engine = setup
    # pure noise shaped like a nanopore read but from no genome
    levels = rng.normal(90, 12, size=700)
    sig = (np.repeat(levels, 9) + rng.normal(0, 1.0, size=6300)).astype(np.float32)
    results = engine.map_batch([("noise_read", sig)])
    rec = results[0].records[0]
    assert rec.mapped == 0
    assert "mt:f:" in rec.tags and "ci:i:" in rec.tags


def test_e2e_paf_output_format(setup):
    rng, genome, pore, index, engine = setup
    reads = simulate_reads(genome, pore, n_reads=2, read_len=READ_LEN, rng=rng)
    results = engine.map_batch([(n, s) for n, s, _, _ in reads])
    buf = io.StringIO()
    write_paf(results, index, buf)
    lines = buf.getvalue().strip().split("\n")
    assert len(lines) >= 2
    for line in lines:
        cols = line.split("\t")
        assert len(cols) >= 13
        assert cols[0].startswith("sim_read_")
        if cols[4] in "+-":
            assert cols[5] == "chr1"
            assert int(cols[6]) == GENOME_LEN
            assert 0 <= int(cols[11]) <= 60
        else:
            assert cols[2] == "*"
    # tags present
    assert "mt:f:" in lines[0] and "sl:i:" in lines[0]


def test_e2e_adaptive_early_stop(setup):
    """Mapped reads should decide before consuming all chunks (Read Until)."""
    rng, genome, pore, index, engine = setup
    reads = simulate_reads(genome, pore, n_reads=4, read_len=1200, rng=rng)
    results = engine.map_batch([(n, s) for n, s, _, _ in reads])
    cis = []
    for res in results:
        rec = res.records[0]
        for tag in rec.tags.split("\t"):
            if tag.startswith("ci:i:"):
                cis.append(int(tag[5:]))
    # 1200 bases ~ 11k samples ~ 3 chunks available; most reads should stop
    # after 1-2 chunks
    assert min(cis) <= 2

"""Probe: what compiles during the bench warmup batch (host-tail mode)?

Mimics bench.py's setup exactly, logs every jit compile with timing.
"""
import logging
import os
import sys
import time

os.environ.setdefault("JAX_LOG_COMPILES", "1")
os.environ.setdefault("RAWHASH_TPU_LOG_COMPILES", "1")
logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
logging.getLogger("jax._src.dispatch").setLevel(logging.WARNING)
logging.getLogger("jax._src.interpreters.pxla").setLevel(logging.WARNING)

sys.path.insert(0, os.getcwd())  # run from repo root

import numpy as np


def main():
    genome_len = 30_000
    batch = int(os.environ.get("RAWHASH_BENCH_BATCH", "256"))
    read_len = 1200

    from rawhash_tpu.config import IndexOptions, MapOptions, set_preset
    from rawhash_tpu.index.build import build_index_from_sequences
    from rawhash_tpu.io.signal_gen import simulate_reads
    from rawhash_tpu.map.engine import MappingEngine
    from rawhash_tpu.pore import synthetic_pore

    rng = np.random.default_rng(7)
    genome = "".join(rng.choice(list("ACGT"), size=genome_len))
    pore = synthetic_pore(k=6)
    iopt = IndexOptions()
    mopt = MapOptions()
    set_preset("viral", iopt, mopt)
    mopt.batch_reads = batch
    mopt.max_anchors_per_read = 3072
    index = build_index_from_sequences([("chr1", genome)], pore, iopt)

    engine = MappingEngine(index, mopt)
    reads = simulate_reads(genome, pore, n_reads=batch, read_len=read_len, rng=rng)
    b = [(n, s) for n, s, _, _ in reads]

    t0 = time.time()
    res = engine.map_batch(b)
    print(f"# warmup batch: {time.time()-t0:.2f}s", file=sys.stderr)
    print(f"# stats: {engine.stats}", file=sys.stderr)

    t0 = time.time()
    res = engine.map_batch(b)
    print(f"# second batch: {time.time()-t0:.2f}s", file=sys.stderr)


if __name__ == "__main__":
    main()

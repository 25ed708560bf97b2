import sys, time
import numpy as np
from rawhash_tpu.config import IndexOptions, MapOptions, set_preset
from rawhash_tpu.index.build import build_index_from_sequences
from rawhash_tpu.io.signal_gen import simulate_reads
from rawhash_tpu.map.engine import MappingEngine
from rawhash_tpu.pore import synthetic_pore

rng = np.random.default_rng(7)
genome = "".join(rng.choice(list("ACGT"), size=30000))
pore = synthetic_pore(k=6)
iopt, mopt = IndexOptions(), MapOptions()
set_preset("viral", iopt, mopt)
batch = 256
mopt.batch_reads = batch
mopt.max_anchors_per_read = 3072
index = build_index_from_sequences([("chr1", genome)], pore, iopt)
engine = MappingEngine(index, mopt)
reads = simulate_reads(genome, pore, n_reads=5*batch, read_len=1200, rng=rng)
batches = [[(n, s) for n, s, _, _ in reads[i:i+batch]] for i in range(0, 5*batch, batch)]
list(engine.map_batch(batches[0]))  # warmup
engine.profiler.totals.clear(); engine.profiler.counts.clear()
t0 = time.time()
out = [r for res in engine.map_stream(batches[1:]) for r in res]
dt = time.time() - t0
print(f"steady: {len(out)} reads in {dt:.2f}s = {len(out)/dt:.0f} reads/s", file=sys.stderr)
print("PROFILE:", engine.profiler.summary(), file=sys.stderr)

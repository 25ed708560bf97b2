import time, numpy as np, sys
from rawhash_tpu.config import IndexOptions, MapOptions, set_preset
from rawhash_tpu.index.build import build_index_from_sequences
from rawhash_tpu.io.signal_gen import simulate_reads
from rawhash_tpu.map.engine import MappingEngine
from rawhash_tpu.pore import synthetic_pore

B = int(sys.argv[1])
rng = np.random.default_rng(7)
genome = "".join(rng.choice(list("ACGT"), size=30000))
pore = synthetic_pore(k=6)
iopt = IndexOptions(); mopt = MapOptions()
set_preset("viral", iopt, mopt)
mopt.batch_reads = B; mopt.max_anchors_per_read = 1024
index = build_index_from_sequences([("chr1", genome)], pore, iopt)
engine = MappingEngine(index, mopt)
n_reads = B * 3
reads = simulate_reads(genome, pore, n_reads=n_reads, read_len=1200, rng=rng)
batches = [[(n,s) for n,s,_,_ in reads[i:i+B]] for i in range(0, n_reads, B)]
t0=time.time()
warm = engine.map_batch(batches[0])
print(f"warmup+compile: {time.time()-t0:.1f}s")
engine.profiler.totals.clear(); engine.profiler.counts.clear()
t0=time.time()
cnt = 0
for res in engine.map_stream(batches[1:]):
    cnt += len(res)
dt=time.time()-t0
print(f"B={B}: {cnt} reads in {dt:.2f}s = {cnt/dt:.1f} reads/s ; {engine.profiler.summary()}")

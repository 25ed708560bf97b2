import sys, time
import numpy as np, jax
from rawhash_tpu.config import IndexOptions, MapOptions, set_preset
from rawhash_tpu.index.build import build_index_from_sequences
from rawhash_tpu.io.signal_gen import simulate_reads
from rawhash_tpu.map.engine import MappingEngine
from rawhash_tpu.pore import synthetic_pore
import rawhash_tpu.map.engine as E

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
reads = simulate_reads(genome, pore, n_reads=2*batch, read_len=1200, rng=rng)
batches = [[(n, s) for n, s, _, _ in reads[i:i+batch]] for i in range(0, 2*batch, batch)]
list(engine.map_batch(batches[0]))  # warmup

# instrument _process_chunk transfer pieces
orig = E._process_chunk
def timed(engine, st):
    out = st.pending
    t0 = time.perf_counter()
    jax.block_until_ready(out.packed)  # device exec done
    t1 = time.perf_counter()
    h_scal = np.asarray(out.scalars)
    t2 = time.perf_counter()
    nmax = int(h_scal[:,0].max())
    ncut = min(out.packed.shape[1], max(128, (nmax + 127) & ~127))
    hp = np.asarray(out.packed[:, :ncut, :])
    t3 = time.perf_counter()
    print(f"#  exec_wait {t1-t0:.3f}s scal {t2-t1:.3f}s packed[{ncut}x{out.packed.shape[2]}] {t3-t2:.3f}s ({hp.nbytes/1e6:.1f} MB)", file=sys.stderr)
    return orig(engine, st)
E._process_chunk = timed
t0 = time.time()
out = [r for res in engine.map_stream(batches[1:]) for r in res]
print(f"steady: {len(out)} reads in {time.time()-t0:.2f}s", file=sys.stderr)

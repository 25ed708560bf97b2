"""Probe: split chunk_step warmup into trace/lower vs compile vs execute."""
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np


def main():
    genome_len = 30_000
    batch = 256
    from rawhash_tpu.config import IndexOptions, MapOptions, set_preset
    from rawhash_tpu.index.build import build_index_from_sequences
    from rawhash_tpu.io.signal_gen import simulate_reads
    from rawhash_tpu.map.engine import MappingEngine, _BatchState
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
    reads = simulate_reads(genome, pore, n_reads=batch, read_len=1200, rng=rng)
    b = [(n, s) for n, s, _, _ in reads]

    import jax
    import jax.numpy as jnp
    from rawhash_tpu.map.device_step import chunk_step
    from rawhash_tpu.map.engine import _dispatch_step

    st = _BatchState(engine, b)
    mo, io = engine.mopt, engine.iopt
    chunk = np.zeros((st.b_dev, st.l_chunk), dtype=np.float32)
    slen = np.zeros(st.b_dev, dtype=np.int32)
    for i in range(st.b):
        seg = st.sigs[i][: st.l_chunk]
        chunk[i, : seg.shape[0]] = seg
        slen[i] = seg.shape[0]
    sig_dev = chunk.astype(engine.signal_dtype)
    p_cap = st.p_cap
    pack = np.zeros((st.b_dev, 3 * p_cap + 2), dtype=np.int32)
    pack[:, 3 * p_cap + 1] = slen
    params = dict(
        diff=io.diff, w=io.w, e=io.e, q=io.q, k=io.k,
        fine_min=io.fine_min, fine_max=io.fine_max, fine_range=io.fine_range,
        window_length1=mo.window_length1, window_length2=mo.window_length2,
        threshold1=mo.threshold1, threshold2=mo.threshold2,
        peak_height=mo.peak_height,
        e_cap=st.e_cap, a_cap=st.a_cap,
        min_events=mo.min_events, mid_occ=int(mo.mid_occ),
        max_dist_t=mo.max_target_gap_length, max_dist_q=mo.max_query_gap_length,
        bw=mo.bw, max_iter=mo.max_chain_iter,
        chn_pen_gap=engine.chn_pen_gap, chn_pen_skip=engine.chn_pen_skip,
        all_vs_all=False, keep_events=False,
        key_words=engine._key_words, pos_bits=engine._pos_bits, wide=st.wide,
    )
    import functools
    jf = jax.jit(functools.partial(chunk_step.__wrapped__, **params))
    args = (engine.didx, jnp.asarray(sig_dev), st.carry, st.ev_offset,
            jnp.asarray(pack), st.q_rank_dev, engine._target_rank)
    t0 = time.perf_counter()
    if os.environ.get("PROFILE"):
        import cProfile, pstats
        pr = cProfile.Profile()
        pr.enable()
        lowered = jf.lower(*args)
        pr.disable()
        ps = pstats.Stats(pr, stream=sys.stderr).sort_stats("cumulative")
        ps.print_stats(35)
    else:
        lowered = jf.lower(*args)
    t1 = time.perf_counter(); print(f"trace+lower: {t1-t0:.1f}s", file=sys.stderr)
    compiled = lowered.compile()
    t2 = time.perf_counter(); print(f"compile:     {t2-t1:.1f}s", file=sys.stderr)
    out = compiled(*args); jax.block_until_ready(out)
    t3 = time.perf_counter(); print(f"execute:     {t3-t2:.1f}s", file=sys.stderr)
    hlo = lowered.as_text()
    print(f"HLO size: {len(hlo)/1e6:.1f} MB, {hlo.count(chr(10))} lines",
          file=sys.stderr)


if __name__ == "__main__":
    main()

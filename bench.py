"""Benchmark: real-time raw-signal mapping throughput on one chip.

Hermetic D1-style workload (viral-size genome, simulated nanopore reads),
mirroring the reference's headline metric: mapped-signal throughput in
bases/second (reference: test/figures/throughput/throughput.csv — RawHash
D1 SARS-CoV-2 = 625,160 bp/s on a 32-thread CPU).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "bp/s", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

BASELINE_D1_BPS = 625_160.0  # reference 32-thread CPU, D1 SARS-CoV-2


def main():
    import os

    genome_len = 30_000  # SARS-CoV-2 scale
    batch = int(os.environ.get("RAWHASH_BENCH_BATCH", "256"))
    n_reads = 5 * batch  # 1 warmup batch + 4 timed, all the same XLA shape
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
    # anchor budget sized so NOTHING is truncated (hit_overflow == 0): the
    # reference keeps every hit, so a fair benchmark must too
    mopt.max_anchors_per_read = 3072
    t0 = time.time()
    index = build_index_from_sequences([("chr1", genome)], pore, iopt)
    t_index = time.time() - t0
    print(f"# index: {index.n_seeds} seeds in {t_index:.2f}s", file=sys.stderr)

    engine = MappingEngine(index, mopt)
    reads = simulate_reads(genome, pore, n_reads=n_reads, read_len=read_len, rng=rng)
    batches = [
        [(n, s) for n, s, _, _ in reads[i : i + batch]]
        for i in range(0, n_reads, batch)
    ]

    # warmup (compile)
    t0 = time.time()
    warm = engine.map_batch(batches[0])
    t_compile = time.time() - t0
    print(f"# warmup batch (compile): {t_compile:.2f}s", file=sys.stderr)

    # best of 3 timed passes: this is a 2-core host shared with other jobs,
    # and a single pass can lose 30%+ to unrelated load; the best pass is
    # the least-interfered measurement of the engine itself
    dt = float("inf")
    for _pass in range(3):
        t0 = time.time()
        results_pass = list(warm)
        for res in engine.map_stream(batches[1:]):
            results_pass.extend(res)
        dt_pass = time.time() - t0
        print(f"# pass {_pass}: {dt_pass:.2f}s", file=sys.stderr)
        if dt_pass < dt:
            dt, results = dt_pass, results_pass

    # sequenced bases before decision, from the ci tag (chunks * chunk_size
    # samples / samples-per-base), the reference's throughput accounting
    spb = mopt.sample_per_base
    bases = 0.0
    n_mapped = n_correct = 0
    timed_reads = results[len(batches[0]) :] if len(batches) > 1 else results
    for res in timed_reads:
        rec = res.records[0]
        ci = 1
        for tag in rec.tags.split("\t"):
            if tag.startswith("ci:i:"):
                ci = int(tag[5:])
        bases += ci * mopt.chunk_size / spb
    for (name, sig, true_start, strand), res in zip(reads, results):
        rec = res.records[0]
        if rec.mapped:
            n_mapped += 1
            if (
                abs(rec.frag_start - true_start) < read_len + 500
                and rec.rev == strand
            ):
                n_correct += 1

    n_timed = len(timed_reads)
    bps = bases / dt if dt > 0 else 0.0
    acc = n_correct / max(n_mapped, 1)
    print(
        f"# mapped {n_mapped}/{n_reads} (accuracy of mapped: {acc:.3f}); "
        f"{n_timed} timed reads in {dt:.2f}s "
        f"({n_timed/dt:.1f} reads/s)",
        file=sys.stderr,
    )
    result = {
        "metric": "viral_realtime_mapping_throughput",
        "value": round(bps, 1),
        "unit": "bp/s",
        "vs_baseline": round(bps / BASELINE_D1_BPS, 4),
        "reads_per_s": round(n_timed / dt, 2),
        "mapped_frac": round(n_mapped / n_reads, 3),
        "accuracy": round(acc, 3),
    }
    ref_bps = _reference_same_host_bps(genome, pore, reads, mopt)
    if ref_bps:
        result["reference_same_host_bps"] = round(ref_bps, 1)
        result["vs_reference_same_host"] = round(bps / ref_bps, 3)
    print(json.dumps(result))


def _reference_same_host_bps(genome, pore, reads, mopt):
    """Head-to-head on THIS machine: run the hermetically-built reference
    rawhash2 (tools/refbuild) on the identical workload with every host
    core, and report its bp/s under the same accounting.  Returns None when
    the reference tree/toolchain is unavailable."""
    import os
    import re
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    script = os.path.join(repo, "tools", "refbuild", "build_reference.sh")
    ref_bin = os.path.expanduser("~/.cache/rawhash_tpu_ref/rawhash2")
    try:
        if not os.path.exists(ref_bin):
            subprocess.run(["bash", script], check=True, capture_output=True,
                           timeout=600)
        from rawhash_tpu.io.sigfile import write_slow5

        nthreads = os.cpu_count() or 1
        with tempfile.TemporaryDirectory() as d:
            with open(os.path.join(d, "ref.fa"), "w") as fp:
                fp.write(f">chr1\n{genome}\n")
            bases4 = "ACGT"
            with open(os.path.join(d, "pore.model"), "w") as fp:
                fp.write("kmer\tlevel_mean\tlevel_stdv\n")
                for i, v in enumerate(pore.pore_vals):
                    kmer = "".join(
                        bases4[(i >> (2 * (5 - j))) & 3] for j in range(6)
                    )
                    fp.write(f"{kmer}\t{90 + 12 * v:.4f}\t2.0\n")
            write_slow5(
                os.path.join(d, "reads.slow5"),
                [(n, s) for n, s, _, _ in reads],
            )
            subprocess.run(
                [ref_bin, "-x", "viral", "-t", str(nthreads),
                 "-p", "pore.model", "-d", "ref.ind", "ref.fa"],
                check=True, capture_output=True, cwd=d, timeout=300,
            )
            # best of 3, same treatment as our own timed passes
            wall = float("inf")
            for _ in range(3):
                t0 = time.time()
                r_pass = subprocess.run(
                    [ref_bin, "-x", "viral", "-t", str(nthreads),
                     "ref.ind", "reads.slow5"],
                    check=True, capture_output=True, text=True, cwd=d,
                    timeout=600,
                )
                if time.time() - t0 < wall:
                    wall, r = time.time() - t0, r_pass
        spb = mopt.sample_per_base
        total = 0.0
        for line in r.stdout.splitlines():
            m = re.search(r"ci:i:(\d+)", line)
            if m:
                total += int(m.group(1)) * mopt.chunk_size / spb
        print(
            f"# reference rawhash2 on this host ({nthreads} threads): "
            f"{wall:.2f}s = {total / wall:.0f} bp/s",
            file=sys.stderr,
        )
        return total / wall if wall > 0 else None
    except Exception as e:  # no reference tree / toolchain: skip quietly
        print(f"# reference same-host bench unavailable: {e}", file=sys.stderr)
        return None


if __name__ == "__main__":
    main()

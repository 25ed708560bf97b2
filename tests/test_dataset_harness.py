"""Staged real-dataset harness plumbing (tools/datasets/run_eval.py).

The D1-D7 datasets cannot be fetched in this zero-egress environment, so
this test drives the runner end-to-end on a synthetic dataset directory
shaped like a fetched one (ref.fa + signal container + minimap2-style truth
PAF from known read placements) and checks the gate logic both ways."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "tools", "datasets", "run_eval.py")
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def _stage_dataset(d, n_reads=6):
    from rawhash_tpu.io.sigfile import write_slow5
    from rawhash_tpu.io.signal_gen import simulate_reads
    from rawhash_tpu.pore import synthetic_pore

    rng = np.random.default_rng(17)
    genome = "".join(rng.choice(list("ACGT"), size=8000))
    (d / "ref.fa").write_text(f">chr1\n{genome}\n")
    pore = synthetic_pore(k=6)
    bases = "ACGT"
    with open(d / "pore.model", "w") as fp:
        fp.write("kmer\tlevel_mean\tlevel_stdv\n")
        for i, v in enumerate(pore.pore_vals):
            kmer = "".join(bases[(i >> (2 * (5 - j))) & 3] for j in range(6))
            fp.write(f"{kmer}\t{90 + 12 * v:.4f}\t2.0\n")
    reads = simulate_reads(genome, pore, n_reads=n_reads, read_len=600,
                           rng=rng)
    sig_dir = d / "fast5_files"
    sig_dir.mkdir()
    write_slow5(str(sig_dir / "reads.slow5"),
                [(n, s) for n, s, _, _ in reads])
    # minimap2-shaped truth PAF from the known placements
    with open(d / "true.paf", "w") as fp:
        for name, _sig, start, strand in reads:
            fp.write(
                f"{name}\t600\t0\t600\t{'-' if strand else '+'}\tchr1\t"
                f"{len(genome)}\t{start}\t{start + 600}\t550\t600\t60\n"
            )
    return d


def _run(d, dataset="d1_sars_cov_2_r94"):
    return subprocess.run(
        [sys.executable, RUNNER, dataset,
         "--data-dir", str(d), "--truth", str(d / "true.paf"),
         "--pore", str(d / "pore.model"), "--threads", "1"],
        capture_output=True, text=True, env=ENV, timeout=500,
    )


def test_run_eval_gates_pass(tmp_path):
    d = _stage_dataset(tmp_path)
    r = _run(d)
    assert r.returncode == 0, r.stderr + r.stdout
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["gates_passed"] is True
    assert res["precision"] >= 0.9 and res["recall"] >= 0.9
    assert os.path.exists(d / "rawhash_tpu.paf")


def test_run_eval_gates_fail_on_wrong_truth(tmp_path):
    d = _stage_dataset(tmp_path)
    # corrupt the truth placements: every mapping becomes a false positive
    lines = (d / "true.paf").read_text().splitlines()
    with open(d / "true.paf", "w") as fp:
        for l in lines:
            f = l.split("\t")
            f[7], f[8] = "7000", "7600"  # far from any true placement
            f[0] = f[0] + "_other"
            fp.write("\t".join(f) + "\n")
    r = _run(d)
    assert r.returncode == 2, r.stdout
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["gates_passed"] is False

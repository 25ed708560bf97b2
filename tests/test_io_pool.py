"""--io-thread parallel container decode (reference: rsig.c:192-194)."""

import os

import numpy as np
import pytest

from rawhash_tpu.io.sigfile import write_sig_npz
from rawhash_tpu.map.pipeline import _batched_reads, parallel_file_reads


def _make_files(tmp_path, n_files=6, reads_per_file=5, kind="npz"):
    rng = np.random.default_rng(11)
    paths = []
    for fi in range(n_files):
        reads = [
            (f"f{fi}_r{ri}", rng.normal(90, 10, size=800).astype(np.float32))
            for ri in range(reads_per_file)
        ]
        if kind == "npz":
            p = os.path.join(str(tmp_path), f"part{fi}.sig.npz")
            write_sig_npz(p, reads)
        else:
            from rawhash_tpu.io.blow5 import write_blow5

            p = os.path.join(str(tmp_path), f"part{fi}.blow5")
            write_blow5(p, reads)
        paths.append(p)
    return paths


@pytest.mark.parametrize("kind", ["npz", "blow5"])
def test_parallel_decode_order_identical(tmp_path, kind):
    paths = _make_files(tmp_path, kind=kind)
    serial = [r for p in paths for r in __import__(
        "rawhash_tpu.io.sigfile", fromlist=["read_signals"]
    ).read_signals(p)]
    par = list(parallel_file_reads(paths, 4))
    assert [n for n, _ in par] == [n for n, _ in serial]
    for (_, a), (_, b) in zip(par, serial):
        np.testing.assert_array_equal(a, b)


def test_batched_reads_io_threads_identical(tmp_path):
    paths = _make_files(tmp_path, n_files=5, reads_per_file=7)
    b1 = list(_batched_reads([str(tmp_path)], 8, 0, n_io_threads=1))
    b4 = list(_batched_reads([str(tmp_path)], 8, 0, n_io_threads=4))
    assert len(b1) == len(b4)
    for x, y in zip(b1, b4):
        assert [n for n, _ in x] == [n for n, _ in y]
        for (_, a), (_, b) in zip(x, y):
            np.testing.assert_array_equal(a, b)


def test_cli_io_thread_flag(tmp_path):
    """End-to-end: --io-thread 4 over multiple files produces the same PAF
    as the single-thread decode."""
    import subprocess
    import sys

    rng = np.random.default_rng(3)
    genome = "".join(rng.choice(list("ACGT"), size=4000))
    from rawhash_tpu.config import IndexOptions
    from rawhash_tpu.index.serialize import save_index
    from rawhash_tpu.index.build import build_index_from_sequences
    from rawhash_tpu.io.signal_gen import simulate_reads
    from rawhash_tpu.pore import synthetic_pore

    pore = synthetic_pore(k=6)
    index = build_index_from_sequences([("chr1", genome)], pore, IndexOptions())
    idx_path = os.path.join(str(tmp_path), "ref.rhi.npz")
    save_index(idx_path, index)
    reads = simulate_reads(genome, pore, n_reads=8, read_len=500, rng=rng)
    for fi in range(4):
        write_sig_npz(
            os.path.join(str(tmp_path), f"part{fi}.sig.npz"),
            [(n, s) for n, s, _, _ in reads[fi * 2 : fi * 2 + 2]],
        )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    outs = []
    for nio in (1, 4):
        r = subprocess.run(
            [sys.executable, "-m", "rawhash_tpu", "--max-anchors", "512",
             "--io-thread", str(nio), idx_path, str(tmp_path)],
            capture_output=True, text=True, env=env, timeout=600,
        )
        assert r.returncode == 0, r.stderr
        # strip only the wall-clock-dependent mt:f: tag; every other column
        # AND tag (ci/sl/cm/nc/s1/sm) must be identical across thread counts
        outs.append(
            [
                "\t".join(
                    c for c in l.split("\t") if not c.startswith("mt:f:")
                )
                for l in r.stdout.splitlines()
            ]
        )
    assert outs[0] == outs[1]
    assert len(outs[0]) >= 8
    assert any("ci:i:" in l for l in outs[0])  # tags participate in compare

"""Reference .ind index interchange: parse the reference binary's own index
dump (ri_idx_dump, rindex.c:545-648) into a RawIndex and map with it.

Checks that a reference-built .ind carries the SAME seed table as our own
build on the same FASTA (the sketch path is bit-parity with the reference),
and that the CLI maps identically from either artifact.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO_ROOT)

from tests.test_ref_parity import REF_BIN  # noqa: E402  (builds/caches binary)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from rawhash_tpu.io.sigfile import write_slow5
    from rawhash_tpu.io.signal_gen import simulate_reads
    from rawhash_tpu.pore import synthetic_pore

    d = tmp_path_factory.mktemp("refind")
    rng = np.random.default_rng(41)
    genome = "".join(rng.choice(list("ACGT"), size=9000))
    (d / "ref.fa").write_text(f">chr1\n{genome}\n")
    pore = synthetic_pore(k=6)
    bases = "ACGT"
    with open(d / "pore.model", "w") as fp:
        fp.write("kmer\tlevel_mean\tlevel_stdv\n")
        for i, v in enumerate(pore.pore_vals):
            kmer = "".join(bases[(i >> (2 * (5 - j))) & 3] for j in range(6))
            fp.write(f"{kmer}\t{90 + 12 * v:.4f}\t2.0\n")
    reads = simulate_reads(genome, pore, n_reads=8, read_len=600, rng=rng)
    write_slow5(str(d / "reads.slow5"), [(n, s) for n, s, _, _ in reads])
    return d, genome, pore


def _build_ref_ind(d, extra=()):
    r = subprocess.run(
        [REF_BIN, "-x", "sensitive", "-t", "1", "-p", "pore.model",
         *extra, "-d", "ref.ind", "ref.fa"],
        capture_output=True, text=True, cwd=d, timeout=300,
    )
    assert r.returncode == 0, r.stderr


@pytest.mark.skipif(REF_BIN is None, reason="reference binary unavailable")
def test_ref_ind_detect_and_params(workdir):
    from rawhash_tpu.index.ref_ind import is_ref_index, load_ref_index

    d, genome, pore = workdir
    _build_ref_ind(d)
    path = str(d / "ref.ind")
    assert is_ref_index(path)
    assert not is_ref_index(str(d / "ref.fa"))
    idx = load_ref_index(path)
    assert idx.seq_names == ["chr1"]
    assert int(idx.seq_lens[0]) == len(genome)
    from rawhash_tpu.config import IndexOptions, MapOptions, set_preset

    iopt = IndexOptions()
    set_preset("sensitive", iopt, MapOptions())
    assert (idx.opts.k, idx.opts.q, idx.opts.e, idx.opts.w) == (
        iopt.k, iopt.q, iopt.e, iopt.w
    )
    assert idx.pore is not None and idx.pore.k == 6
    # normalized pore values round-trip (reference normalizes at load,
    # rutils.c:133-178)
    np.testing.assert_allclose(
        idx.pore.pore_vals, pore.pore_vals, rtol=0, atol=2e-3
    )


@pytest.mark.skipif(REF_BIN is None, reason="reference binary unavailable")
def test_ref_ind_seed_table_matches_our_build(workdir):
    """The .ind seed table must equal our own build bit-for-bit: same keys,
    same counts, same position sets per key (the reference sorts multi-entry
    runs by position; singletons are stored inline)."""
    from rawhash_tpu.config import IndexOptions, MapOptions, set_preset
    from rawhash_tpu.index.build import build_index_from_sequences
    from rawhash_tpu.index.ref_ind import load_ref_index

    d, genome, pore = workdir
    _build_ref_ind(d)
    ref_idx = load_ref_index(str(d / "ref.ind"))

    iopt = IndexOptions()
    set_preset("sensitive", iopt, MapOptions())
    ours = build_index_from_sequences([("chr1", genome)], pore, iopt)

    np.testing.assert_array_equal(ref_idx.keys, ours.keys)
    np.testing.assert_array_equal(ref_idx.offsets, ours.offsets)
    # per-key position runs as sets (our build and the reference both sort
    # runs by position word, so exact order should match too)
    np.testing.assert_array_equal(ref_idx.pos, ours.pos)


@pytest.mark.skipif(REF_BIN is None, reason="reference binary unavailable")
def test_cli_maps_from_ref_ind(workdir):
    """The CLI accepts a reference .ind directly and produces the same PAF
    as mapping from our own index artifact."""
    d, genome, pore = workdir
    _build_ref_ind(d)
    r_ind = subprocess.run(
        [sys.executable, "-m", "rawhash_tpu", "-x", "sensitive",
         "ref.ind", "reads.slow5"],
        capture_output=True, text=True, cwd=d, env=ENV, timeout=500,
    )
    assert r_ind.returncode == 0, r_ind.stderr
    assert "reference .ind index" in r_ind.stderr

    r = subprocess.run(
        [sys.executable, "-m", "rawhash_tpu", "-x", "sensitive",
         "-p", "pore.model", "-d", "ref.rhi.npz", "ref.fa"],
        capture_output=True, text=True, cwd=d, env=ENV, timeout=500,
    )
    assert r.returncode == 0, r.stderr
    r_npz = subprocess.run(
        [sys.executable, "-m", "rawhash_tpu", "-x", "sensitive",
         "ref.rhi.npz", "reads.slow5"],
        capture_output=True, text=True, cwd=d, env=ENV, timeout=500,
    )
    assert r_npz.returncode == 0, r_npz.stderr

    strip = lambda out: [
        "\t".join(l.split("\t")[:12]) for l in out.strip().splitlines()
    ]
    assert strip(r_ind.stdout) == strip(r_npz.stdout)
    assert any(f[5] != "*" for f in
               (l.split("\t") for l in r_ind.stdout.strip().splitlines()))


@pytest.mark.skipif(REF_BIN is None, reason="reference binary unavailable")
def test_ref_ind_store_sig(workdir):
    """--store-sig indexes carry F/R expected-signal arrays (rindex.c:590)."""
    from rawhash_tpu.index.ref_ind import load_ref_index

    d, genome, pore = workdir
    _build_ref_ind(d, extra=("--store-sig",))
    idx = load_ref_index(str(d / "ref.ind"))
    assert idx.F is not None and len(idx.F) == 1
    assert idx.R is not None and len(idx.R) == 1
    assert idx.F[0].shape[0] > 0 and idx.R[0].shape[0] > 0
    assert idx.F[0].dtype == np.float32


def test_dump_ref_ind_roundtrip(workdir):
    """dump_ref_index -> load_ref_index is bit-exact on keys/offsets/pos,
    pore table and metadata (write side of the interchange,
    ri_idx_dump/ri_idx_load, rindex.c:545-776)."""
    from rawhash_tpu.config import IndexOptions, MapOptions, set_preset
    from rawhash_tpu.index.build import build_index_from_sequences
    from rawhash_tpu.index.ref_ind import (
        dump_ref_index,
        is_ref_index,
        load_ref_index,
    )

    d, genome, pore = workdir
    iopt = IndexOptions()
    set_preset("sensitive", iopt, MapOptions())
    ours = build_index_from_sequences([("chr1", genome)], pore, iopt)
    path = str(d / "ours.ind")
    dump_ref_index(path, ours)
    assert is_ref_index(path)
    back = load_ref_index(path)
    np.testing.assert_array_equal(ours.keys, back.keys)
    np.testing.assert_array_equal(ours.offsets, back.offsets)
    np.testing.assert_array_equal(ours.pos, back.pos)
    np.testing.assert_allclose(ours.pore.pore_vals, back.pore.pore_vals)
    assert back.seq_names == ours.seq_names
    assert int(back.seq_lens[0]) == len(genome)
    assert int(back.opts.flag) == int(ours.opts.flag)


@pytest.mark.skipif(REF_BIN is None, reason="reference binary unavailable")
def test_reference_binary_maps_from_our_dumped_ind(workdir):
    """GOLD interchange test: the reference rawhash2 BINARY loads an .ind
    dumped by dump_ref_index and emits the same PAF as with its own index
    built from the identical FASTA + pore model."""
    from rawhash_tpu.config import IndexOptions, MapOptions, set_preset
    from rawhash_tpu.index.build import build_index_from_sequences
    from rawhash_tpu.index.ref_ind import dump_ref_index

    d, genome, pore = workdir
    _build_ref_ind(d)
    iopt = IndexOptions()
    set_preset("sensitive", iopt, MapOptions())
    ours = build_index_from_sequences([("chr1", genome)], pore, iopt)
    dump_ref_index(str(d / "ours.ind"), ours)

    def run(ind):
        r = subprocess.run(
            [REF_BIN, "-x", "sensitive", "-t", "1", ind, "reads.slow5"],
            capture_output=True, text=True, cwd=d, timeout=300,
        )
        assert r.returncode == 0, r.stderr
        # strip the wall-clock mt:f: tag
        return [
            "\t".join(c for c in l.split("\t") if not c.startswith("mt:f:"))
            for l in r.stdout.splitlines()
        ]

    assert run("ours.ind") == run("ref.ind")

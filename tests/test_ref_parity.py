"""PAF-equivalence harness against the REAL reference binary.

Builds rawhash2 from /root/reference/src hermetically (HDF5/POD5 disabled via
the reference's own NHDF5RH/NPOD5RH guards; SLOW5 backed by the ASCII stub in
tools/refbuild/slow5_stub), runs both tools on identical inputs (same FASTA,
same pore-model file, same SLOW5 signals), and compares PAF outputs —
the BASELINE.json north-star check.

Bit-exact PAF equality is not guaranteed (SURVEY.md hard part #1: the device
pipeline reorders float reductions, and the device chain fill drops the
max_skip pruning so chain scores can exceed the reference's), so the harness
asserts LOCATION agreement: same mapped/unmapped decision, same target and
strand, and overlapping target intervals for every read both tools map.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO_ROOT)


def _build_reference():
    out = os.path.expanduser("~/.cache/rawhash_tpu_ref/rawhash2")
    if os.path.exists(out):
        return out
    script = os.path.join(REPO_ROOT, "tools", "refbuild", "build_reference.sh")
    r = subprocess.run(
        ["bash", script, REF_SRC, out], capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0 or not os.path.exists(out):
        return None
    return out


REF_BIN = None
if os.path.isdir(REF_SRC):
    REF_BIN = _build_reference()


def parse_paf(text: str) -> dict:
    out = {}
    for line in text.strip().splitlines():
        cols = line.split("\t")
        if len(cols) < 12:
            continue
        name = cols[0]
        if cols[5] == "*":
            out[name] = None
        else:
            out[name] = (cols[5], cols[4], int(cols[7]), int(cols[8]))
    return out


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from rawhash_tpu.io.sigfile import write_slow5
    from rawhash_tpu.io.signal_gen import simulate_reads
    from rawhash_tpu.pore import synthetic_pore

    d = tmp_path_factory.mktemp("refparity")
    rng = np.random.default_rng(29)
    genome = "".join(rng.choice(list("ACGT"), size=12000))
    (d / "ref.fa").write_text(f">chr1\n{genome}\n")
    pore = synthetic_pore(k=6)
    bases = "ACGT"
    with open(d / "pore.model", "w") as fp:
        fp.write("kmer\tlevel_mean\tlevel_stdv\n")
        for i, v in enumerate(pore.pore_vals):
            kmer = "".join(bases[(i >> (2 * (5 - j))) & 3] for j in range(6))
            fp.write(f"{kmer}\t{90 + 12 * v:.4f}\t2.0\n")
    reads = simulate_reads(genome, pore, n_reads=24, read_len=700, rng=rng)
    write_slow5(str(d / "reads.slow5"), [(n, s) for n, s, _, _ in reads])
    return d


@pytest.mark.skipif(REF_BIN is None, reason="reference binary unavailable")
def test_reference_binary_and_ours_agree(workdir):
    d = workdir
    # reference: index + map (single-threaded for deterministic output order)
    r = subprocess.run(
        [REF_BIN, "-x", "sensitive", "-t", "1", "-p", "pore.model",
         "-d", "ref.ind", "ref.fa"],
        capture_output=True, text=True, cwd=d, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [REF_BIN, "-x", "sensitive", "-t", "1", "ref.ind", "reads.slow5"],
        capture_output=True, text=True, cwd=d, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    ref_paf = parse_paf(r.stdout)
    assert ref_paf, "reference produced no PAF records"

    # ours through the CLI on the same files
    r = subprocess.run(
        [sys.executable, "-m", "rawhash_tpu", "-x", "sensitive",
         "-p", "pore.model", "-d", "ref.rhi.npz", "ref.fa"],
        capture_output=True, text=True, cwd=d, env=ENV, timeout=500,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "rawhash_tpu", "-x", "sensitive",
         "ref.rhi.npz", "reads.slow5"],
        capture_output=True, text=True, cwd=d, env=ENV, timeout=500,
    )
    assert r.returncode == 0, r.stderr
    our_paf = parse_paf(r.stdout)

    assert set(our_paf) == set(ref_paf)
    n_both = n_agree = 0
    disagreements = []
    for name, ref in ref_paf.items():
        ours = our_paf[name]
        if ref is None and ours is None:
            continue
        if (ref is None) != (ours is None):
            disagreements.append((name, ref, ours))
            continue
        n_both += 1
        same_target = ref[0] == ours[0] and ref[1] == ours[1]
        overlap = min(ref[3], ours[3]) - max(ref[2], ours[2])
        if same_target and overlap > 0:
            n_agree += 1
        else:
            disagreements.append((name, ref, ours))
    assert n_both > 0, "reference mapped nothing"
    frac = n_agree / max(n_both, 1)
    assert frac >= 0.9, (
        f"agreement {n_agree}/{n_both}; disagreements: {disagreements[:5]}"
    )


def _run_pair(d, ref_args, our_args, ref_index_args=(), our_index_args=()):
    r = subprocess.run(
        [REF_BIN, "-x", "sensitive", "-t", "1", "-p", "pore.model",
         *ref_index_args, "-d", "refm.ind", "ref.fa"],
        capture_output=True, text=True, cwd=d, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [REF_BIN, "-x", "sensitive", "-t", "1", *ref_args, "refm.ind",
         "reads.slow5"],
        capture_output=True, text=True, cwd=d, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    ref_paf = parse_paf(r.stdout)
    r = subprocess.run(
        [sys.executable, "-m", "rawhash_tpu", "-x", "sensitive",
         "-p", "pore.model", *our_index_args, "-d", "refm.rhi.npz", "ref.fa"],
        capture_output=True, text=True, cwd=d, env=ENV, timeout=500,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "rawhash_tpu", "-x", "sensitive", *our_args,
         "refm.rhi.npz", "reads.slow5"],
        capture_output=True, text=True, cwd=d, env=ENV, timeout=500,
    )
    assert r.returncode == 0, r.stderr
    return ref_paf, parse_paf(r.stdout)


def _agreement(ref_paf, our_paf):
    both = agree = 0
    mismatched_status = 0
    for name, ref in ref_paf.items():
        ours = our_paf.get(name)
        if ref is None and ours is None:
            continue
        if (ref is None) != (ours is None):
            mismatched_status += 1
            continue
        both += 1
        if (ref[0] == ours[0] and ref[1] == ours[1]
                and min(ref[3], ours[3]) > max(ref[2], ours[2])):
            agree += 1
    return both, agree, mismatched_status


def parse_paf_tags(text: str) -> dict:
    """name -> dict of PAF tag -> value string (reference: rmap.cpp:527-570)."""
    out = {}
    for line in text.strip().splitlines():
        cols = line.split("\t")
        if len(cols) < 12:
            continue
        tags = {}
        for col in cols[12:]:
            k, _t, v = col.split(":", 2)
            tags[k] = v
        out[cols[0]] = tags
    return out


@pytest.mark.skipif(REF_BIN is None, reason="reference binary unavailable")
def test_reference_tag_parity(workdir):
    """Tag-level parity: ci/sl/cm/nc/s1/sm compared per read (mt:f is wall
    time, excluded).  sl and sm must match exactly for every read; the chain
    stat tags (ci/cm/nc/s1) depend on float-reduction order and the device
    fill's documented max_skip deviation, so ci/nc are held to >=0.9 exact
    agreement and cm/s1 (chain anchor count / score) to within 20% relative
    on every read (measured max deviation on this fixture: 16%; reference
    tag assembly: rmap.cpp:527-570)."""
    d = workdir
    r = subprocess.run(
        [REF_BIN, "-x", "sensitive", "-t", "1", "-p", "pore.model",
         "-d", "reft.ind", "ref.fa"],
        capture_output=True, text=True, cwd=d, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [REF_BIN, "-x", "sensitive", "-t", "1", "reft.ind", "reads.slow5"],
        capture_output=True, text=True, cwd=d, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    ref_tags = parse_paf_tags(r.stdout)
    r = subprocess.run(
        [sys.executable, "-m", "rawhash_tpu", "-x", "sensitive",
         "-p", "pore.model", "-d", "reft.rhi.npz", "ref.fa"],
        capture_output=True, text=True, cwd=d, env=ENV, timeout=500,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "rawhash_tpu", "-x", "sensitive",
         "reft.rhi.npz", "reads.slow5"],
        capture_output=True, text=True, cwd=d, env=ENV, timeout=500,
    )
    assert r.returncode == 0, r.stderr
    our_tags = parse_paf_tags(r.stdout)

    assert set(our_tags) == set(ref_tags)
    compared = {"ci": 0, "sl": 0, "cm": 0, "nc": 0, "s1": 0, "sm": 0}
    agreed = dict(compared)
    mismatches = []
    for name, rt in ref_tags.items():
        ot = our_tags[name]
        assert set(rt) == set(ot), (name, rt, ot)
        for tag in compared:
            compared[tag] += 1
            if rt[tag] == ot[tag]:
                agreed[tag] += 1
            else:
                mismatches.append((name, tag, rt[tag], ot[tag]))
        for tag in ("cm", "s1"):
            rv, ov = int(rt[tag]), int(ot[tag])
            assert abs(rv - ov) <= max(2, 0.2 * max(rv, ov)), (name, tag, rv, ov)
    n = compared["sl"]
    assert n > 0
    assert agreed["sl"] == n, mismatches
    assert agreed["sm"] == n, mismatches
    for tag in ("ci", "nc"):
        assert agreed[tag] / n >= 0.9, (tag, agreed, mismatches[:10])


@pytest.mark.skipif(REF_BIN is None, reason="reference binary unavailable")
def test_reference_adversarial_repeats_low_snr(tmp_path):
    """Adversarial-input parity: repeat-dense genome (8 mutated copies of a
    600 bp unit = ~35% repeat content) + low-SNR reads (noise 3x the clean
    fixtures').  Quantifies the device fill's documented max_skip deviation
    where it would matter most — repeat-rich anchor sets — and the VERDICT
    round-2 target of >=99% location agreement (measured: 29/29 = 100%,
    zero mapped/unmapped status mismatches)."""
    from rawhash_tpu.io.sigfile import write_slow5
    from rawhash_tpu.io.signal_gen import simulate_read
    from rawhash_tpu.pore import synthetic_pore

    d = tmp_path
    rng = np.random.default_rng(101)
    pore = synthetic_pore(k=6)
    bases = "ACGT"
    with open(d / "pore.model", "w") as fp:
        fp.write("kmer\tlevel_mean\tlevel_stdv\n")
        for i, v in enumerate(pore.pore_vals):
            kmer = "".join(bases[(i >> (2 * (5 - j))) & 3] for j in range(6))
            fp.write(f"{kmer}\t{90 + 12 * v:.4f}\t2.0\n")
    unit = "".join(rng.choice(list("ACGT"), size=600))
    parts = ["".join(rng.choice(list("ACGT"), size=4000))]
    for _ in range(8):
        m = np.array(list(unit))
        idx = rng.choice(len(m), size=12, replace=False)
        m[idx] = rng.choice(list("ACGT"), size=12)
        parts.append("".join(m))
    parts.append("".join(rng.choice(list("ACGT"), size=5000)))
    genome = "".join(parts)
    (d / "adv.fa").write_text(f">chr1\n{genome}\n")
    reads = []
    for i in range(30):
        start = int(rng.integers(0, len(genome) - 700))
        strand = int(rng.integers(0, 2))
        sig = simulate_read(genome, pore, start, 700, strand, rng, noise=3.0)
        reads.append((f"adv_{i}", sig))
    write_slow5(str(d / "adv.slow5"), reads)

    r = subprocess.run(
        [REF_BIN, "-x", "sensitive", "-t", "1", "-p", "pore.model",
         "-d", "adv.ind", "adv.fa"],
        capture_output=True, text=True, cwd=d, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [REF_BIN, "-x", "sensitive", "-t", "1", "adv.ind", "adv.slow5"],
        capture_output=True, text=True, cwd=d, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    ref_paf = parse_paf(r.stdout)
    r = subprocess.run(
        [sys.executable, "-m", "rawhash_tpu", "-x", "sensitive",
         "-p", "pore.model", "-d", "adv.rhi.npz", "adv.fa"],
        capture_output=True, text=True, cwd=d, env=ENV, timeout=500,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "rawhash_tpu", "-x", "sensitive",
         "adv.rhi.npz", "adv.slow5"],
        capture_output=True, text=True, cwd=d, env=ENV, timeout=500,
    )
    assert r.returncode == 0, r.stderr
    our_paf = parse_paf(r.stdout)
    both, agree, mismatched_status = _agreement(ref_paf, our_paf)
    assert both >= 20, (both, agree)
    assert mismatched_status <= 1, (both, agree, mismatched_status)
    assert agree / both >= 0.95, (both, agree)


@pytest.mark.skipif(REF_BIN is None, reason="reference binary unavailable")
def test_reference_sequence_until_parity(tmp_path):
    """Sequence Until parity on a shuffled 3-target community with skewed
    abundances (0.6/0.3/0.1): both tools must stop within one or two test
    intervals of each other (reference: sequence_until.c:4-18 +
    rmap.cpp:708-734; measured on this fixture: reference stops after 100
    mapped reads, ours after 90 with --test-frequency 10)."""
    import re

    from rawhash_tpu.io.sigfile import write_slow5
    from rawhash_tpu.io.signal_gen import simulate_read
    from rawhash_tpu.pore import synthetic_pore

    d = tmp_path
    rng = np.random.default_rng(101)
    pore = synthetic_pore(k=6)
    bases = "ACGT"
    with open(d / "pore.model", "w") as fp:
        fp.write("kmer\tlevel_mean\tlevel_stdv\n")
        for i, v in enumerate(pore.pore_vals):
            kmer = "".join(bases[(i >> (2 * (5 - j))) & 3] for j in range(6))
            fp.write(f"{kmer}\t{90 + 12 * v:.4f}\t2.0\n")
    genomes = {
        name: "".join(rng.choice(list("ACGT"), size=9000))
        for name in ("g1", "g2", "g3")
    }
    with open(d / "comm.fa", "w") as fp:
        for name, g in genomes.items():
            fp.write(f">{name}\n{g}\n")
    names = list(genomes)
    sreads = []
    for i in range(150):
        gname = names[int(rng.choice(3, p=[0.6, 0.3, 0.1]))]
        g = genomes[gname]
        start = int(rng.integers(0, len(g) - 600))
        strand = int(rng.integers(0, 2))
        sig = simulate_read(g, pore, start, 600, strand, rng, noise=1.0)
        sreads.append((f"su_{i}", sig))
    write_slow5(str(d / "comm.slow5"), sreads)
    su_flags = ["--sequence-until", "--min-reads", "40",
                "--test-frequency", "10", "--n-samples", "5",
                "--threshold", "1.5"]

    r = subprocess.run(
        [REF_BIN, "-x", "sensitive", "-t", "1", "-p", "pore.model",
         "-d", "comm.ind", "comm.fa"],
        capture_output=True, text=True, cwd=d, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [REF_BIN, "-x", "sensitive", "-t", "1", *su_flags,
         "comm.ind", "comm.slow5"],
        capture_output=True, text=True, cwd=d, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    m = re.search(r"stopping sequencing after processing (\d+) mapped reads",
                  r.stderr)
    assert m, f"reference did not stop: {r.stderr[-1500:]}"
    ref_stop = int(m.group(1))
    r = subprocess.run(
        [sys.executable, "-m", "rawhash_tpu", "-x", "sensitive",
         "-p", "pore.model", "-d", "comm.rhi.npz", "comm.fa"],
        capture_output=True, text=True, cwd=d, env=ENV, timeout=500,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "rawhash_tpu", "-x", "sensitive", *su_flags,
         "comm.rhi.npz", "comm.slow5"],
        capture_output=True, text=True, cwd=d, env=ENV, timeout=500,
    )
    assert r.returncode == 0, r.stderr
    m = re.search(r"stopping after (\d+) mapped reads", r.stderr)
    assert m, f"our pipeline did not stop: {r.stderr[-1500:]}"
    our_stop = int(m.group(1))
    # both must converge, within two test intervals of each other
    assert abs(ref_stop - our_stop) <= 2 * 10, (ref_stop, our_stop)


@pytest.mark.skipif(REF_BIN is None, reason="reference binary unavailable")
def test_reference_rmq_mode_agrees(workdir):
    """--rmq chaining mode: both tools swap in the RMQ chainer
    (reference: mg_lchain_rmq, lchain.c:606)."""
    ref_paf, our_paf = _run_pair(workdir, ["--rmq"], ["--rmq"])
    both, agree, mism = _agreement(ref_paf, our_paf)
    assert both > 0
    assert agree / both >= 0.9, (both, agree, mism)


@pytest.mark.skipif(REF_BIN is None, reason="reference binary unavailable")
def test_reference_dtw_mode_agrees(workdir):
    """--store-sig index + --dtw-evaluate-chains mapping (RawAlign mode)."""
    ref_paf, our_paf = _run_pair(
        workdir,
        ["--dtw-evaluate-chains"], ["--dtw-evaluate-chains"],
        ref_index_args=["--store-sig"], our_index_args=["--store-sig"],
    )
    both, agree, mism = _agreement(ref_paf, our_paf)
    assert both > 0
    assert agree / both >= 0.9, (both, agree, mism)

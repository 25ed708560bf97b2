import numpy as np
import pytest

from rawhash_tpu.pore import (
    PoreModel,
    load_pore,
    revcomp_kmer_codes,
    seq_to_sig,
    synthetic_pore,
)


def scalar_seq_to_sig(seq: str, pore: PoreModel, strand: int) -> np.ndarray:
    """Direct transliteration of the reference rolling loop
    (reference: ri_seq_to_sig, src/rsig.c:13-40) used as the oracle."""
    from rawhash_tpu.pore import SEQ_NT4

    k = pore.k
    mask = (1 << (2 * k)) - 1
    kmer = 0
    out = []
    n = len(seq)
    for i in range(n):
        pos = n - i - 1 if strand else i
        c = int(SEQ_NT4[ord(seq[pos])])
        if c < 4:
            if not strand:
                kmer = ((kmer << 2) | c) & mask
            else:
                kmer = ((kmer << 2) | (3 ^ c)) & mask
        if i + 1 < k:
            continue
        out.append(pore.pore_vals[kmer])
    return np.asarray(out, dtype=np.float32)


@pytest.mark.parametrize("strand", [0, 1])
def test_seq_to_sig_matches_scalar_oracle(strand):
    pore = synthetic_pore(k=4, seed=0)
    rng = np.random.default_rng(1)
    seq = "".join(rng.choice(list("ACGTacgtN"), size=200))
    got = seq_to_sig(seq, pore, strand)
    want = scalar_seq_to_sig(seq, pore, strand)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_seq_to_sig_short_sequence():
    pore = synthetic_pore(k=6)
    assert seq_to_sig("ACG", pore, 0).shape == (0,)


def test_revcomp_kmer_codes():
    # ACG -> CGT : A=0,C=1,G=2 packed 0b000110 -> revcomp CGT = 1,2,3
    code = np.array([0b000110], dtype=np.uint32)
    rc = revcomp_kmer_codes(code, 3)
    assert rc[0] == 0b011011


def test_load_pore_normalizes(tmp_path):
    k = 2
    path = tmp_path / "model.txt"
    rows = ["kmer\tlevel_mean\tlevel_stdv"]
    vals = np.linspace(60.0, 120.0, 16)
    bases = "ACGT"
    kmers = [a + b for a in bases for b in bases]
    for km, v in zip(kmers, vals):
        rows.append(f"{km}\t{v:.3f}\t2.0")
    path.write_text("\n".join(rows) + "\n")
    pore = load_pore(str(path), k=k, lev_col=1)
    assert pore.n_pore_vals == 16
    assert abs(pore.pore_vals.mean()) < 1e-5
    assert abs((pore.pore_vals**2).mean() - 1.0) < 1e-4


def test_synthetic_pore_deterministic():
    a = synthetic_pore(k=6, seed=7).pore_vals
    b = synthetic_pore(k=6, seed=7).pore_vals
    np.testing.assert_array_equal(a, b)
    assert abs(float(a.mean())) < 1e-5

"""Native index build == numpy oracle, byte-for-byte.

The native path (_native/index_build.cpp) replaces pore.seq_to_sig +
sketch.host.sketch_events_np + the _finalize lexsort with a single-pass C++
kernel and a bucketed parallel sort (reference: the threaded build pipeline,
rindex.c:921 + parallel bucket finalize, rindex.c:463-491).  The artifact
must be identical to the numpy path in every array.
"""

import os

import numpy as np
import pytest

from rawhash_tpu._native import get_lib, sketch_seq_native, sort_seeds_native
from rawhash_tpu.config import IndexFlag, IndexOptions
from rawhash_tpu.index.build import build_index_from_sequences
from rawhash_tpu.pore import seq_to_sig, synthetic_pore
from rawhash_tpu.sketch.host import sketch_events_np

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native toolchain unavailable"
)


def _records(rng, n_seq=3, n=50_000, with_n=True):
    alpha = list("ACGTN") if with_n else list("ACGT")
    p = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else None
    return [
        (f"chr{i}", "".join(rng.choice(alpha, size=n, p=p)))
        for i in range(n_seq)
    ]


@pytest.mark.parametrize("w,store", [(0, False), (3, False), (5, True)])
def test_build_identical_to_numpy(w, store):
    rng = np.random.default_rng(17)
    records = _records(rng)
    records.append(("tiny", "ACG"))  # shorter than k: skipped, keeps F/R slots
    pore = synthetic_pore(k=6)
    opts = IndexOptions()
    opts.w = w
    if store:
        opts.flag |= IndexFlag.STORE_SIG

    native = build_index_from_sequences(records, pore, opts)
    os.environ["RAWHASH_TPU_NO_NATIVE_BUILD"] = "1"
    try:
        oracle = build_index_from_sequences(records, pore, opts)
    finally:
        del os.environ["RAWHASH_TPU_NO_NATIVE_BUILD"]

    assert np.array_equal(native.keys, oracle.keys)
    assert np.array_equal(native.offsets, oracle.offsets)
    assert np.array_equal(native.pos, oracle.pos)
    assert native.seq_names == oracle.seq_names
    assert np.array_equal(native.seq_lens, oracle.seq_lens)
    if store:
        for a, b in zip(native.F, oracle.F):
            assert np.array_equal(a, b)
        for a, b in zip(native.R, oracle.R):
            assert np.array_equal(a, b)


def test_sketch_seq_native_matches_oracle():
    rng = np.random.default_rng(23)
    pore = synthetic_pore(k=6)
    for n, w, e, q, fr in [(4000, 0, 8, 4, 0.4), (4000, 7, 6, 5, 0.3),
                           (40, 0, 8, 4, 0.4)]:
        seq = "".join(rng.choice(list("ACGTN"), size=n,
                                 p=[0.24, 0.24, 0.24, 0.24, 0.04]))
        for strand in (0, 1):
            sig = seq_to_sig(seq, pore, strand)
            h_ref, y_ref = sketch_events_np(
                sig, 5, strand, 0.35, w, e, q, 6, -2.0, 2.0, fr,
                pos_offset=9,
            )
            h_nat, y_nat, sig_nat = sketch_seq_native(
                seq.encode(), pore.pore_vals, 6, strand, 5,
                0.35, w, e, q, -2.0, 2.0, fr, pos_offset=9, want_sig=True,
            )
            assert np.array_equal(sig, sig_nat)
            assert np.array_equal(h_ref, h_nat)
            assert np.array_equal(y_ref, y_nat)


def test_sort_seeds_matches_lexsort():
    rng = np.random.default_rng(31)
    n = 500_000
    h = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    y = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
    order = np.lexsort((y, h))
    h2, y2 = h.copy(), y.copy()
    assert sort_seeds_native(h2, y2, 2)
    assert np.array_equal(h[order], h2)
    assert np.array_equal(y[order], y2)

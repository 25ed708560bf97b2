"""Native C++ chain tail vs the numpy oracle."""

import numpy as np
import pytest

from rawhash_tpu._native import chain_tail_native, get_lib
from rawhash_tpu.chain.host import (
    chain_backtrack,
    compact_chains,
    lchain_dp_fill_np,
)
from test_chain import synthetic_anchors


@pytest.mark.skipif(get_lib() is None, reason="no native toolchain")
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_matches_python(seed):
    rng = np.random.default_rng(seed)
    ax, ay = synthetic_anchors(rng, n_true=90, n_noise=120)
    f, p = lchain_dp_fill_np(ax, ay, 2500, 2500, 500, 5, 200, 0.104, 0.0)
    u, v = chain_backtrack(f, p, min_cnt=2, min_sc=15, max_drop=500)
    u_s, bx, by, px, py = compact_chains(u, v, ax, ay)
    nat = chain_tail_native(f, p, ax, ay, 2, 15, 500)
    assert nat is not None
    nu, nbx, nby, npx, npy = nat
    np.testing.assert_array_equal(nu, u_s)
    np.testing.assert_array_equal(nbx, bx)
    np.testing.assert_array_equal(nby, by)
    np.testing.assert_array_equal(npx, px)
    np.testing.assert_array_equal(npy, py)


@pytest.mark.skipif(get_lib() is None, reason="no native toolchain")
def test_native_empty():
    e = np.zeros(0)
    nat = chain_tail_native(
        np.zeros(0, np.int32), np.zeros(0, np.int32),
        np.zeros(0, np.uint64), np.zeros(0, np.uint64), 2, 15, 500,
    )
    nu, nbx, nby, npx, npy = nat
    assert nu.shape[0] == 0 and nbx.shape[0] == 0

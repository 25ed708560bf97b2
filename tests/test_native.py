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


@pytest.mark.skipif(get_lib() is None, reason="no native toolchain")
@pytest.mark.parametrize("seed,do_select,hard", [
    (0, True, False), (1, True, False), (2, False, False),
    (3, True, True), (4, False, True), (5, True, False),
])
def test_native_regions_match_python(seed, do_select, hard):
    """gen_regs -> set_parent -> select_sub pipeline: the C++ port equals the
    python oracle field-for-field (reference: hit.c:100-367)."""
    from rawhash_tpu._native import chain_tail_native, gen_regions_native
    from rawhash_tpu.chain.regions import gen_regs, select_sub, set_parent

    rng = np.random.default_rng(seed)
    ax, ay = synthetic_anchors(rng, n_true=90, n_noise=160)
    f, p = lchain_dp_fill_np(ax, ay, 2500, 2500, 500, 5, 200, 0.104, 0.0)
    u_s, bx, by, px, py = chain_tail_native(f, p, ax, ay, 2, 10, 500)
    if u_s.shape[0] == 0:
        pytest.skip("no chains for this seed")
    read_hash = 0xDEADBEEF ^ seed
    mask_level, mask_len, alt_drop = 0.5, 2147483647, 0.15
    pri_ratio, best_n, min_ss = 0.8, 5, 80

    want = gen_regs(read_hash, u_s.shape[0], u_s, bx, by)
    set_parent(want, mask_level, mask_len, hard, alt_drop)
    if do_select:
        want = select_sub(want, pri_ratio, best_n, True, min_ss)

    got = gen_regions_native(
        read_hash, u_s, bx, by, mask_level, mask_len, hard, alt_drop,
        do_select, pri_ratio, best_n, True, min_ss,
    )
    assert got is not None
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for fld in ("id", "parent", "score", "score0", "hash", "cnt", "as_",
                    "rev", "rid", "rs", "re", "qs", "qe", "mlen", "blen",
                    "n_sub", "subsc", "strand_retained"):
            assert getattr(g, fld) == getattr(w, fld), (seed, fld, g, w)


@pytest.mark.skipif(get_lib() is None, reason="no native toolchain")
@pytest.mark.parametrize("seed,do_select,hard", [
    (0, True, False), (1, True, False), (2, False, False), (3, True, True),
])
def test_native_regions_summ_match_python(seed, do_select, hard):
    """The summaries-rows entry (device-tail path) equals the python
    gen_regs_from_summaries -> set_parent -> select_sub oracle."""
    from rawhash_tpu._native import chain_tail_native, gen_regions_summ_native
    from rawhash_tpu.chain.regions import (
        gen_regs_from_summaries, select_sub, set_parent,
    )

    rng = np.random.default_rng(seed)
    ax, ay = synthetic_anchors(rng, n_true=90, n_noise=160)
    f, p = lchain_dp_fill_np(ax, ay, 2500, 2500, 500, 5, 200, 0.104, 0.0)
    u_s, bx, by, px, py = chain_tail_native(f, p, ax, ay, 2, 10, 500)
    if u_s.shape[0] == 0:
        pytest.skip("no chains for this seed")
    span = 13
    # build the summary rows the device tail would emit (compact_batch
    # layout: score, cnt, key, tpos0, qpos0, tposL, qposL, mlen, blen, valid)
    starts = np.concatenate([[0], np.cumsum(u_s[:, 1])[:-1]]).astype(int)
    lasts = starts + u_s[:, 1].astype(int) - 1
    key = (
        ((bx[starts] >> np.uint64(63)) << np.uint64(31))
        | ((bx[starts] >> np.uint64(32)) & np.uint64(0x7FFFFFFF))
    ).astype(np.uint32)
    from rawhash_tpu.chain.regions import gen_regs

    oracle_regs = gen_regs(0, u_s.shape[0], u_s, bx, by)
    by_as = {r.as_: r for r in oracle_regs}
    summ = np.zeros((u_s.shape[0], 10), np.int32)
    for c in range(u_s.shape[0]):
        r = by_as[starts[c]]
        summ[c] = [
            int(u_s[c, 0]), int(u_s[c, 1]), key[c].view(np.int32),
            int(bx[starts[c]] & np.uint64(0xFFFFFFFF)),
            int(by[starts[c]] & np.uint64(0xFFFFFFFF)),
            int(bx[lasts[c]] & np.uint64(0xFFFFFFFF)),
            int(by[lasts[c]] & np.uint64(0xFFFFFFFF)),
            r.mlen, r.blen, 1,
        ]

    read_hash = 0xC0FFEE ^ seed
    mask_level, mask_len, alt_drop = 0.5, 2147483647, 0.15
    pri_ratio, best_n, min_ss = 0.8, 5, 80

    want = gen_regs_from_summaries(read_hash, summ, span)
    set_parent(want, mask_level, mask_len, hard, alt_drop)
    if do_select:
        want = select_sub(want, pri_ratio, best_n, True, min_ss)

    got = gen_regions_summ_native(
        read_hash, summ, span, mask_level, mask_len, hard, alt_drop,
        do_select, pri_ratio, best_n, True, min_ss,
    )
    assert got is not None
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for fld in ("id", "parent", "score", "score0", "hash", "cnt", "as_",
                    "rev", "rid", "rs", "re", "qs", "qe", "mlen", "blen",
                    "n_sub", "subsc", "strand_retained"):
            assert getattr(g, fld) == getattr(w, fld), (seed, fld, g, w)

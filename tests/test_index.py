import numpy as np
import pytest

from rawhash_tpu.config import IndexFlag, IndexOptions, MapOptions
from rawhash_tpu.index.build import (
    build_index_from_sequences,
    build_index_from_signals,
    update_mid_occ,
)
from rawhash_tpu.index.serialize import load_index, save_index
from rawhash_tpu.pore import seq_to_sig, synthetic_pore
from rawhash_tpu.sketch.host import sketch_events_np


def random_genome(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(0)
    pore = synthetic_pore(k=6)
    opts = IndexOptions()
    records = [("chr1", random_genome(rng, 5000)), ("chr2", random_genome(rng, 3000))]
    return records, pore, build_index_from_sequences(records, pore, opts)


def test_index_contains_all_seeds(small_index):
    records, pore, idx = small_index
    assert idx.n_seq == 2
    assert idx.seq_lens.tolist() == [5000, 3000]
    # every seed sketched from chr2 forward must be retrievable with the
    # correct (id, pos, strand)
    opts = idx.opts
    sig = seq_to_sig(records[1][1], pore, 0)
    h, y = sketch_events_np(
        sig, 1, 0, opts.diff, opts.w, opts.e, opts.q, opts.k,
        opts.fine_min, opts.fine_max, opts.fine_range,
    )
    for hh, yy in zip(h[:200], y[:200]):
        hits = idx.get(int(hh))
        assert int(yy) in set(int(v) for v in hits)


def test_index_positions_sorted_per_key(small_index):
    _, _, idx = small_index
    for ki in range(min(50, idx.keys.shape[0])):
        run = idx.pos[idx.offsets[ki] : idx.offsets[ki + 1]]
        assert (np.diff(run.astype(np.int64)) >= 0).all()


def test_cal_max_occ_quantile(small_index):
    _, _, idx = small_index
    counts = idx.counts()
    t = idx.cal_max_occ(0.5)
    # ~half of keys should have counts below the threshold
    assert t >= 1
    assert (counts < t).sum() >= counts.shape[0] * 0.4


def test_update_mid_occ_clamps(small_index):
    _, _, idx = small_index
    mo = MapOptions()
    mid = update_mid_occ(mo, idx)
    assert mid == mo.mid_occ
    assert mo.min_mid_occ <= mid <= mo.max_mid_occ
    assert mo.bw_long >= mo.bw


def test_serialize_roundtrip(tmp_path, small_index):
    _, _, idx = small_index
    p = str(tmp_path / "test.rhi.npz")
    save_index(p, idx)
    idx2 = load_index(p)
    np.testing.assert_array_equal(idx.keys, idx2.keys)
    np.testing.assert_array_equal(idx.offsets, idx2.offsets)
    np.testing.assert_array_equal(idx.pos, idx2.pos)
    assert idx2.seq_names == idx.seq_names
    assert idx2.opts.e == idx.opts.e and idx2.opts.q == idx.opts.q
    np.testing.assert_array_equal(idx2.pore.pore_vals, idx.pore.pore_vals)


def test_store_sig_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pore = synthetic_pore(k=6)
    opts = IndexOptions(flag=IndexFlag.STORE_SIG)
    records = [("c", random_genome(rng, 1000))]
    idx = build_index_from_sequences(records, pore, opts)
    assert idx.F is not None and idx.R is not None
    assert idx.F[0].shape[0] == 1000 - 6 + 1
    p = str(tmp_path / "s.rhi.npz")
    save_index(p, idx)
    idx2 = load_index(p)
    np.testing.assert_array_equal(idx.F[0], idx2.F[0])
    np.testing.assert_array_equal(idx.R[0], idx2.R[0])


def test_signal_target_index():
    rng = np.random.default_rng(2)
    opts = IndexOptions(flag=IndexFlag.SIG_TARGET)
    reads = []
    for i in range(3):
        levels = rng.normal(90, 12, size=60)
        sig = np.repeat(levels, 9) + rng.normal(0, 1, size=540)
        reads.append((f"read{i}", sig.astype(np.float32)))
    idx = build_index_from_signals(reads, None, opts)
    assert idx.sig_target
    assert idx.n_seq == 3
    assert idx.n_seeds > 0
    # all hits on forward strand for signal targets
    assert (idx.pos & np.uint64(1) == 0).all()


def test_device_lookup_matches_host(small_index):
    import jax.numpy as jnp

    from rawhash_tpu.index.device import DeviceIndex, expand_hits, lookup_counts

    _, _, idx = small_index
    didx = DeviceIndex.from_host(idx)
    rng = np.random.default_rng(3)
    # half real keys, half junk
    real = rng.choice(idx.keys, size=16)
    junk = rng.integers(0, 2**32, size=16, dtype=np.uint64).astype(np.uint32)
    queries = np.concatenate([real, junk]).reshape(1, 32)
    start, count = lookup_counts(
        didx, jnp.asarray(queries), jnp.ones((1, 32), dtype=bool)
    )
    start, count = np.asarray(start), np.asarray(count)
    for j in range(32):
        hits = idx.get(int(queries[0, j]))
        assert count[0, j] == hits.shape[0]
        if hits.shape[0]:
            got = idx.pos[start[0, j] : start[0, j] + count[0, j]]
            np.testing.assert_array_equal(got, hits)

    # expansion: every valid slot reproduces the right (id, pos<<1|strand)
    seed_c, hit_id, hit_ps, slot_valid, n_hits, ovf = expand_hits(
        didx, jnp.asarray(start), jnp.asarray(count), a_cap=256
    )
    seed_c, hit_id, hit_ps = map(np.asarray, (seed_c, hit_id, hit_ps))
    slot_valid, n_hits = np.asarray(slot_valid), np.asarray(n_hits)
    assert n_hits[0] == count.sum()
    flat_expected = []
    for j in range(32):
        for v in idx.get(int(queries[0, j])):
            flat_expected.append((j, int(v >> np.uint64(32)), int(v & np.uint64(0xFFFFFFFF))))
    got = [
        (int(seed_c[0, t]), int(hit_id[0, t]), int(hit_ps[0, t]))
        for t in range(256)
        if slot_valid[0, t]
    ]
    assert got == flat_expected

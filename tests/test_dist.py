"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import numpy as np
import pytest

from rawhash_tpu.config import IndexOptions
from rawhash_tpu.index.build import build_index_from_sequences
from rawhash_tpu.parallel.dist import make_mesh, make_sharded_seed_lookup, shard_index
from rawhash_tpu.pore import synthetic_pore


@pytest.fixture(scope="module")
def index():
    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), size=4000))
    return build_index_from_sequences(
        [("chr1", genome)], synthetic_pore(k=6), IndexOptions()
    )


def test_shard_index_partitions_everything(index):
    sh = shard_index(index, 4)
    assert sh.keys.shape[0] == 4
    total_keys = sum(int((sh.keys[s] != 0xFFFFFFFF).sum()) for s in range(4))
    assert total_keys == index.keys.shape[0]
    # every key's run is intact in its shard
    for s in range(4):
        nk = int((sh.keys[s] != 0xFFFFFFFF).sum())
        for j in range(0, nk, max(1, nk // 7)):
            key = sh.keys[s, j]
            lo, hi = sh.offsets[s, j], sh.offsets[s, j + 1]
            run = (
                sh.pos_id[s, lo:hi].astype(np.uint64) << np.uint64(32)
            ) | sh.pos_ps[s, lo:hi].astype(np.uint64)
            np.testing.assert_array_equal(run, index.get(int(key)))


def test_sharded_lookup_matches_single_device(index):
    import jax
    import jax.numpy as jnp

    from rawhash_tpu.index.device import DeviceIndex, expand_hits, lookup_counts

    n_dev = len(jax.devices())
    assert n_dev >= 4, "conftest should provide 8 virtual devices"
    mesh = make_mesh(n_dev, n_shards=2)
    sh = shard_index(index, mesh.shape["shard"])
    a_cap = 128
    lookup = make_sharded_seed_lookup(mesh, a_cap)

    rng = np.random.default_rng(1)
    b_total = mesh.shape["dp"] * 2
    s_cap = 16
    real = rng.choice(index.keys, size=(b_total, s_cap))
    queries = real.astype(np.uint32)
    queries[:, ::3] = rng.integers(0, 2**32, size=queries[:, ::3].shape).astype(
        np.uint32
    )
    qpos = np.arange(s_cap, dtype=np.int32)[None, :].repeat(b_total, 0)
    valid = np.ones((b_total, s_cap), dtype=bool)

    a_key, a_tpos, a_qpos, slot_valid, n_hits, flt = lookup(
        jnp.asarray(sh.keys), jnp.asarray(sh.offsets),
        jnp.asarray(sh.pos_id), jnp.asarray(sh.pos_ps),
        jnp.asarray(queries), jnp.asarray(qpos), jnp.asarray(valid),
        jnp.int32(1 << 30),
    )

    # single-device reference
    didx = DeviceIndex.from_host(index)
    st1, ct1 = lookup_counts(didx, jnp.asarray(queries), jnp.asarray(valid))
    seed_c, hid1, hps1, sv1, nh1, _ = expand_hits(didx, st1, ct1, a_cap)
    k1 = np.asarray(((hps1 & 1) << 31) | hid1)
    t1 = np.asarray((hps1 >> 1) & np.uint32(0x7FFFFFFF)).astype(np.int32)

    np.testing.assert_array_equal(np.asarray(n_hits), np.asarray(nh1))
    m = np.asarray(slot_valid)
    np.testing.assert_array_equal(m, np.asarray(sv1))
    np.testing.assert_array_equal(np.asarray(a_key)[m], k1[m])
    np.testing.assert_array_equal(np.asarray(a_tpos)[m], t1[m])


def test_distributed_chunk_fn_runs(index):
    import jax
    import jax.numpy as jnp

    from rawhash_tpu.parallel.dist import distributed_chunk_fn

    mesh = make_mesh(len(jax.devices()), n_shards=2)
    sh = shard_index(index, mesh.shape["shard"])
    statics = dict(
        window_length1=3, window_length2=9, threshold1=4.0, threshold2=3.5,
        peak_height=0.4, e_cap=128, min_events=5,
        diff=0.35, w=0, e=8, q=4, k=6,
        fine_min=-2.0, fine_max=2.0, fine_range=0.4,
        mid_occ=100, a_cap=128,
        max_dist_t=2500, max_dist_q=2500, bw=500, max_iter=32,
        chn_pen_gap=0.104, chn_pen_skip=0.0,
    )
    step, (dp_spec, dp1_spec) = distributed_chunk_fn(mesh, sh, statics)
    b = mesh.shape["dp"] * 2
    L = 512
    rng = np.random.default_rng(2)
    sig = jax.device_put(
        rng.normal(90, 10, size=(b, L)).astype(np.float32), dp_spec
    )
    slen = jax.device_put(np.full(b, L, dtype=np.int32), dp1_spec)
    zeros_f = jax.device_put(np.zeros(b, np.float32), dp1_spec)
    zeros_i = jax.device_put(np.zeros(b, np.int32), dp1_spec)
    out = step(sig, slen, zeros_f, zeros_f.copy(), zeros_i, zeros_i.copy())
    f = np.asarray(out[4])
    assert f.shape == (b, statics["a_cap"])
    assert np.isfinite(np.asarray(out[6])).all()

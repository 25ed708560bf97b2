"""Multi-chip distribution: hash-range index sharding + collective seed merge.

The reference is single-node with a shared in-RAM khash (SURVEY.md §2.4); the
TPU-native scale-out axis is net-new:

  * the CSR seed table is split into `n_shard` contiguous hash ranges, each
    shard's offsets rebased to its local position slice (shard_index)
  * the mesh is 2D (dp, shard): read batches ride `dp`, the table rides
    `shard`
  * seed lookup runs under shard_map: every device probes its local key
    range; per-seed hit counts and expanded anchor slots are combined with
    `psum` over the `shard` axis (each global key has exactly one owner, so
    the sums are exact merges)
  * event detection / sketching / chaining are batch-wise programs; XLA
    partitions them along `dp` from the input shardings with no collectives

With n_shard=1 this degrades to pure data parallelism; with one process per
host, `jax.distributed.initialize` + the same mesh spans hosts (ICI/DCN).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.build import RawIndex

U32_MAX = np.uint32(0xFFFFFFFF)


@dataclasses.dataclass
class ShardedIndexArrays:
    """Host-side sharded table: dim 0 is the shard axis."""

    keys: np.ndarray  # u32 [S, Kpad] sorted per shard, U32_MAX padded
    offsets: np.ndarray  # i32 [S, Kpad+1] local CSR offsets
    pos_id: np.ndarray  # u32 [S, Npad]
    pos_ps: np.ndarray  # u32 [S, Npad]
    n_seq: int


def shard_index(index: RawIndex, n_shards: int) -> ShardedIndexArrays:
    """Split the CSR table into n_shards equal-key hash ranges."""
    k = index.keys.shape[0]
    bounds = [(s * k) // n_shards for s in range(n_shards + 1)]
    kpad = max(1, max(bounds[s + 1] - bounds[s] for s in range(n_shards)))
    npad = 1
    slices = []
    for s in range(n_shards):
        lo, hi = bounds[s], bounds[s + 1]
        o = index.offsets[lo : hi + 1]
        npad = max(npad, int(o[-1] - o[0]))
        slices.append((lo, hi, o))
    keys = np.full((n_shards, kpad), U32_MAX, dtype=np.uint32)
    offsets = np.zeros((n_shards, kpad + 1), dtype=np.int32)
    pos_id = np.zeros((n_shards, npad), dtype=np.uint32)
    pos_ps = np.zeros((n_shards, npad), dtype=np.uint32)
    for s, (lo, hi, o) in enumerate(slices):
        nk = hi - lo
        keys[s, :nk] = index.keys[lo:hi]
        local = (o - o[0]).astype(np.int32)
        offsets[s, : nk + 1] = local
        offsets[s, nk + 1 :] = local[-1]
        run = index.pos[o[0] : o[-1]]
        pos_id[s, : run.shape[0]] = (run >> np.uint64(32)).astype(np.uint32)
        pos_ps[s, : run.shape[0]] = (run & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return ShardedIndexArrays(keys, offsets, pos_id, pos_ps, index.n_seq)


def _local_lookup(keys, offsets, hashes, valid):
    """Per-shard binary-search lookup (device-local view)."""
    kpad = keys.shape[0]
    i = jnp.searchsorted(keys, hashes.reshape(-1), side="left").reshape(hashes.shape)
    i_c = jnp.clip(i, 0, kpad - 1)
    found = valid & (keys[i_c] == hashes) & (hashes != jnp.uint32(0xFFFFFFFF))
    start = offsets[i_c]
    count = jnp.where(found, offsets[jnp.clip(i_c + 1, 0, kpad)] - start, 0)
    return jnp.where(found, start, 0), count.astype(jnp.int32), found


def make_sharded_seed_lookup(mesh: Mesh, a_cap: int):
    """Build the shard_map'd lookup+expand collective.

    Returns fn(keys, offsets, pos_id, pos_ps, hashes, qpos, valid, mid_occ)
    -> (anchor key/tpos/qpos planes [B, a_cap], n_hits [B], rep-filter counts)
    where index arrays are sharded over 'shard' and read arrays over 'dp'.
    """

    def body(keys, offsets, pos_id, pos_ps, hashes, qpos, valid, mid_occ):
        # per-device views: keys [1, Kpad] etc., hashes [B_dp, S]
        keys = keys[0]
        offsets = offsets[0]
        pos_id = pos_id[0]
        pos_ps = pos_ps[0]
        start, count_l, found = _local_lookup(keys, offsets, hashes, valid)
        count_g = jax.lax.psum(count_l, "shard")  # exact: one owner per key
        flt = count_g > mid_occ
        count_g = jnp.where(flt, 0, count_g)
        count_l = jnp.where(flt, 0, count_l)

        # global slot assignment (identical on every shard after psum)
        b, s = count_g.shape
        ccum = jnp.cumsum(count_g, axis=1)
        n_hits = jnp.minimum(ccum[:, -1], a_cap)
        cum_before = ccum - count_g
        slots = jax.lax.broadcasted_iota(jnp.int32, (b, a_cap), 1)
        seed_idx = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(
            ccum, slots
        ).astype(jnp.int32)
        seed_c = jnp.clip(seed_idx, 0, s - 1)
        slot_valid = slots < n_hits[:, None]
        occ = slots - jnp.take_along_axis(cum_before, seed_c, axis=1)
        mine = jnp.take_along_axis(found & (~flt), seed_c, axis=1) & slot_valid
        fetch = jnp.take_along_axis(start, seed_c, axis=1) + occ
        fetch = jnp.where(mine, fetch, 0)
        hid = jnp.where(mine, pos_id[fetch], 0)
        hps = jnp.where(mine, pos_ps[fetch], 0)
        # merge shard contributions: each slot is filled by exactly one shard
        hid = jax.lax.psum(hid, "shard")
        hps = jax.lax.psum(hps, "shard")
        a_key = ((hps & 1) << 31) | hid
        a_tpos = ((hps >> 1) & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        a_qpos = jnp.take_along_axis(qpos, seed_c, axis=1)
        return a_key, a_tpos, a_qpos, slot_valid, n_hits, flt

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("shard", None), P("shard", None), P("shard", None), P("shard", None),
            P("dp", None), P("dp", None), P("dp", None), P(),
        ),
        out_specs=(
            P("dp", None), P("dp", None), P("dp", None), P("dp", None),
            P("dp"), P("dp", None),
        ),
        check_vma=False,
    )


def make_mesh(n_devices: int | None = None, n_shards: int = 2) -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    n_shards = min(n_shards, n)
    dp = n // n_shards
    return Mesh(np.array(devs[: dp * n_shards]).reshape(dp, n_shards), ("dp", "shard"))


def distributed_chunk_fn(mesh: Mesh, sharded: ShardedIndexArrays, statics: dict):
    """The full distributed mapping step over a (dp, shard) mesh.

    sig/slen/carries ride `dp`; the seed table rides `shard`; the seed-hit
    merge is the only cross-device communication (psum over `shard`).
    Returns a jitted fn(sig, slen, carry_tuple, ev_offset) -> chained outputs.
    """
    from ..chain.device import chain_fill_batch
    from ..signal.events import NormCarry, detect_events_batch
    from ..sketch.device import sketch_batch

    a_cap = statics["a_cap"]
    lookup = make_sharded_seed_lookup(mesh, a_cap)
    shard_spec = NamedSharding(mesh, P("shard", None))
    dp_spec = NamedSharding(mesh, P("dp", None))
    dp1_spec = NamedSharding(mesh, P("dp"))

    d_keys = jax.device_put(sharded.keys, shard_spec)
    d_offsets = jax.device_put(sharded.offsets, shard_spec)
    d_pid = jax.device_put(sharded.pos_id, shard_spec)
    d_pps = jax.device_put(sharded.pos_ps, shard_spec)

    @functools.partial(jax.jit)
    def step(sig, slen, carry_sum, carry_sumsq, carry_n, ev_offset):
        carry = NormCarry(carry_sum, carry_sumsq, carry_n)
        events, n_ev, carry2 = detect_events_batch(
            sig, slen, carry,
            window_length1=statics["window_length1"],
            window_length2=statics["window_length2"],
            threshold1=statics["threshold1"], threshold2=statics["threshold2"],
            peak_height=statics["peak_height"], e_cap=statics["e_cap"],
        )
        processed = n_ev >= statics["min_events"]
        hashes, qpos, valid = sketch_batch(
            events, n_ev,
            diff=statics["diff"], w=statics["w"], e=statics["e"],
            q=statics["q"], k=statics["k"],
            fine_min=statics["fine_min"], fine_max=statics["fine_max"],
            fine_range=statics["fine_range"],
        )
        valid = valid & processed[:, None]
        a_key, a_tpos, a_qpos, slot_valid, n_hits, flt = lookup(
            d_keys, d_offsets, d_pid, d_pps, hashes, qpos,
            valid, jnp.int32(statics["mid_occ"]),
        )
        a_qpos = a_qpos + ev_offset[:, None]
        span = statics["k"] + statics["e"] - 1
        s_key, s_tpos, s_qpos = jax.lax.sort(
            (
                jnp.where(slot_valid, a_key, jnp.uint32(0xFFFFFFFF)),
                jnp.where(slot_valid, a_tpos, jnp.int32(0x7FFFFFFF)),
                a_qpos,
            ),
            dimension=1, num_keys=2, is_stable=True,
        )
        f, p = chain_fill_batch(
            s_key, s_tpos, s_qpos, n_hits.astype(jnp.int32),
            q_span=span,
            max_dist_t=statics["max_dist_t"], max_dist_q=statics["max_dist_q"],
            bw=statics["bw"], max_iter=statics["max_iter"],
            chn_pen_gap=statics["chn_pen_gap"],
            chn_pen_skip=statics["chn_pen_skip"],
        )
        return s_key, s_tpos, s_qpos, n_hits, f, p, n_ev, carry2, ev_offset + n_ev

    return step, (dp_spec, dp1_spec)

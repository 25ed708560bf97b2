"""Device-resident index and batched seed lookup.

The reference probes a khash per query seed (reference: ri_idx_get,
rindex.c:497-514).  On TPU the table is three flat HBM arrays and lookup is a
vectorized binary search over the sorted key array (O(log K) gathers per
query, thousands of queries per batch), followed by CSR expansion of the
variable-length position runs into a fixed-capacity anchor buffer — masks
instead of pointers, static shapes throughout.

Seed locations are carried as two uint32 planes (id | pos<<1|strand) because
TPUs have no native 64-bit integers.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .build import RawIndex


@dataclasses.dataclass(frozen=True)
class DeviceIndex:
    keys: jnp.ndarray  # uint32 [K] sorted
    offsets: jnp.ndarray  # int32 [K+1]
    pos_id: jnp.ndarray  # uint32 [N]: target id (bit31 unused)
    pos_ps: jnp.ndarray  # uint32 [N]: pos<<1 | strand
    n_seq: int

    @staticmethod
    def from_host(index: RawIndex, device=None) -> "DeviceIndex":
        put = lambda a: jax.device_put(jnp.asarray(a), device)
        pos = index.pos
        return DeviceIndex(
            keys=put(index.keys.astype(np.uint32)),
            offsets=put(index.offsets.astype(np.int32)),
            pos_id=put((pos >> np.uint64(32)).astype(np.uint32)),
            pos_ps=put((pos & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            n_seq=index.n_seq,
        )

    def tree_flatten(self):
        return (
            (self.keys, self.offsets, self.pos_id, self.pos_ps),
            (self.n_seq,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n_seq=aux[0])


jax.tree_util.register_pytree_node(
    DeviceIndex, DeviceIndex.tree_flatten, DeviceIndex.tree_unflatten
)


def lookup_counts(idx: DeviceIndex, hashes: jnp.ndarray, valid: jnp.ndarray):
    """Batched key lookup: hashes [B,S] uint32 -> (start [B,S] i32, count
    [B,S] i32).  count==0 for misses/invalid seeds."""
    k = idx.keys.shape[0]
    i = jnp.searchsorted(idx.keys, hashes.reshape(-1), side="left").reshape(
        hashes.shape
    )
    i_c = jnp.clip(i, 0, max(k - 1, 0))
    found = valid & (i < k)
    if k > 0:
        found = found & (idx.keys[i_c] == hashes)
    start = idx.offsets[i_c]
    count = jnp.where(found, idx.offsets[jnp.clip(i_c + 1, 0, k)] - start, 0)
    return jnp.where(found, start, 0), count.astype(jnp.int32)


def expand_hits(
    idx: DeviceIndex,
    start: jnp.ndarray,  # i32 [B, S]
    count: jnp.ndarray,  # i32 [B, S] (already occurrence-filtered)
    a_cap: int,
):
    """CSR expansion of per-seed hit runs into fixed-size anchor slots.

    Returns per-slot (seed_idx [B,A], hit_id [B,A], hit_ps [B,A],
    slot_valid [B,A], n_hits [B], overflow [B]).  Slot n belongs to the seed
    whose cumulative-count interval contains n; the hit is the
    (n - cum_before)-th occurrence of that seed.
    """
    b, s = start.shape
    ccum = jnp.cumsum(count, axis=1)  # inclusive
    n_hits = ccum[:, -1]
    cum_before = ccum - count
    slots = jax.lax.broadcasted_iota(jnp.int32, (b, a_cap), 1)
    # seed for slot n: first seed with ccum > n  (searchsorted right)
    seed_idx = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(
        ccum, slots
    ).astype(jnp.int32)
    slot_valid = slots < jnp.minimum(n_hits, a_cap)[:, None]
    seed_c = jnp.clip(seed_idx, 0, s - 1)
    occ = slots - jnp.take_along_axis(cum_before, seed_c, axis=1)
    fetch = jnp.take_along_axis(start, seed_c, axis=1) + occ
    fetch = jnp.where(slot_valid, fetch, 0)
    hit_id = idx.pos_id[fetch]
    hit_ps = idx.pos_ps[fetch]
    overflow = jnp.maximum(n_hits - a_cap, 0)
    return seed_c, hit_id, hit_ps, slot_valid, jnp.minimum(n_hits, a_cap), overflow

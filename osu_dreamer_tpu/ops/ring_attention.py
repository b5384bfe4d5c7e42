"""Ring attention: sequence-parallel attention over a mesh axis.

The reference handles long songs purely structurally (27x latent compression
+ windowing, SURVEY.md §5 long-context); full-song attention at inference is
one sequence on one device. This module is the scale-out path beyond a chip:
shard the LENGTH axis over a mesh axis and stream k/v blocks around the ring
with ``ppermute`` while flash-style streaming softmax keeps O(L_shard) memory
per device. Attention here is non-causal (beatmap time context is
bidirectional), so every device consumes every block symmetrically.

Usage (inside shard_map over axis "sp"):

    out = ring_attention(q, k, v, axis_name="sp")

q/k/v: (B, L_shard, H, D) per device; out matches q. Softmax statistics are
fp32. With mesh size 1 this reduces to plain attention, so callers can pass
the same code path a trivial mesh (a mesh change, not a rewrite).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _block_attend(q, k, v, scale):
    """unnormalized block attention: returns (o_block, row_max, row_sumexp)

    q: (B, Lq, H, D); k/v: (B, Lk, H, D) -> o: (B, Lq, H, D) fp32
    """
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    m = s.max(axis=-1)  # (B, H, Lq)
    p = jnp.exp(s - m[..., None])
    l = p.sum(axis=-1)  # (B, H, Lq)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v).astype(jnp.float32)
    return o, m, l


def ring_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, axis_name: str
) -> jnp.ndarray:
    """sequence-parallel non-causal attention; call under shard_map with the
    length axis sharded over `axis_name`"""
    n_dev = jax.lax.axis_size(axis_name)
    scale = 1.0 / (q.shape[-1] ** 0.5)

    o, m, l = _block_attend(q, k, v, scale)

    if n_dev == 1:
        return (o / l.transpose(0, 2, 1)[..., None]).astype(q.dtype)

    ring = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step(carry, _):
        o, m, l, k_blk, v_blk = carry
        # pass our current k/v block to the next device, receive the previous
        k_blk = jax.lax.ppermute(k_blk, axis_name, ring)
        v_blk = jax.lax.ppermute(v_blk, axis_name, ring)
        o_new, m_new, l_new = _block_attend(q, k_blk, v_blk, scale)

        # streaming softmax merge of (o, m, l) with the new block stats
        m_all = jnp.maximum(m, m_new)
        w_old = jnp.exp(m - m_all)
        w_new = jnp.exp(m_new - m_all)
        o = o * w_old.transpose(0, 2, 1)[..., None] + o_new * w_new.transpose(0, 2, 1)[..., None]
        l = l * w_old + l_new * w_new
        return (o, m_all, l, k_blk, v_blk), None

    (o, m, l, _, _), _ = jax.lax.scan(step, (o, m, l, k, v), None, length=n_dev - 1)
    return (o / l.transpose(0, 2, 1)[..., None]).astype(q.dtype)


def halo_exchange(x: jnp.ndarray, radius: int, axis_name: str) -> jnp.ndarray:
    """(B, L_shard, C) -> (B, L_shard + 2*radius, C): prepend/append `radius`
    REAL frames from the ring neighbors so sharded convolutions see across
    shard boundaries; the global first/last shards get zeros (matching the
    unsharded 'SAME' zero padding). Call under shard_map."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    assert x.shape[1] >= radius, (
        f"halo radius {radius} exceeds the {x.shape[1]}-frame local shard — "
        "lower parallel.sp (or raise seq_len) so each shard spans at least "
        "the conv receptive radius"
    )
    fwd = [(i, (i + 1) % n) for i in range(n)]   # my tail -> next's head halo
    bwd = [((i + 1) % n, i) for i in range(n)]   # my head -> prev's tail halo
    from_prev = jax.lax.ppermute(x[:, -radius:], axis_name, fwd)
    from_next = jax.lax.ppermute(x[:, :radius], axis_name, bwd)
    from_prev = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
    from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=1)


def sequence_parallel_attention(q, k, v, mesh, axis_name: str = "sp"):
    """convenience wrapper: shard (B, L, H, D) tensors on L over `axis_name`
    of `mesh` and run ring attention; returns the unsharded result"""
    from jax.sharding import PartitionSpec as P

    from jax.experimental.shard_map import shard_map

    spec = P(None, axis_name, None, None)
    fn = shard_map(
        partial(ring_attention, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)

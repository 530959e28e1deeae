"""Cross-shard combine helpers for edge-partitioned execution.

The ops in this package express per-node aggregates as segment reductions
or scatters into the fixed-K per-node tables.  Under the shard_map edge
partition (parallel/edge_shard.py) each shard holds a contiguous block of
the directed-edge arrays while node arrays and tables stay replicated, so
every such aggregate becomes a LOCAL partial followed by one explicit
collective over the "edge" mesh axis — the boundary-node state exchange of
SURVEY.md section 5 (the reference has no analog: it is a single-process
loop, clustering.py:181).

With axis_name=None (the single-device / auto-SPMD path) these are
identity functions, so the ops share one code path.

Exactness notes:
  * allsum on one-writer-per-slot scatters (the (N, K) table fills) is
    exact: every (node, slot) cell is written by exactly one edge
    globally, so the psum adds its value to zeros.
  * allsum on segment sums reassociates float addition at shard
    boundaries (partial sums per shard, then shard-order adds): results
    can differ from the single-device segment_sum by last-ulp rounding
    for nodes whose edges span shards.  Masks/integers stay exact.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def allsum(x: jax.Array, axis_name: Optional[str]) -> jax.Array:
    """Sum partial per-node aggregates across edge shards (identity when
    unsharded)."""
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


def allor(x: jax.Array, axis_name: Optional[str]) -> jax.Array:
    """OR partial boolean tables across edge shards (identity when
    unsharded); exact for one-writer-per-slot scatters.  Rides a u8
    all-reduce — 4x fewer bytes than int32 for the (N, K) tables."""
    if axis_name is None:
        return x
    return jax.lax.psum(x.astype(jnp.uint8), axis_name) > 0


def owner_shards(n_rows: int, axis_name: Optional[str]) -> bool:
    """True when the node-owner exchange applies: sharded execution with
    the node axis divisible by the shard count (the psum_scatter tiling
    requirement).  axis_size is static under shard_map, so this is a
    trace-time decision."""
    if axis_name is None:
        return False
    return n_rows % jax.lax.axis_size(axis_name) == 0


def ownsum(x: jax.Array, axis_name: str) -> jax.Array:
    """Sum partial per-node aggregates across shards and keep only THIS
    shard's contiguous row block (node-owner partition): the first half of
    an all-reduce.  Combined with gathering only the (much narrower)
    per-node RESULTS computed on the owner, this replaces the (N, K)
    f32 table all-reduces of the naive exchange — see
    priors.prior_reweight."""
    return jax.lax.psum_scatter(x, axis_name, scatter_dimension=0,
                                tiled=True)


def ownor(x: jax.Array, axis_name: str) -> jax.Array:
    """Boolean-table variant of ownsum (u8 on the wire)."""
    return jax.lax.psum_scatter(x.astype(jnp.uint8), axis_name,
                                scatter_dimension=0, tiled=True) > 0


def gather_rows(x: jax.Array, axis_name: str) -> jax.Array:
    """Re-assemble owner-computed per-node rows on every shard: the
    second half of the exchange, sized by the RESULT width, not the
    table width."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def owner_block(x: jax.Array, axis_name: str) -> jax.Array:
    """This shard's contiguous row block of a REPLICATED array (static
    caches like in_src_layer entering owner-space compute)."""
    rows = x.shape[0] // jax.lax.axis_size(axis_name)
    start = jax.lax.axis_index(axis_name) * rows
    return jax.lax.dynamic_slice_in_dim(x, start, rows, axis=0)


def owner_block_interleaved(x: jax.Array, axis_name: str) -> jax.Array:
    """Rows {i : i % D == axis_index} of a replicated array, packed as a
    contiguous (rows, ...) block (row r <-> node r*D + axis_index) — the
    node layout of the all_to_all owner routing
    (parallel/edge_shard.OwnerRouting)."""
    d = jax.lax.axis_size(axis_name)
    rows = x.shape[0] // d
    xr = jnp.moveaxis(x.reshape((rows, d) + x.shape[1:]), 1, 0)
    return jax.lax.dynamic_index_in_dim(
        xr, jax.lax.axis_index(axis_name), 0, keepdims=False)


def route_to_owners(values: jax.Array, owner: jax.Array, pos: jax.Array,
                    bucket: int, axis_name: str) -> jax.Array:
    """all_to_all of per-edge VALUES to their head-node's owner shard.

    values: (E_loc, W) local edge payloads; owner/pos: (E_loc,) static
    routing (destination shard, position in the send bucket; -1 = not
    routed).  Returns (D, bucket, W) where block s holds what shard s
    sent here.  The wire carries only real edge payloads (padded to the
    bucket capacity) — E*W floats total instead of the (N, K) tables the
    dense reduce-scatter combine moves.
    """
    d = jax.lax.axis_size(axis_name)
    ok = (owner >= 0) & (pos >= 0) & (pos < bucket)
    idx = jnp.where(ok, owner * bucket + pos, d * bucket)
    send = jnp.zeros((d * bucket, values.shape[-1]), values.dtype
                     ).at[idx].set(values, mode="drop")
    send = send.reshape(d, bucket, values.shape[-1])
    return jax.lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0,
                              tiled=True)

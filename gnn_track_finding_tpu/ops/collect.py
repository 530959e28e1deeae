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

"""Device connected-components via min-label propagation + pointer jumping.

The reference extracts components with nx.weakly_connected_components
(event_conversion.py:84, extract_track_candidates.py:332-346); its own
parallelism sketch is the convergence-based tag propagation in
tag_propagation/tag_propagation.py:128-167.  Here the same idea runs as a
lax.while_loop: each round every node takes the min label over its incident
(still-masked, still-active) edges in both directions, then labels are
path-compressed (label <- label[label]) so convergence is O(log n) rounds
on typical track graphs rather than O(diameter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def connected_components(src: jax.Array, dst: jax.Array, edge_ok: jax.Array,
                         node_ok: jax.Array) -> jax.Array:
    """Min-node-index component label per node.

    Masked-out nodes keep their own index as label.  Edge direction is
    ignored (weak connectivity).
    """
    n = node_ok.shape[0]
    init = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n)

    def body(state):
        labels, _ = state
        le = jnp.minimum(labels[src], labels[dst])
        le = jnp.where(edge_ok, le, big)
        new = labels
        new = new.at[src].min(le)
        new = new.at[dst].min(le)
        # pointer jumping / path compression (two hops per round)
        new = new[new]
        new = new[new]
        return new, jnp.any(new != labels)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return jnp.where(node_ok, labels, init)

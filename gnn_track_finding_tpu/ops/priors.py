"""Mixture weights, layer priors, degrees and Gaussian-mixture reweighting.

Vectorised re-designs of the reference's graph-walking helpers:

  * compute_mixture_weights  (helper.py:76-96)   -> segment count + gather
  * compute_prior_probabilities (helper.py:30-63) -> segment count over a
    (node, src-layer) composite key
  * query_node_degree_in_edges (helper.py:67-73) -> segment sum of active
  * reweight + calculate_side_norm_factor (helper.py:99-225) -> edge-wise
    renormalisation with a per-node distinct-coordinate count done on the
    fixed-K in-edge table.

Dict-membership semantics: an edge e carries a SEED state whenever it
exists (edge_mask), and an UPDATED state when has_updated[e] — matching the
reference's 'track_state_estimates' / 'updated_track_states' dicts.  Stale
entries of deactivated edges keep their previous prior/weight values, as in
the reference (only active edges are reassigned).

Deviation from the reference (documented): helper.py:129-139 decides each
side's lr_layer_norm with a stale loop variable ``neighbour_num`` (the last
neighbour iterated), and helper.py:199-200 uses ``=`` where ``+=`` was
meant in the confusion-matrix counters.  We implement the intended
semantics: an active edge gets its side's distinct-coordinate norm; the
counters accumulate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnn_track_finding_tpu.config import PipelineConfig
from gnn_track_finding_tpu.graph.state import GraphState
from gnn_track_finding_tpu.ops import collect, gtools


def _state_membership(g: GraphState, use_updated: bool) -> jax.Array:
    return g.has_updated if use_updated else g.edge_mask


def compute_mixture_weights(g: GraphState, use_updated: bool,
                            axis_name=None) -> GraphState:
    """weight = 1 / len(state dict at the head node) (helper.py:88-94)."""
    member = _state_membership(g, use_updated)
    n = g.num_padded_nodes
    count = collect.allsum(
        jax.ops.segment_sum(member.astype(g.dtype), g.dst, n), axis_name)
    w = 1.0 / jnp.maximum(count, 1.0)
    new_w = jnp.where(member, gtools.gather1d(w, g.dst), 0.0)
    if use_updated:
        return g.replace(upd_weight=new_w)
    return g.replace(seed_weight=new_w)


def compute_prior_probabilities(g: GraphState, use_updated: bool,
                                axis_name=None) -> GraphState:
    """prior = 1 / (#active same-src-layer edges into the head node)
    (helper.py:43-63); inactive entries keep their previous prior."""
    member = _state_membership(g, use_updated)
    eligible = member & g.active & g.edge_mask
    key = g.dst * g.n_layers + g.e_src_layer
    num_seg = g.num_padded_nodes * g.n_layers
    count = collect.allsum(
        jax.ops.segment_sum(eligible.astype(g.dtype), key, num_seg),
        axis_name)
    count_e = gtools.table_lookup(count.reshape(-1, g.n_layers),
                                  g.dst, g.e_src_layer)
    prior = 1.0 / jnp.maximum(count_e, 1.0)
    old = g.upd_prior if use_updated else g.seed_prior
    new = jnp.where(eligible, prior, old)
    if use_updated:
        return g.replace(upd_prior=new)
    return g.replace(seed_prior=new)


def update_degrees(g: GraphState, axis_name=None) -> GraphState:
    """Active in-degree per node (helper.py:67-73)."""
    act = (g.edge_mask & g.active).astype(jnp.int32)
    deg = collect.allsum(
        jax.ops.segment_sum(act, g.dst, g.num_padded_nodes), axis_name)
    return g.replace(degree=deg)


def _side_norms(g: GraphState, axis_name=None) -> jax.Array:
    """Per-edge distinct-x count of same-side active updated in-edges.

    Reference: calculate_side_norm_factor (helper.py:99-139).  The side of
    edge e=(src->dst) is 'left' when x_src < x_dst; the norm is the number
    of DISTINCT x coordinates among the head's active updated in-senders on
    that side.  Computed as a masked first-occurrence count over the
    fixed-K in-edge table (scatter + fused (N, K, K) compare-reduce).
    """
    ok = g.has_updated & g.active & g.edge_mask
    # neighbour x comes from the updated dict's coordinate snapshot
    # (helper.py:113 reads updated_track_states[...]['xyzr'][0]); node x
    # is the LIVE GNN_Measurement coordinate (helper.py:104), which
    # extraction's close-proximity merge may have mutated.
    xs = g.upd_xyzr[:, 0]
    node_x = g.gnn_xyzr[:, 0]
    left = xs < gtools.gather1d(node_x, g.dst)

    # slot-space distinct-count: ok flags and snapshot x scatter into the
    # in-table (scatters are tile-efficient; under the edge partition each
    # (node, slot) cell has exactly one writer, so the cross-shard combine
    # is an exact psum).
    ok_slot = collect.allor(
        jnp.zeros(g.in_edges.shape, bool).at[g.dst, g.slot_in].max(ok),
        axis_name)
    # route non-ok edges out of bounds so their writes are DROPPED: padded
    # edges all carry (dst=0, slot_in=0) and a plain duplicate-index .set
    # would race their 0.0 against the real edge occupying that slot
    row = jnp.where(ok, g.dst, g.in_edges.shape[0])
    x_slot = collect.allsum(
        jnp.zeros(g.in_edges.shape, g.dtype).at[row, g.slot_in].set(
            xs, mode="drop"),
        axis_name)
    left_slot = x_slot < node_x[:, None]
    counts = _distinct_counts(ok_slot, x_slot, left_slot, g.dtype)  # (N, 2)
    side = jnp.where(left, 0, 1)
    norms = jnp.where(ok, gtools.table_lookup(counts, g.dst, side), 1.0)
    return jnp.maximum(norms, 1.0)


def _distinct_counts(ok_slot: jax.Array, x_slot: jax.Array,
                     left_slot: jax.Array, dtype) -> jax.Array:
    """(N, 2) distinct-x count per (node, side) — masked first-occurrence
    count over (K, K) slot pairs, exact equality on raw values
    (helper.py:127-134 len(set(x)) semantics)."""
    k_tab = x_slot.shape[1]
    eqx = x_slot[:, :, None] == x_slot[:, None, :]
    same_side = left_slot[:, :, None] == left_slot[:, None, :]
    earlier = jnp.tril(jnp.ones((k_tab, k_tab), bool), k=-1)   # j < i
    dup_before = jnp.any(
        eqx & same_side & ok_slot[:, None, :] & earlier[None], axis=2)
    first = ok_slot & ~dup_before
    return jnp.stack([
        jnp.sum(first & left_slot, axis=1),
        jnp.sum(first & ~left_slot, axis=1)], axis=1).astype(dtype)


def prior_reweight(g: GraphState, cfg: PipelineConfig,
                   axis_name=None) -> GraphState:
    """Fused prior recompute + Gaussian-mixture reweight — one pass of the
    reference's back-to-back calls (extrapolate_merged_states.py:554-559).

    The prior's eligibility set (helper.py:49-52) and the reweight's
    membership (helper.py:158-161) are the SAME predicate
    (updated & active & existing), so the pair shares ONE in-table scatter
    pass and ONE packed node-table row gather:

      * prior per-(node, src-layer) counts reduce over the scattered
        ok table against the static in_src_layer cache — no second
        segment scatter (the (N*L)-segment scatter + (E, L) row gather
        was ~8 ms/pass at full event);
      * denom, node x, and the side-norm distinct counts ride the same
        packed (N, L+4) table, gathered once per edge.

    Numerics are identical to compute_prior_probabilities -> reweight
    (integer counts; same denom segment_sum; same distinct-count block) —
    asserted in tests/test_extrapolate.py.
    """
    member = g.has_updated & g.active & g.edge_mask
    n = g.num_padded_nodes
    n_l = g.n_layers
    dtype = g.dtype

    # --- one shared scatter pass into the in-edge table ---
    ok_slot = collect.allor(
        jnp.zeros(g.in_edges.shape, bool).at[g.dst, g.slot_in].max(member),
        axis_name)
    xs = g.upd_xyzr[:, 0]
    row = jnp.where(member, g.dst, g.in_edges.shape[0])
    x_slot = collect.allsum(
        jnp.zeros(g.in_edges.shape, g.dtype).at[row, g.slot_in].set(
            xs, mode="drop"),
        axis_name)

    # --- per-(node, layer) eligible counts from the static layer cache ---
    count_nl = jnp.stack(
        [jnp.sum(ok_slot & (g.in_src_layer == l), axis=1)
         for l in range(n_l)], axis=1).astype(dtype)           # (N, L)

    # --- side-norm distinct counts ---
    node_x = g.gnn_xyzr[:, 0]
    left_slot = x_slot < node_x[:, None]
    counts2 = _distinct_counts(ok_slot, x_slot, left_slot, dtype)

    # --- mixture denominator (weight-dependent -> segment sum) ---
    wl = jnp.where(member, g.upd_weight * g.upd_likelihood, 0.0)
    denom = collect.allsum(jax.ops.segment_sum(wl, g.dst, n), axis_name)

    # --- ONE packed node-table row gather for everything per-edge ---
    # per-edge selects ride one-hot multiply-reduce / where-selects: a
    # dynamic take_along_axis on the minor axis lowers to per-element
    # gathers (measured 11 ms vs 1.5 ms for the whole block —
    # tools/profile_lookup_forms.py)
    table = jnp.concatenate([count_nl, denom[:, None], node_x[:, None],
                             counts2], axis=1)                 # (N, L+4)
    pe = table[g.dst]                                          # (E, L+4)
    count_e = gtools.onehot_select(pe[:, :n_l], g.e_src_layer)
    denom_e = pe[:, n_l]
    node_x_e = pe[:, n_l + 1]

    prior = 1.0 / jnp.maximum(count_e, 1.0)
    new_prior = jnp.where(member, prior, g.upd_prior)

    left = xs < node_x_e
    norms = jnp.where(
        member,
        jnp.where(left, pe[:, n_l + 2], pe[:, n_l + 3]),
        1.0)
    norms = jnp.maximum(norms, 1.0)

    from gnn_track_finding_tpu.ops import linalg
    w_new = wl * new_prior / jnp.maximum(denom_e, linalg.tiny(dtype)) / norms
    new_weight = jnp.where(member, w_new, g.upd_weight)
    drop = member & (w_new < cfg.reweight_threshold)
    return g.replace(upd_prior=new_prior, upd_weight=new_weight,
                     active=g.active & ~drop)


def reweight(g: GraphState, cfg: PipelineConfig,
             axis_name=None) -> GraphState:
    """Gaussian-mixture reweighting with threshold deactivation
    (helper.py:143-201): w' = w * L * prior / sum(w * L) / side_norm, then
    deactivate edges with w' < reweight_threshold."""
    member = g.has_updated & g.active & g.edge_mask
    n = g.num_padded_nodes
    wl = jnp.where(member, g.upd_weight * g.upd_likelihood, 0.0)
    denom = collect.allsum(jax.ops.segment_sum(wl, g.dst, n), axis_name)
    norms = _side_norms(g, axis_name)
    denom_e = gtools.gather1d(denom, g.dst)
    from gnn_track_finding_tpu.ops import linalg
    w_new = wl * g.upd_prior / jnp.maximum(denom_e, linalg.tiny(g.dtype)) / norms
    new_weight = jnp.where(member, w_new, g.upd_weight)
    drop = member & (w_new < cfg.reweight_threshold)
    return g.replace(upd_weight=new_weight, active=g.active & ~drop)


def initialize_edge_activation(g: GraphState) -> GraphState:
    """All existing edges start activated (helper.py:24-25)."""
    return g.replace(active=g.edge_mask)

"""Host-side ingest: raw event arrays -> padded GraphState.

Replaces the reference's pandas/NetworkX construction path
(helper.py:465-545, event_conversion.py:62-101) with array building:
dedup + bidirectional expansion of the undirected edge list
(helper.py:510-518), union-find connected components
(event_conversion.py:84), dense layer/particle re-indexing, fixed-K
in/out-edge tables in CSV insertion order (reproducing NetworkX adjacency
iteration order), and padding to static shape buckets so jitted programs
recompile only across bucket boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from gnn_track_finding_tpu.config import PipelineConfig
from gnn_track_finding_tpu.graph.nxorder import RefOrderTracker
from gnn_track_finding_tpu.graph.state import GraphState


@dataclasses.dataclass
class HostEvent:
    """Host-only per-event data (evaluation, provenance); never on device."""
    node_ids: np.ndarray            # original node_idx per dense node
    particle_ids: np.ndarray        # original (int64) particle id per dense truth idx
    # node -> hits dissociation (reference 'hit_dissociation', helper.py:474-478)
    hit_ids: Optional[List[np.ndarray]] = None
    hit_particle_ids: Optional[List[np.ndarray]] = None
    module_ids: Optional[List[np.ndarray]] = None
    # reference NetworkX-order replica (graph/nxorder.py) — the driver
    # feeds it each extraction to reproduce the GNN-coordinate leak
    tracker: Optional[object] = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n)

    def find(self, i: int) -> int:
        p = self.parent
        root = i
        while p[root] != root:
            root = p[root]
        while p[i] != root:
            p[i], i = root, p[i]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def connected_components_host(n: int, pairs: np.ndarray) -> np.ndarray:
    """Union-find CCA over undirected pairs -> min-node-labelled components."""
    uf = UnionFind(n)
    for u, v in pairs:
        uf.union(int(u), int(v))
    return np.array([uf.find(i) for i in range(n)], dtype=np.int32)


def build_graph_state(
    xyzr: np.ndarray,               # (n, 4) float
    vivl: np.ndarray,               # (n, 2) int  (volume_id, in_volume_layer_id)
    truth_particle: np.ndarray,     # (n,) original particle ids (any int dtype)
    edge_pairs: np.ndarray,         # (m, 2) undirected pairs in file order
    cfg: PipelineConfig,
    dtype=jnp.float64,
    host_extra: Optional[dict] = None,
) -> tuple[GraphState, HostEvent]:
    n = xyzr.shape[0]

    # -- dedupe unordered pairs, keep first occurrence (helper.py:510-518:
    #    re-adding an existing NetworkX edge is a no-op) --
    a = np.minimum(edge_pairs[:, 0], edge_pairs[:, 1])
    b = np.maximum(edge_pairs[:, 0], edge_pairs[:, 1])
    key = a.astype(np.int64) * n + b
    _, first_idx = np.unique(key, return_index=True)
    keep = np.sort(first_idx)
    pairs = edge_pairs[keep]
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]  # defensive: drop self-loops

    m = pairs.shape[0]
    e = 2 * m
    # directed edges in insertion order: 2i = (u->v), 2i+1 = (v->u)
    src = np.empty(e, np.int32)
    dst = np.empty(e, np.int32)
    src[0::2], dst[0::2] = pairs[:, 0], pairs[:, 1]
    src[1::2], dst[1::2] = pairs[:, 1], pairs[:, 0]
    # reverse of edge e is e ^ 1 by this interleaving (relied on by the
    # pair-swap weight lookup, ops/extrapolate.py)

    # -- components (event_conversion.py:84) --
    component = connected_components_host(n, pairs)

    # -- dense layer index over in_volume_layer_id (helper.py:53) --
    layers = np.unique(vivl[:, 1])
    layer_map = {int(l): i for i, l in enumerate(layers)}
    layer_idx = np.array([layer_map[int(l)] for l in vivl[:, 1]], np.int32)

    # -- dense truth particle index (original ids exceed int32) --
    uniq_pids, truth_idx = np.unique(truth_particle, return_inverse=True)
    truth_idx = truth_idx.astype(np.int32)

    # -- fixed-K edge tables in insertion order --
    in_deg = np.bincount(dst, minlength=n)
    out_deg = np.bincount(src, minlength=n)
    max_deg = int(max(in_deg.max() if n else 0, out_deg.max() if n else 0))
    k = cfg.max_node_degree
    while k < max_deg:
        k *= 2
    def edge_table(keys: np.ndarray):
        tab = np.full((n, k), -1, np.int32)
        slot = np.zeros(e, np.int32)
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        pos = np.arange(e) - np.searchsorted(sk, sk, side="left")
        tab[sk, pos] = order.astype(np.int32)
        slot[order] = pos.astype(np.int32)
        return tab, slot

    in_tab, slot_in = edge_table(dst)
    out_tab, slot_out = edge_table(src)

    # mirror edge per directed edge (reference tau-pairing defect,
    # helper.py:349-429): for each node, the neighbour iteration order is
    # Python set() order over ORIGINAL node ids inserted predecessors-
    # then-successors (set(nx.all_neighbors(G, node)) in the reference);
    # the k-th neighbour's seed state borrows tau from neighbour d-1-k.
    orig_ids = (host_extra or {}).get("node_ids")
    if orig_ids is None:
        orig_ids = np.arange(n, dtype=np.int64)
    orig_of = np.asarray(orig_ids, np.int64)
    dense_of = {int(o): i for i, o in enumerate(orig_of)}
    mirror = np.arange(e, dtype=np.int32)
    tracker = RefOrderTracker(n, src, dst, in_tab, out_tab, orig_of)
    orders = tracker.neighbour_orders()
    for node in range(n):
        ordered = orders[node]
        d = len(ordered)
        if d < 2:
            continue
        in_edge_of = {int(src[ei]): ei for ei in in_tab[node] if ei >= 0}
        for k_pos, oid in enumerate(ordered):
            a_ = dense_of[oid]
            b_ = dense_of[ordered[d - 1 - k_pos]]
            ea = in_edge_of.get(a_)
            eb = in_edge_of.get(b_)
            if ea is not None and eb is not None:
                mirror[ea] = eb

    # -- pad to buckets --
    n_pad = _round_up(max(n, 1), cfg.node_bucket)
    e_pad = _round_up(max(e, 1), cfg.edge_bucket)

    def padn(x, fill=0):
        out = np.full((n_pad,) + x.shape[1:], fill, x.dtype)
        out[:n] = x
        return out

    def pade(x, fill=0):
        out = np.full((e_pad,) + x.shape[1:], fill, x.dtype)
        out[:e] = x
        return out

    node_mask = np.zeros(n_pad, bool)
    node_mask[:n] = True
    edge_mask = np.zeros(e_pad, bool)
    edge_mask[:e] = True

    f = lambda *s: jnp.zeros(s, dtype)

    g = GraphState(
        n_nodes=n, n_edges=e, max_degree=k, n_layers=len(layers),
        node_mask=jnp.asarray(node_mask),
        xyzr=jnp.asarray(padn(xyzr.astype(np.float64)), dtype),
        gnn_xyzr=jnp.asarray(padn(xyzr.astype(np.float64)), dtype),
        vivl=jnp.asarray(padn(vivl.astype(np.int32))),
        layer_idx=jnp.asarray(padn(layer_idx)),
        truth=jnp.asarray(padn(truth_idx, fill=-1)),
        component=jnp.asarray(padn(component)),
        degree=jnp.zeros(n_pad, jnp.int32),
        has_merged=jnp.zeros(n_pad, bool),
        merged_state=f(n_pad, 3), merged_cov=f(n_pad, 3, 3),
        merged_prior=f(n_pad), grad_stats=f(n_pad, 4),
        edge_mask=jnp.asarray(edge_mask),
        src=jnp.asarray(pade(src)), dst=jnp.asarray(pade(dst)),
        active=jnp.asarray(edge_mask),
        seed_sv=f(e_pad, 3), seed_cov=f(e_pad, 3, 3),
        seed_joint=f(e_pad, 3), seed_joint_cov=f(e_pad, 3, 3),
        seed_prior=f(e_pad), seed_weight=f(e_pad),
        has_updated=jnp.zeros(e_pad, bool),
        upd_sv=f(e_pad, 3), upd_cov=f(e_pad, 3, 3),
        upd_joint=f(e_pad, 3), upd_joint_cov=f(e_pad, 3, 3),
        upd_prior=f(e_pad), upd_weight=f(e_pad), upd_likelihood=f(e_pad),
        upd_xyzr=f(e_pad, 4),
        in_edges=jnp.asarray(padn(in_tab, fill=-1)),
        out_edges=jnp.asarray(padn(out_tab, fill=-1)),
        slot_in=jnp.asarray(pade(slot_in)),
        slot_out=jnp.asarray(pade(slot_out)),
        e_xyzr=jnp.asarray(
            pade(np.concatenate([xyzr[src], xyzr[dst]], axis=1)), dtype),
        e_src_layer=jnp.asarray(pade(layer_idx[src])),
        out_head_xyzr=jnp.asarray(
            padn(np.where((out_tab >= 0)[..., None],
                          xyzr[dst[np.maximum(out_tab, 0)]], 0.0)), dtype),
        in_src_x=jnp.asarray(
            padn(np.where(in_tab >= 0,
                          xyzr[src[np.maximum(in_tab, 0)], 0], 0.0)), dtype),
        in_src_layer=jnp.asarray(
            padn(np.where(in_tab >= 0,
                          layer_idx[src[np.maximum(in_tab, 0)]], -1)
                 .astype(np.int32), fill=-1)),
        mirror=jnp.asarray(pade(mirror)),
        mirror_src=jnp.asarray(pade(src[mirror].astype(np.int32))),
    )
    host = HostEvent(
        node_ids=(host_extra or {}).get("node_ids", np.arange(n)),
        particle_ids=uniq_pids,
        hit_ids=(host_extra or {}).get("hit_ids"),
        hit_particle_ids=(host_extra or {}).get("hit_particle_ids"),
        module_ids=(host_extra or {}).get("module_ids"),
        tracker=tracker,
    )
    return g, host

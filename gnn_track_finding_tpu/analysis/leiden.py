"""Self-contained Leiden community detection (modularity flavour).

The reference's community-detection extraction runs leidenalg's
ModularityVertexPartition over the mixture-weight-weighted hit graph
(src/extract/community_detection.py:16-50).  igraph/leidenalg are not in
this image, so this is a from-scratch implementation of the Leiden
algorithm (Traag, Waltman, van Eck 2019): local moving + REFINEMENT +
aggregation on the refined partition.  The refinement phase is what
distinguishes Leiden from Louvain and yields its guarantee that every
community is internally CONNECTED — the property the track-extraction
use case actually relies on (a disconnected "community" can never be one
track), pinned in tests/test_analysis.py.

Pure host-side Python/NumPy: community detection is an experimental
extraction alternative gated OFF by default (extract_track_candidates.py:22),
never on the device hot path.
"""

from __future__ import annotations

import random
from typing import Dict, List, Set, Tuple

__all__ = ["leiden_communities", "modularity"]


def _build_adj(n_nodes: int, edges):
    """Adjacency dicts + self-loop weights + total degree.

    A (u, u, w) edge is a SELF-LOOP carrying internal weight w
    (contributing 2w to u's degree, the standard modularity convention);
    the aggregation step uses these to preserve each super-node's
    internal weight so upper-level modularity gains equal the
    original-graph gains."""
    adj: List[Dict[int, float]] = [dict() for _ in range(n_nodes)]
    self_w = [0.0] * n_nodes
    m2 = 0.0
    for u, v, w in edges:
        if u == v:
            self_w[u] += w
            m2 += 2.0 * w
            continue
        adj[u][v] = adj[u].get(v, 0.0) + w
        adj[v][u] = adj[v].get(u, 0.0) + w
        m2 += 2.0 * w
    return adj, self_w, m2


def modularity(n_nodes: int, edges, membership) -> float:
    """Newman modularity of a partition over a weighted undirected graph."""
    adj, self_w, m2 = _build_adj(n_nodes, edges)
    if m2 == 0.0:
        return 0.0
    deg = [sum(nb.values()) + 2.0 * self_w[i] for i, nb in enumerate(adj)]
    q = 0.0
    for u in range(n_nodes):
        q += 2.0 * self_w[u]
        for v, w in adj[u].items():
            if membership[u] == membership[v]:
                q += w
    sum_deg: Dict[int, float] = {}
    for u in range(n_nodes):
        sum_deg[membership[u]] = sum_deg.get(membership[u], 0.0) + deg[u]
    q /= m2
    q -= sum(s * s for s in sum_deg.values()) / (m2 * m2)
    return q


def _local_move(adj, deg, m2, membership, rng) -> bool:
    """Louvain-style queue-based local moving phase (Leiden step 1)."""
    n = len(adj)
    comm_deg: Dict[int, float] = {}
    for u in range(n):
        comm_deg[membership[u]] = comm_deg.get(membership[u], 0.0) + deg[u]
    order = list(range(n))
    rng.shuffle(order)
    queue = list(order)
    in_queue = [True] * n
    improved = False
    while queue:
        u = queue.pop()
        in_queue[u] = False
        cu = membership[u]
        comm_deg[cu] -= deg[u]
        # weight from u to each neighbouring community
        w_to: Dict[int, float] = {cu: 0.0}
        for v, w in adj[u].items():
            w_to[membership[v]] = w_to.get(membership[v], 0.0) + w
        # modularity gain of joining community c:
        #   w_to[c]/m - deg_u * sum_deg[c] / (2 m^2)   (u removed from cu)
        best_c, best_gain = cu, w_to.get(cu, 0.0) - deg[u] * comm_deg.get(
            cu, 0.0) / m2
        for c, wtc in w_to.items():
            gain = wtc - deg[u] * comm_deg.get(c, 0.0) / m2
            if gain > best_gain + 1e-12:
                best_c, best_gain = c, gain
        membership[u] = best_c
        comm_deg[best_c] = comm_deg.get(best_c, 0.0) + deg[u]
        if best_c != cu:
            improved = True
            for v in adj[u]:
                if membership[v] != best_c and not in_queue[v]:
                    queue.append(v)
                    in_queue[v] = True
    return improved


def _refine(adj, deg, m2, membership, rng) -> List[int]:
    """Leiden refinement: within each community, greedily merge singleton
    sub-communities along internal edges when the merge improves
    modularity.  Union-find semantics (roots resolved at use, merges
    always root -> root) so pointer chains can never cycle.  Guarantees
    internally connected sub-communities (merges only follow edges)."""
    n = len(adj)
    refined = list(range(n))
    sub_deg = list(deg)

    def find(x: int) -> int:
        root = x
        while refined[root] != root:
            root = refined[root]
        while refined[x] != root:          # path compression
            refined[x], x = root, refined[x]
        return root

    order = list(range(n))
    rng.shuffle(order)
    for u in order:
        ru = find(u)
        if ru != u:
            continue                      # already merged into another
        cu = membership[u]
        w_to: Dict[int, float] = {}
        for v, w in adj[u].items():
            if membership[v] == cu:
                rv = find(v)
                if rv != ru:
                    w_to[rv] = w_to.get(rv, 0.0) + w
        best_s, best_gain = None, 0.0
        for s, wts in w_to.items():
            gain = wts - deg[u] * sub_deg[s] / m2
            if gain > 0.0 and (best_s is None or gain > best_gain):
                best_s, best_gain = s, gain
        if best_s is not None:
            sub_deg[best_s] += sub_deg[ru]
            refined[ru] = best_s
    return [find(u) for u in range(n)]


def _aggregate(adj, self_w, refined, membership):
    """Aggregate graph over refined sub-communities; the original
    communities seed the aggregate membership (Leiden step 3).  Internal
    weights become SELF-LOOPS of the super-nodes so degrees and m2 are
    preserved across levels."""
    ids = sorted(set(refined))
    remap = {r: i for i, r in enumerate(ids)}
    n_agg = len(ids)
    agg_edges: Dict[Tuple[int, int], float] = {}
    agg_self = [0.0] * n_agg
    for u in range(len(adj)):
        ru = remap[refined[u]]
        agg_self[ru] += self_w[u]
        for v, w in adj[u].items():
            if u < v:
                rv = remap[refined[v]]
                if ru != rv:
                    key = (min(ru, rv), max(ru, rv))
                    agg_edges[key] = agg_edges.get(key, 0.0) + w
                else:
                    agg_self[ru] += w
    agg_membership = [0] * n_agg
    for u in range(len(adj)):
        agg_membership[remap[refined[u]]] = membership[u]
    node_of = [[] for _ in range(n_agg)]
    for u in range(len(adj)):
        node_of[remap[refined[u]]].append(u)
    edges = [(a, b, w) for (a, b), w in agg_edges.items()]
    edges += [(i, i, w) for i, w in enumerate(agg_self) if w > 0.0]
    return n_agg, edges, agg_membership, node_of


def leiden_communities(n_nodes: int, edges, seed: int = 0,
                       max_levels: int = 10) -> List[Set[int]]:
    """Partition a weighted undirected graph into communities.

    edges: iterable of (u, v, weight).  Returns node-id sets, one per
    community (singletons included).  Deterministic for a given seed.
    """
    rng = random.Random(seed)
    # node -> original node sets through the aggregation levels
    carriers: List[Set[int]] = [{u} for u in range(n_nodes)]
    membership = list(range(n_nodes))
    cur_edges = [(u, v, float(w)) for u, v, w in edges]
    cur_n = n_nodes

    final: Dict[int, Set[int]] = {}
    for _ in range(max_levels):
        adj, self_w, m2 = _build_adj(cur_n, cur_edges)
        if m2 == 0.0:
            break
        deg = [sum(nb.values()) + 2.0 * self_w[i]
               for i, nb in enumerate(adj)]
        improved = _local_move(adj, deg, m2, membership, rng)
        refined = _refine(adj, deg, m2, membership, rng)
        n_agg, agg_edges, agg_membership, node_of = _aggregate(
            adj, self_w, refined, membership)
        carriers = [set().union(*(carriers[u] for u in group))
                    for group in node_of]
        membership = agg_membership
        cur_edges = agg_edges
        cur_n = n_agg
        if not improved or n_agg == len(adj):
            break

    for i in range(cur_n):
        final.setdefault(membership[i], set()).update(carriers[i])
    return list(final.values())

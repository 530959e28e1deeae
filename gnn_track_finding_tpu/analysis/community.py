"""Community-detection track extraction (experimental alternative).

Re-design of src/extract/community_detection.py:16-94 — disabled in the
reference (extract_track_candidates.py:22) and depending on igraph/leiden,
which the image lacks.  Here the same idea runs with NetworkX's Louvain
partitioning over the mixture-weight-weighted active graph, with the same
candidate filters (fragment size, one hit per layer).  Gated off by
default, matching the reference.
"""

from __future__ import annotations

from typing import List, Set

import numpy as np

from gnn_track_finding_tpu.config import PipelineConfig
from gnn_track_finding_tpu.graph.state import GraphState

COMMUNITY_DETECTION = False  # reference default (extract_track_candidates.py:22)


def detect_communities(g: GraphState, cfg: PipelineConfig,
                       seed: int = 0) -> List[Set[int]]:
    import networkx as nx

    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    ok = np.asarray(g.edge_mask & g.active)
    w = np.asarray(g.upd_weight + g.seed_weight)
    alive = np.asarray(g.node_mask)

    G = nx.Graph()
    G.add_nodes_from(int(n) for n in np.flatnonzero(alive))
    for e in np.flatnonzero(ok):
        u, v = int(src[e]), int(dst[e])
        weight = float(w[e])
        if G.has_edge(u, v):
            G[u][v]["weight"] = max(G[u][v]["weight"], weight)
        else:
            G.add_edge(u, v, weight=weight)

    communities = nx.community.louvain_communities(G, weight="weight",
                                                   seed=seed)
    vivl = np.asarray(g.vivl)
    valid: List[Set[int]] = []
    for com in communities:
        nodes = set(int(n) for n in com)
        if len(nodes) < cfg.min_track_hits:
            continue  # fragment filter (community_detection.py:52-66)
        layers = [(int(vivl[n, 0]), int(vivl[n, 1])) for n in nodes]
        if len(layers) != len(set(layers)):
            continue  # one hit per layer (community_detection.py:68-86)
        valid.append(nodes)
    return valid

"""Post-hoc audit of the remaining (unextracted) network.

Re-design of analyse_remaining_networks.py:75-110: classify the leftover
components — counting candidates where every layer holds exactly two hits
("track splitting" candidates), fragments, and mixed blobs — plus the
clustering_updated_states_test.py:367-382 statistic (fraction of nodes
that received updated states).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict

import numpy as np

from gnn_track_finding_tpu.graph.state import GraphState


def analyse_remaining(g: GraphState) -> Dict[str, int]:
    alive = np.asarray(g.node_mask)
    comp = np.asarray(g.component)
    vivl = np.asarray(g.vivl)

    by_comp: Dict[int, list] = {}
    for n in np.flatnonzero(alive):
        by_comp.setdefault(int(comp[n]), []).append(int(n))

    stats = Counter()
    for nodes in by_comp.values():
        stats["remaining_components"] += 1
        stats["remaining_nodes"] += len(nodes)
        layer_counts = Counter((int(vivl[n, 0]), int(vivl[n, 1]))
                               for n in nodes)
        counts = list(layer_counts.values())
        if all(c == 2 for c in counts) and len(counts) >= 2:
            # 2 hits on every layer -> merged pair of tracks, splittable
            # (analyse_remaining_networks.py:75-110 "track splitting")
            stats["track_splitting_candidates"] += 1
        elif all(c == 1 for c in counts):
            stats["clean_chains"] += 1
        else:
            stats["mixed_blobs"] += 1
    return dict(stats)


def updated_state_coverage(g: GraphState) -> Dict[str, float]:
    """Fraction of alive nodes holding updated states
    (clustering_updated_states_test.py:367-382)."""
    alive = np.asarray(g.node_mask)
    has_upd = np.zeros(g.num_padded_nodes, bool)
    dst = np.asarray(g.dst)
    upd = np.asarray(g.has_updated & g.edge_mask)
    np.maximum.at(has_upd, dst[upd], True)
    n_alive = int(alive.sum())
    n_upd = int((has_upd & alive).sum())
    return {"nodes": n_alive, "nodes_with_updated_states": n_upd,
            "fraction": n_upd / max(n_alive, 1)}

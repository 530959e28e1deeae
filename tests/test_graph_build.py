import numpy as np
import networkx as nx

from gnn_track_finding_tpu.config import PipelineConfig
from gnn_track_finding_tpu.graph.build import build_graph_state
from gnn_track_finding_tpu.models import toymc

CFG = PipelineConfig(node_bucket=64, edge_bucket=256)


def build_toy(seed=0, **kw):
    ev = toymc.generate_event(seed=seed, **kw)
    g, host = build_graph_state(ev.xyzr, ev.vivl, ev.truth, ev.edge_pairs, CFG)
    return ev, g, host


def test_shapes_and_masks():
    ev, g, _ = build_toy()
    n = ev.xyzr.shape[0]
    assert g.n_nodes == n
    assert g.n_edges == 2 * ev.edge_pairs.shape[0]
    assert int(g.node_mask.sum()) == n
    assert int(g.edge_mask.sum()) == g.n_edges
    assert g.num_padded_nodes % CFG.node_bucket == 0
    assert g.num_padded_edges % CFG.edge_bucket == 0
    # bidirectional: reverse of reverse is identity, endpoints swap
    e = g.n_edges
    rev = np.asarray(g.reverse)[:e]
    src = np.asarray(g.src)[:e]
    dst = np.asarray(g.dst)[:e]
    assert np.array_equal(src[rev], dst)
    assert np.array_equal(dst[rev], src)


def test_edge_tables_match_networkx_order():
    ev, g, _ = build_toy()
    G = toymc.to_networkx(ev)
    in_tab = np.asarray(g.in_edges)
    out_tab = np.asarray(g.out_edges)
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    for node in list(G.nodes())[:50]:
        preds = list(G.predecessors(node))
        row = in_tab[node]
        row = row[row >= 0]
        assert [src[e] for e in row] == preds
        assert all(dst[e] == node for e in row)
        succs = list(G.successors(node))
        orow = out_tab[node]
        orow = orow[orow >= 0]
        assert [dst[e] for e in orow] == succs


def test_components_match_networkx():
    ev, g, _ = build_toy()
    G = toymc.to_networkx(ev)
    comp = np.asarray(g.component)[:g.n_nodes]
    nx_comps = list(nx.weakly_connected_components(G))
    # same partition
    label_of = {}
    for nodes in nx_comps:
        lab = min(nodes)
        for nd in nodes:
            label_of[nd] = lab
    for nd, lab in label_of.items():
        assert comp[nd] == lab


def test_duplicate_edges_deduped():
    ev = toymc.generate_event(seed=1)
    dup = np.concatenate([ev.edge_pairs, ev.edge_pairs[:5],
                          ev.edge_pairs[:3][:, ::-1]])
    g, _ = build_graph_state(ev.xyzr, ev.vivl, ev.truth, dup, CFG)
    assert g.n_edges == 2 * ev.edge_pairs.shape[0]

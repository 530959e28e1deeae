import numpy as np
import jax

from gnn_track_finding_tpu.config import PipelineConfig
from gnn_track_finding_tpu.graph.build import build_graph_state
from gnn_track_finding_tpu.models import toymc
from gnn_track_finding_tpu.ops import extract

from tests import helpers
from tests.oracle import ref_impl

CFG = PipelineConfig(node_bucket=64, edge_bucket=256)

extract_j = jax.jit(extract.extract_candidates, static_argnums=1)
apply_j = jax.jit(extract.apply_extraction, static_argnums=2)


def insertion_order(G, node):
    return list(G.predecessors(node))


def successors_order(G, node):
    return list(G.successors(node))


def run_both(seed=11, num_tracks=16, **kw):
    ev = toymc.generate_event(seed=seed, num_tracks=num_tracks, **kw)
    g, _ = build_graph_state(ev.xyzr, ev.vivl, ev.truth, ev.edge_pairs, CFG)
    g = helpers.seed_and_init(g, CFG)
    g = helpers.cluster_j(g, CFG, False)
    g = helpers.extrapolation_stage(g, CFG)

    G = toymc.to_networkx(ev)
    ref_impl.seed_states(G, CFG, neighbour_order=insertion_order)
    ref_impl.initialize_edge_activation(G)
    ref_impl.compute_mixture_weights(G, "track_state_estimates")
    ref_impl.compute_prior_probabilities(G, "track_state_estimates")
    ref_impl.cluster(G, "track_state_estimates",
                     CFG.chi2_threshold_seed, CFG.kl_threshold_seed, CFG)
    ref_impl.extrapolation_stage(G, CFG, neighbour_order=successors_order)
    return ev, g, G


def test_extraction_matches_oracle():
    ev, g, G = run_both()

    res = extract_j(g, CFG)
    g2 = apply_j(g, res, CFG)

    import networkx as nx
    file_of_node = {}
    for comp in nx.weakly_connected_components(toymc.to_networkx(ev)):
        lab = min(comp)
        for n in comp:
            file_of_node[n] = lab
    ref = ref_impl.extract_stage(G, CFG, file_of_node)

    accepted = np.asarray(res.accepted)
    labels = np.asarray(res.labels)
    mat = np.asarray(res.cand_nodes)
    pxy = np.asarray(res.pval_xy)
    pzr = np.asarray(res.pval_zr)

    dev_sets = {}
    for c in range(len(accepted)):
        if accepted[c]:
            nodes = frozenset(int(x) for x in mat[c] if x >= 0)
            dev_sets[nodes] = (pxy[c], pzr[c])
    ref_sets = {frozenset(s): pv for s, pv in zip(ref["accepted"], ref["pvals"])}

    assert set(dev_sets.keys()) == set(ref_sets.keys()), (
        f"device {len(dev_sets)} vs oracle {len(ref_sets)} accepted")
    assert len(ref_sets) > 0, "no candidates accepted — test is vacuous"
    # jax gammaincc vs scipy chi2.sf agree to ~1e-6 relative
    for k, (a, b) in dev_sets.items():
        ra, rb = ref_sets[k]
        np.testing.assert_allclose(a, ra, rtol=1e-5, atol=1e-12)
        np.testing.assert_allclose(b, rb, rtol=1e-5, atol=1e-12)

    # surviving node set parity (extracted + fragments removed)
    alive_dev = set(np.flatnonzero(np.asarray(g2.node_mask)[:g.n_nodes]))
    alive_ref = set(G.nodes())
    assert alive_dev == alive_ref

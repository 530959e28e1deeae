import numpy as np
import networkx as nx

from gnn_track_finding_tpu.config import PipelineConfig
from gnn_track_finding_tpu.graph.build import build_graph_state
from gnn_track_finding_tpu.models import toymc, pipeline

from tests.oracle import ref_impl

CFG = PipelineConfig(node_bucket=64, edge_bucket=256)


def insertion_order(G, node):
    return list(G.predecessors(node))


def successors_order(G, node):
    return list(G.successors(node))


def test_full_pipeline_matches_oracle():
    ev = toymc.generate_event(seed=11, num_tracks=16, edge_dphi_window=0.12)
    g, _ = build_graph_state(ev.xyzr, ev.vivl, ev.truth, ev.edge_pairs, CFG)
    out = pipeline.run_pipeline(g, CFG)

    G = toymc.to_networkx(ev)
    file_of_node = {}
    for comp in nx.weakly_connected_components(G):
        lab = min(comp)
        for n in comp:
            file_of_node[n] = lab
    ref_results = ref_impl.run_pipeline(
        G, CFG, file_of_node,
        neighbour_order=insertion_order, succ_order=successors_order)

    # per-iteration accepted candidate sets
    ref_cands = {}
    for i, res in enumerate(ref_results, start=1):
        for s, pv in zip(res["accepted"], res["pvals"]):
            ref_cands[frozenset(s)] = (i, pv)
    dev_cands = {frozenset(int(x) for x in c.nodes): (c.iteration,
                                                      (c.pval_xy, c.pval_zr))
                 for c in out.candidates}
    assert set(dev_cands.keys()) == set(ref_cands.keys()), (
        f"device={len(dev_cands)} oracle={len(ref_cands)}")
    assert len(ref_cands) > 0
    for k, (it, (pa, pb)) in dev_cands.items():
        rit, (rpa, rpb) = ref_cands[k]
        assert it == rit
        np.testing.assert_allclose(pa, rpa, rtol=1e-5)
        np.testing.assert_allclose(pb, rpb, rtol=1e-5)

    # final surviving node set
    alive_dev = set(np.flatnonzero(np.asarray(out.graph.node_mask)[:g.n_nodes]))
    assert alive_dev == set(G.nodes())

    # truth quality: most candidates should be pure single-track sets
    pure = sum(1 for k in dev_cands
               if len({int(ev.truth[n]) for n in k}) == 1)
    assert pure >= 0.7 * len(dev_cands)


def test_reconstruction_efficiency_parity_nonzero():
    """The north-star efficiency bar, non-vacuously: on a workload where
    the reference algorithm actually reconstructs (toy MC — the committed
    TrackML network yields 0 under every exposed reference configuration,
    BASELINE.md), this framework reaches >= 95% of the reference
    semantics' efficiency, and both are > 0.

    Reference formula: reconstruction_efficiency.py:66,155-187,213-218."""
    from gnn_track_finding_tpu.evaluation import efficiency

    ev = toymc.generate_event(seed=23, num_tracks=20, edge_dphi_window=0.12)
    g, _ = build_graph_state(ev.xyzr, ev.vivl, ev.truth, ev.edge_pairs, CFG)
    out = pipeline.run_pipeline(g, CFG)
    dev_rep = efficiency.evaluate_toy(
        [c.nodes for c in out.candidates], ev.truth, ev.vivl, CFG)

    G = toymc.to_networkx(ev)
    file_of_node = {}
    for comp in nx.weakly_connected_components(G):
        lab = min(comp)
        for n in comp:
            file_of_node[n] = lab
    ref_results = ref_impl.run_pipeline(
        G, CFG, file_of_node,
        neighbour_order=insertion_order, succ_order=successors_order)
    ref_cands = [list(s) for res in ref_results for s in res["accepted"]]
    ref_rep = efficiency.evaluate_toy(ref_cands, ev.truth, ev.vivl, CFG)

    assert ref_rep.num_reconstructed > 0, "oracle must reconstruct tracks"
    assert dev_rep.num_reconstructed > 0
    assert dev_rep.efficiency_pct >= 0.95 * ref_rep.efficiency_pct, (
        dev_rep, ref_rep)


def test_reset_reactivate():
    """The reference's '-r' full-reset path (clustering.py:126-146): drop
    every merged and updated state, reactivate every surviving edge,
    re-seed track states and recompute priors/weights — the result must
    equal a fresh `prepare` of the same (shrunken) graph."""
    ev = toymc.generate_event(seed=11, num_tracks=16, edge_dphi_window=0.12)
    g0, _ = build_graph_state(ev.xyzr, ev.vivl, ev.truth, ev.edge_pairs, CFG)
    g = pipeline._prepare_jit(g0, CFG)
    for i in (1, 2):
        g = pipeline._stage_jit(g, CFG, i, None)
        g, _res = pipeline._extract_jit(g, CFG, i)

    # the run must have actually produced state to reset
    assert bool(np.asarray(g.has_merged).any())
    assert bool(np.asarray(g.has_updated).any())
    assert bool((np.asarray(g.edge_mask) & ~np.asarray(g.active)).any())

    r = pipeline.reset_reactivate(g, CFG)
    assert not np.asarray(r.has_merged).any()
    assert not np.asarray(r.has_updated).any()
    # every surviving edge reactivated (helper.initialize_edge_activation)
    np.testing.assert_array_equal(np.asarray(r.active),
                                  np.asarray(r.edge_mask))

    # equal to prepare() on the same shrunken graph: seed states, priors,
    # weights, degrees all recomputed from scratch
    fresh = pipeline._prepare_jit(g.replace(
        has_merged=g.has_merged & False, has_updated=g.has_updated & False,
        active=g.edge_mask), CFG)
    em = np.asarray(r.edge_mask)
    np.testing.assert_allclose(np.asarray(r.seed_sv)[em],
                               np.asarray(fresh.seed_sv)[em])
    np.testing.assert_allclose(np.asarray(r.seed_prior)[em],
                               np.asarray(fresh.seed_prior)[em])
    np.testing.assert_allclose(np.asarray(r.seed_weight)[em],
                               np.asarray(fresh.seed_weight)[em])
    np.testing.assert_array_equal(np.asarray(r.degree),
                                  np.asarray(fresh.degree))


def test_run_pipeline_fast_matches_driver():
    """The fused streaming driver (run_pipeline_fast: whole schedule in
    ONE jitted program, device FastSV CCA, accepted-compacted readback)
    must produce exactly the candidates of the stage-by-stage driver
    (run_pipeline: host union-find CCA, per-stage dispatch)."""
    ev = toymc.generate_event(seed=7, num_tracks=20, edge_dphi_window=0.12)
    g, _ = build_graph_state(ev.xyzr, ev.vivl, ev.truth, ev.edge_pairs, CFG)
    slow = pipeline.run_pipeline(g, CFG)
    fast = pipeline.run_pipeline_fast(g, CFG)
    assert len(fast.candidates) == len(slow.candidates) > 0
    key = lambda c: (c.iteration, tuple(sorted(int(x) for x in c.nodes)))
    for a, b in zip(sorted(slow.candidates, key=key),
                    sorted(fast.candidates, key=key)):
        assert key(a) == key(b)
        np.testing.assert_allclose(a.pval_xy, b.pval_xy, rtol=1e-12)
        np.testing.assert_allclose(a.pval_zr, b.pval_zr, rtol=1e-12)
    # final graph state identical too
    np.testing.assert_array_equal(np.asarray(slow.graph.node_mask),
                                  np.asarray(fast.graph.node_mask))
    np.testing.assert_array_equal(np.asarray(slow.graph.active),
                                  np.asarray(fast.graph.active))


def test_stream_pipeline_matches_fast_driver():
    """The software-pipelined streaming driver (stream_pipeline) yields
    exactly run_pipeline_fast's results for each event, in order."""
    evs = [toymc.generate_event(seed=s, num_tracks=20,
                                edge_dphi_window=0.12) for s in (7, 11)]
    graphs = [build_graph_state(ev.xyzr, ev.vivl, ev.truth, ev.edge_pairs,
                                CFG)[0] for ev in evs]
    solo = [pipeline.run_pipeline_fast(g, CFG) for g in graphs]
    streamed = list(pipeline.stream_pipeline(iter(graphs), CFG))
    assert len(streamed) == len(solo) == 2
    key = lambda c: (c.iteration, tuple(sorted(int(x) for x in c.nodes)))
    for a, b in zip(solo, streamed):
        assert sorted(map(key, a.candidates)) == \
            sorted(map(key, b.candidates))
        assert len(a.candidates) > 0


def test_distinct_counts_share_compile():
    """Distinct TRUE event sizes that share the same pad buckets must
    share ONE compiled schedule: n_nodes/n_edges are host-side aux
    metadata no jitted stage reads, and the fast drivers normalise them
    out of the jit cache key (pipeline._normalize_static).  Without
    this, a production stream of distinct events would recompile the
    ~26 s full-event schedule once per event."""
    evs = [toymc.generate_event(seed=s, num_tracks=t, edge_dphi_window=0.12)
           for s, t in ((3, 12), (5, 14))]
    graphs = [build_graph_state(ev.xyzr, ev.vivl, ev.truth, ev.edge_pairs,
                                CFG)[0] for ev in evs]
    # genuinely different true sizes, same buckets
    assert (graphs[0].n_nodes != graphs[1].n_nodes
            or graphs[0].n_edges != graphs[1].n_edges)
    assert graphs[0].xyzr.shape == graphs[1].xyzr.shape
    assert graphs[0].src.shape == graphs[1].src.shape
    assert graphs[0].n_layers == graphs[1].n_layers
    assert graphs[0].max_degree == graphs[1].max_degree
    before = pipeline.full_pipeline_packed._cache_size()
    outs = [pipeline.run_pipeline_fast(g, CFG) for g in graphs]
    added = pipeline.full_pipeline_packed._cache_size() - before
    assert added <= 1, f"schedule recompiled per event ({added} new entries)"
    for out, g in zip(outs, graphs):
        assert len(out.candidates) > 0
        # the metadata round-trips through the normalised dispatch
        assert out.graph.n_nodes == g.n_nodes
        assert out.graph.n_edges == g.n_edges


def test_pack_unpack_results_round_trip():
    """pack_results / unpack_results are exact inverses on every layout
    combination the packed readback can take: narrow (uint16 ids,
    0xffff sentinel) vs wide (int32 bitcast, -1 sentinel), f32 vs f64
    p-values, odd and even node-section lengths."""
    import itertools
    rng = np.random.default_rng(0)
    from gnn_track_finding_tpu.models.pipeline import (pack_results,
                                                       unpack_results)
    for narrow, wide_pv, (cap, L) in itertools.product(
            (True, False), (True, False), ((5, 7), (4, 8))):
        n_it = 3
        nodes = rng.integers(0, 0xFFFF if narrow else 2**30,
                             size=(n_it, cap, L)).astype(np.int32)
        pad = rng.random(nodes.shape) < 0.4
        nodes[pad] = -1
        counts = rng.integers(0, cap + 1, size=(n_it,)).astype(np.int32)
        pvals = rng.standard_normal((n_it, cap, 2)).astype(
            np.float64 if wide_pv else np.float32)
        import jax.numpy as jnp
        buf = np.asarray(pack_results(jnp.asarray(counts),
                                      jnp.asarray(nodes),
                                      jnp.asarray(pvals), narrow))
        c2, n2, p2, sentinel = unpack_results(buf, n_it)
        np.testing.assert_array_equal(c2, counts)
        np.testing.assert_array_equal(p2, pvals)  # bit-exact bitcast
        expect = nodes.copy()
        expect[nodes == -1] = sentinel
        np.testing.assert_array_equal(n2, expect)


def test_unpack_packed_cap_overflow_falls_back(monkeypatch):
    """If any iteration's accepted count exceeds the pull cap, the fast
    driver must fall back to the exact-count stage driver rather than
    truncate candidates."""
    import jax.numpy as jnp
    from gnn_track_finding_tpu.models.pipeline import (pack_results,
                                                       _unpack_packed)
    n_it, cap, L = CFG.num_iterations, 4, 6
    nodes = np.full((n_it, cap, L), -1, np.int32)
    counts = np.array([cap + 3] + [0] * (n_it - 1), np.int32)  # overflow
    pvals = np.zeros((n_it, cap, 2), np.float32)
    buf = pack_results(jnp.asarray(counts), jnp.asarray(nodes),
                       jnp.asarray(pvals), True)
    sentinel = object()
    monkeypatch.setattr(pipeline, "run_pipeline",
                        lambda g, cfg: sentinel)
    assert _unpack_packed("g_in", "g_out", buf, CFG) is sentinel

"""Validate device states against an actual reference-pipeline run.

Loads the pickled subgraphs a reference run wrote (e.g. the baseline run
in /tmp/ref_baseline, see BASELINE.md) and compares per-edge seed states
and per-node merged states from this framework's device pipeline —
allclose, per node/edge, reported as match fractions.

Usage:
  python tools/validate_vs_reference.py [REF_OUTPUT_DIR]
  (default /tmp/ref_baseline/src/output)
"""

from __future__ import annotations

import glob
import os
import pickle
import sys

import numpy as np


def _ref_sys_path(ref_root: str) -> None:
    """The gpickles reference the run's GNN_Measurement class by module."""
    base = os.path.dirname(os.path.dirname(ref_root))
    for p in (os.path.join(base, "src"), base):
        if os.path.isdir(p) and p not in sys.path:
            sys.path.insert(0, p)


def load_ref_graphs(directory: str):
    graphs = []
    for path in sorted(glob.glob(os.path.join(directory, "*_subgraph.gpickle"))):
        with open(path, "rb") as f:
            graphs.append(pickle.load(f))
    return graphs


def main() -> None:
    ref_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_baseline/src/output"
    seed_dir = os.path.join(ref_root, "track_sim", "network")
    clus_dir = os.path.join(ref_root, "iteration_1", "network")
    if not os.path.isdir(seed_dir):
        print(f"no reference artifacts at {seed_dir}; run the baseline first")
        return
    _ref_sys_path(ref_root)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/cpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from gnn_track_finding_tpu.config import PipelineConfig
    from gnn_track_finding_tpu.data import trackml
    from gnn_track_finding_tpu.models import pipeline

    cfg = PipelineConfig()
    g, host = trackml.load_event(trackml.DEFAULT_EVENT, cfg)
    g = pipeline._prepare_jit(g, cfg)

    # original node_idx -> dense index
    remap = {int(n): i for i, n in enumerate(host.node_ids)}

    # ---- seed-state comparison (event conversion output) ----
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    sv = np.asarray(g.seed_sv)
    cov = np.asarray(g.seed_cov)
    joint = np.asarray(g.seed_joint)
    edge_index = {(int(src[e]), int(dst[e])): e for e in range(g.n_edges)}

    n_cmp = n_ok = n_cov_ok = 0
    for G in load_ref_graphs(seed_dir):
        for node, attr in G.nodes(data=True):
            for nb, st in attr.get("track_state_estimates", {}).items():
                d = remap.get(int(node))
                s = remap.get(int(nb))
                if d is None or s is None:
                    continue
                e = edge_index.get((s, d))
                if e is None:
                    continue
                n_cmp += 1
                if np.allclose(sv[e], st["edge_state_vector"], rtol=1e-8,
                               atol=1e-12):
                    n_ok += 1
                if np.allclose(cov[e], st["edge_covariance"], rtol=1e-7,
                               atol=1e-12):
                    n_cov_ok += 1
    print(f"[seed] edges compared: {n_cmp}, state allclose: {n_ok} "
          f"({100.0 * n_ok / max(n_cmp, 1):.3f}%), cov allclose: {n_cov_ok} "
          f"({100.0 * n_cov_ok / max(n_cmp, 1):.3f}%)")

    # ---- merged-state comparison (clustering iteration 1 output) ----
    # replicate the host driver: stage, extraction, then the extraction
    # leak (close-proximity merges mutate GNN coordinates in place —
    # graph/nxorder.py) before the next stage
    g1s = jax.jit(pipeline.stage_step, static_argnums=(1, 2))(g, cfg, 1)
    g1, res1 = pipeline._extract_only_jit(g1s, cfg, None)
    n_acc = int(res1.acc_count)
    acc_sets = []
    if n_acc:
        mat = np.asarray(res1.acc_nodes[:n_acc])
        acc_sets = [set(int(x) for x in row[row >= 0]) for row in mat]
    tracker = host.tracker
    muts = tracker.extraction_merges(
        np.asarray(g1s.edge_mask & g1s.active), np.asarray(g.vivl),
        np.asarray(g.xyzr, np.float64), acc_sets,
        cfg.min_track_hits, cfg.node_merge_distance)
    print(f"[leak] extraction-1 close-proximity merges: {len(muts)} "
          f"coordinate mutations")
    # cross-check the predicted mutations against the reference's own
    # remaining networks (GNN coords vs immutable 'xyzr' attribute)
    ref_muts = {}
    for G in load_ref_graphs(os.path.join(ref_root, "iteration_1",
                                          "remaining")):
        for node, attr in G.nodes(data=True):
            gm = attr["GNN_Measurement"]
            if abs(gm.x - attr["xyzr"][0]) > 1e-12 or \
                    abs(gm.z - attr["xyzr"][2]) > 1e-12:
                ref_muts[remap.get(int(node))] = (gm.x, gm.y, gm.z, gm.r)
    ours_muts = {n: c for n, c in muts}
    in_remaining = {n: c for n, c in ours_muts.items() if n in ref_muts}
    ok_mut = sum(1 for n, c in ref_muts.items()
                 if n in ours_muts and np.allclose(ours_muts[n], c))
    print(f"[leak] reference remaining has {len(ref_muts)} mutated nodes; "
          f"predicted {len(ours_muts)} (incl. removed-candidate nodes); "
          f"matching coords: {ok_mut}/{len(ref_muts)}")
    if muts:
        g1 = pipeline._apply_gnn_mutations(
            g1, muts, np.asarray(g.in_edges), np.asarray(g.slot_out),
            np.asarray(g.src))
    hm = np.asarray(g1.has_merged)
    ms = np.asarray(g1.merged_state)
    mc = np.asarray(g1.merged_cov)

    m_cmp = m_flag_ok = m_val_ok = 0
    if os.path.isdir(clus_dir):
        for G in load_ref_graphs(clus_dir):
            for node, attr in G.nodes(data=True):
                d = remap.get(int(node))
                if d is None:
                    continue
                m_cmp += 1
                ref_has = "merged_state" in attr
                if bool(hm[d]) == ref_has:
                    m_flag_ok += 1
                    if ref_has and np.allclose(ms[d], attr["merged_state"],
                                               rtol=1e-7, atol=1e-12) \
                            and np.allclose(mc[d], attr["merged_cov"],
                                            rtol=1e-6, atol=1e-12):
                        m_val_ok += 1
        n_ref_merged = sum(
            1 for G in load_ref_graphs(clus_dir)
            for _, a in G.nodes(data=True) if "merged_state" in a)
        print(f"[cluster1] nodes compared: {m_cmp}, merged-flag match: "
              f"{m_flag_ok} ({100.0 * m_flag_ok / max(m_cmp, 1):.3f}%), "
              f"merged values allclose: {m_val_ok}/{n_ref_merged} "
              f"({100.0 * m_val_ok / max(n_ref_merged, 1):.3f}%)")

    # ---- updated-state comparison (extrapolation iteration 2 output) ----
    # NOTE: the reference's iteration_2/network gpickles are written right
    # after message passing (extrapolate_merged_states.py:561-571), BEFORE
    # extraction and the even-iteration metadata pruning that deletes
    # updated states whose partner left the graph — so compare at the
    # stage boundary, not after the full iteration.
    extr_dir = os.path.join(ref_root, "iteration_2", "network")
    if os.path.isdir(extr_dir):
        g2 = jax.jit(pipeline.stage_step,
                     static_argnums=(1, 2))(g1, cfg, 2)
        has_u = np.asarray(g2.has_updated)
        usv = np.asarray(g2.upd_sv)
        ujoint = np.asarray(g2.upd_joint)
        u_cmp = u_flag = u_val = u_joint = 0
        for G in load_ref_graphs(extr_dir):
            for node, attr in G.nodes(data=True):
                d = remap.get(int(node))
                if d is None:
                    continue
                upd = attr.get("updated_track_states", {})
                for snd, st in upd.items():
                    s = remap.get(int(snd))
                    if s is None:
                        continue
                    e = edge_index.get((s, d))
                    if e is None:
                        continue
                    u_cmp += 1
                    if has_u[e]:
                        u_flag += 1
                        if np.allclose(usv[e], st["edge_state_vector"],
                                       rtol=1e-6, atol=1e-10):
                            u_val += 1
                        if np.allclose(ujoint[e], st["joint_vector"],
                                       rtol=1e-6, atol=1e-10):
                            u_joint += 1
        print(f"[extrap2] updated states compared: {u_cmp}, present here: "
              f"{u_flag} ({100.0 * u_flag / max(u_cmp, 1):.3f}%), values "
              f"allclose: {u_val} ({100.0 * u_val / max(u_cmp, 1):.3f}%), "
              f"joint allclose: {u_joint} "
              f"({100.0 * u_joint / max(u_cmp, 1):.3f}%)")


if __name__ == "__main__":
    main()

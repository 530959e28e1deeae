"""KL-distance training-data generation for threshold calibration.

Re-design of learn_KL_linear_model/generate_training_data
(generate_events.py:36-176, compute_KL_distance.py:11-87) and the
parabolic-model copy: simulate seeded toy events, seed per-edge track
states with the SAME device kernels the pipeline uses, and emit one row per
in-edge state pair per node:

    kl_dist   pairwise KL distance between the two edge states
    emp_var   empirical variance of the node's xy edge gradients
              (helper.py:446, the LUT feature of empvar.lut)
    degree    number of edge states at the node (the kl_degree.lut feature)
    truth     1 when node and both neighbours share the truth particle
              (compute_KL_distance.py:73-85)

Unlike the reference — which trains on LINEAR 2x2 edge states from its own
simulator copy — the rows here use the production parabolic joint states,
so the calibrated thresholds transfer to the pipeline they gate.
"""

from __future__ import annotations

import numpy as np

from gnn_track_finding_tpu.config import PipelineConfig
from gnn_track_finding_tpu.graph.build import build_graph_state
from gnn_track_finding_tpu.models import pipeline, toymc


def _pairwise_rows(g, cfg: PipelineConfig) -> np.ndarray:
    """Rows (kl_dist, emp_var, degree, truth) for every state pair."""
    import jax.numpy as jnp  # noqa: F401
    tab = np.asarray(g.in_edges)
    src = np.asarray(g.src)
    truth = np.asarray(g.truth)
    joint = np.asarray(g.seed_joint, np.float64)
    jcov = np.asarray(g.seed_joint_cov, np.float64)
    grad = np.asarray(g.grad_stats)

    rows = []
    for node in range(g.n_nodes):
        edges = tab[node]
        edges = edges[edges >= 0]
        d = len(edges)
        if d <= 1:
            continue
        emp_var = grad[node, 1]
        means = joint[edges]
        covs = jcov[edges]
        invs = np.linalg.inv(covs)
        nb_truth = truth[src[edges]]
        node_truth = truth[node]
        for i in range(d):
            for j in range(i):
                dc = covs[i] - covs[j]
                di = invs[j] - invs[i]
                trace = np.trace(dc * di)           # elementwise (ref quirk)
                dm = means[i] - means[j]
                kl = trace + dm @ (invs[i] + invs[j]) @ dm
                t = int(node_truth == nb_truth[i] == nb_truth[j])
                rows.append((kl, emp_var, d, t))
    return np.asarray(rows, np.float64)


def generate_training_data(num_events: int = 50, seed: int = 0,
                           cfg: PipelineConfig | None = None,
                           num_tracks: int = 20) -> np.ndarray:
    """(rows, 4) array over `num_events` seeded toy events."""
    cfg = cfg or PipelineConfig(node_bucket=256, edge_bucket=1024)
    all_rows = []
    for ev_i in range(num_events):
        ev = toymc.generate_event(num_tracks=num_tracks, seed=seed + ev_i)
        g, _ = build_graph_state(ev.xyzr, ev.vivl, ev.truth, ev.edge_pairs, cfg)
        g = pipeline._prepare_jit(g, cfg)
        rows = _pairwise_rows(g, cfg)
        if rows.size:
            all_rows.append(rows)
    return np.concatenate(all_rows, axis=0)


def save_training_csv(rows: np.ndarray, path: str) -> None:
    header = "kl_dist,emp_var,degree,truth"
    np.savetxt(path, rows, delimiter=",", header=header, comments="")

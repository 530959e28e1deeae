"""The Pallas distinct-count kernel matches the XLA compare cube exactly
(interpreter mode on CPU; the TPU path compiles the same kernel)."""

import numpy as np
import jax.numpy as jnp

from gnn_track_finding_tpu.config import PipelineConfig
from gnn_track_finding_tpu.graph.build import build_graph_state
from gnn_track_finding_tpu.models import toymc, pipeline
from gnn_track_finding_tpu.ops import priors, pallas_distinct

CFG = PipelineConfig(node_bucket=64, edge_bucket=256)


def test_distinct_counts_kernel_matches_xla():
    rng = np.random.default_rng(0)
    n, k = 64, 16
    # duplicate-heavy values so first-occurrence logic is exercised
    x_vals = rng.choice([1.5, 2.5, 3.5, -1.0, 0.0], size=(n, k))
    ok = rng.uniform(size=(n, k)) < 0.6
    x_slot = jnp.asarray(np.where(ok, x_vals, 0.0))
    ok_slot = jnp.asarray(ok)
    node_x = jnp.asarray(rng.normal(size=(n,)) * 2.0)
    left = x_slot < node_x[:, None]
    ref = priors._distinct_counts(ok_slot, x_slot, left, x_slot.dtype)
    out = pallas_distinct.distinct_counts_tile(ok_slot, x_slot, node_x,
                                               interpret=True, tile=32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_prior_reweight_pallas_distinct_matches():
    """End-to-end: prior_reweight with the kernel (interpreter) equals the
    default XLA path on a staged toy graph."""
    ev = toymc.generate_event(num_tracks=16, seed=11, edge_dphi_window=0.12)
    g, _ = build_graph_state(ev.xyzr, ev.vivl, ev.truth, ev.edge_pairs, CFG)
    g = pipeline._prepare_jit(g, CFG)
    g = pipeline._stage_jit(g, CFG, 1, None)
    g = pipeline._stage_jit(g, CFG, 2, None)
    assert bool(np.asarray(g.has_updated).any())
    a = priors.prior_reweight(g, CFG, distinct_backend="xla")
    b = priors.prior_reweight(g, CFG, distinct_backend="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(a.active), np.asarray(b.active))
    np.testing.assert_allclose(np.asarray(a.upd_weight),
                               np.asarray(b.upd_weight), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(a.upd_prior),
                               np.asarray(b.upd_prior), rtol=0, atol=0)

import jax
import numpy as np
import pytest

from gnn_track_finding_tpu.config import PipelineConfig
from gnn_track_finding_tpu.graph.build import build_graph_state
from gnn_track_finding_tpu.models import toymc
from gnn_track_finding_tpu.ops import clustering

from tests import helpers

CFG = PipelineConfig(node_bucket=64, edge_bucket=256)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="unrolled kernel is impractically slow in the "
                           "pallas interpreter; validated compiled on TPU")
def test_pallas_cluster_matches_xla():
    ev = toymc.generate_event(seed=11, num_tracks=16, edge_dphi_window=0.12)
    g, _ = build_graph_state(ev.xyzr, ev.vivl, ev.truth, ev.edge_pairs, CFG)
    g = helpers.seed_and_init(g, CFG)

    gx = clustering.cluster(g, CFG, False, backend="xla")
    gp = clustering.cluster(g, CFG, False, backend="pallas")

    np.testing.assert_array_equal(np.asarray(gx.has_merged),
                                  np.asarray(gp.has_merged))
    np.testing.assert_array_equal(np.asarray(gx.active),
                                  np.asarray(gp.active))
    fm = np.asarray(gx.has_merged)
    np.testing.assert_allclose(np.asarray(gp.merged_state)[fm],
                               np.asarray(gx.merged_state)[fm],
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(gp.merged_cov)[fm],
                               np.asarray(gx.merged_cov)[fm],
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(gp.merged_prior)[fm],
                               np.asarray(gx.merged_prior)[fm], rtol=1e-12)
    assert fm.sum() > 0

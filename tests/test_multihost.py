import jax
import jax.numpy as jnp
import pytest

from gnn_track_finding_tpu.config import PipelineConfig
from gnn_track_finding_tpu.graph.build import build_graph_state
from gnn_track_finding_tpu.models import toymc
from gnn_track_finding_tpu.parallel import multihost

CFG = PipelineConfig(node_bucket=64, edge_bucket=256)


def test_local_event_slice_single_process():
    lo, hi = multihost.local_event_slice(10)
    assert (lo, hi) == (0, 10)


def test_global_mesh_axes():
    m = multihost.global_mesh()
    assert set(m.axis_names) == {"data", "edge"}
    assert m.devices.size == len(jax.devices())


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_scaling_report_runs():
    graphs = []
    for seed in range(4):
        ev = toymc.generate_event(num_tracks=6, seed=seed)
        g, _ = build_graph_state(ev.xyzr, ev.vivl, ev.truth, ev.edge_pairs,
                                 CFG, dtype=jnp.float32)
        graphs.append(g)
    rep = multihost.scaling_report(graphs, CFG)
    assert rep["events"] == 4
    assert rep["scaling_efficiency"] > 0

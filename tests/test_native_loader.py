import numpy as np
import pytest

from gnn_track_finding_tpu.config import PipelineConfig
from gnn_track_finding_tpu.data import native_loader, trackml


@pytest.mark.skipif(not native_loader.available(),
                    reason="native loader not built")
def test_native_matches_pandas_on_trackml_event():
    cfg = PipelineConfig()
    ev = trackml.DEFAULT_EVENT
    nx_, nv, nt, np_, nex = native_loader.load_event_arrays_native(
        ev.nodes_csv, ev.edges_csv, ev.truth_csv,
        cfg.min_volume, cfg.max_volume)
    px, pv, pt, pp, pex = trackml.load_event_arrays(ev, cfg)
    np.testing.assert_allclose(nx_, px)
    assert np.array_equal(nv, pv)
    assert np.array_equal(nt, pt)
    assert np.array_equal(np_, pp)
    assert np.array_equal(nex["node_ids"], pex["node_ids"])
    for i in [0, 5, 100, len(nt) - 1]:
        assert np.array_equal(np.sort(nex["hit_ids"][i]),
                              np.sort(pex["hit_ids"][i]))
        assert np.array_equal(np.sort(np.asarray(nex["module_ids"][i])),
                              np.sort(np.asarray(pex["module_ids"][i])))

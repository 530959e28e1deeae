from gnn_track_finding_tpu.graph.state import GraphState  # noqa: F401

"""Micro-benchmark of the device CCA variants at full-event scale.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_cca.py
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time


def main() -> None:
    import jax
    from gnn_track_finding_tpu.utils.platform import ensure_backend
    ensure_backend()
    jax.config.update("jax_compilation_cache_dir",
                      f"/root/repo/.jax_cache/{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    from gnn_track_finding_tpu.config import PipelineConfig
    from gnn_track_finding_tpu.data import trackml
    from gnn_track_finding_tpu.graph import cca
    from gnn_track_finding_tpu.models import pipeline

    cfg = PipelineConfig(min_volume=7, max_volume=14)
    g, _ = trackml.load_event(trackml.DEFAULT_EVENT, cfg, dtype=jnp.float32)
    print(f"[cca] {g.n_nodes} nodes / {g.n_edges} edges, "
          f"backend={jax.default_backend()}", file=sys.stderr)
    g = pipeline._prepare_jit(g, cfg)
    g1 = pipeline._stage_jit(g, cfg, 1, None)   # realistic deactivation
    ok = g1.edge_mask & g1.active

    @jax.jit
    def nop(x):
        return x + 1
    nop(jnp.int32(0)).item()
    t = time.time()
    for _ in range(5):
        nop(jnp.int32(0)).item()
    rtt = (time.time() - t) / 5

    import functools
    n_rep = 10
    for name, fn in [
            ("paired", cca.connected_components_paired),
            ("fastsv-j1", functools.partial(cca.connected_components_fastsv,
                                            jumps=1)),
            ("fastsv-j2", cca.connected_components_fastsv),
            ("fastsv-j3", functools.partial(cca.connected_components_fastsv,
                                            jumps=3)),
            ("fastsv-j4", functools.partial(cca.connected_components_fastsv,
                                            jumps=4)),
            ("fastsv-w1", functools.partial(cca.connected_components_fastsv,
                                            warmup_rounds=1)),
            ("gated-r5", lambda gg, okk: cca.connected_components_gated(
                gg, okk, max_size=cfg.max_track_hits)[0]),
            ("tables", cca.connected_components_tables)]:
        # the loop body must DEPEND on the carry: with loop-invariant
        # inputs XLA hoists the whole CCA out of the fori_loop and the
        # "per-iteration" time reads ~n_rep-fold too fast (the round-3
        # "2.1 ms" regression of exactly this bench).  Perturb the edge
        # mask with an always-false carry-dependent bit instead.
        @jax.jit
        def loop(gg, okk, fn=fn):
            def body(i, acc):
                ok_i = okk & (acc < jnp.int32(2 ** 30))
                return acc + fn(gg, ok_i).sum() % jnp.int32(65536)
            return jax.lax.fori_loop(0, n_rep, body, jnp.int32(0))
        chk = loop(g1, ok).item()
        t0 = time.time()
        chk = loop(g1, ok).item()
        dt = (time.time() - t0 - rtt) / n_rep
        # same labels?
        lab = np.asarray(jax.jit(fn)(g1, ok))
        print(f"{name:10s} {dt * 1e3:8.2f} ms  (checksum {chk}, "
              f"n_components {len(np.unique(lab[np.asarray(g1.node_mask)]))})")


if __name__ == "__main__":
    main()

"""Compare clustering backends (XLA masked-batch vs Pallas VMEM kernel)
on the real TPU at full-event scale, plus the stage bits around them.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_cluster_backends.py
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--volumes", nargs=2, type=int, default=[7, 14])
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    import jax
    from gnn_track_finding_tpu.utils.platform import ensure_backend
    ensure_backend()
    jax.config.update("jax_compilation_cache_dir",
                      f"/root/repo/.jax_cache/{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from gnn_track_finding_tpu.config import PipelineConfig
    from gnn_track_finding_tpu.data import trackml
    from gnn_track_finding_tpu.models import pipeline
    from gnn_track_finding_tpu.ops import clustering

    cfg = PipelineConfig(min_volume=args.volumes[0],
                         max_volume=args.volumes[1])
    g, _ = trackml.load_event(trackml.DEFAULT_EVENT, cfg, dtype=jnp.float32)
    print(f"[clb] N={g.num_padded_nodes} E={g.num_padded_edges} "
          f"backend={jax.default_backend()}", file=sys.stderr)
    g = pipeline._prepare_jit(g, cfg)
    g1 = pipeline._stage_jit(g, cfg, 1, None)

    @jax.jit
    def _nop(x):
        return x + 1.0
    _ = _nop(jnp.float32(0)).item()
    t = time.time()
    for _ in range(5):
        _ = _nop(jnp.float32(0)).item()
    rtt = (time.time() - t) / 5
    n = args.n

    def measure(name, fn, state):
        @jax.jit
        def loop(s):
            def body(_, st):
                return fn(st)
            out = jax.lax.fori_loop(0, n, body, s)
            return out.merged_state.sum() + out.active.sum().astype(out.dtype)
        t0 = time.time()
        _ = loop(state).item()
        first = time.time() - t0
        t0 = time.time()
        _ = loop(state).item()
        dt = (time.time() - t0 - rtt) / n
        print(f"{name:36s} {dt * 1e3:8.2f} ms/iter  (first {first:.1f}s)")

    measure("cluster xla (seed)",
            lambda s: clustering.cluster(s, cfg, False, backend="xla"), g)
    measure("cluster pallas (seed)",
            lambda s: clustering.cluster(s, cfg, False, backend="pallas"), g)
    measure("cluster xla (updated)",
            lambda s: clustering.cluster(s, cfg, True, backend="xla"), g1)
    measure("cluster pallas (updated)",
            lambda s: clustering.cluster(s, cfg, True, backend="pallas"), g1)


if __name__ == "__main__":
    main()

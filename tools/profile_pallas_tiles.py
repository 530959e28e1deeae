"""Lane-tile sweep for the pallas clustering kernel (hoist-proof).

Usage: python tools/profile_pallas_tiles.py [--n 20]
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
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--tiles", nargs="*", type=int,
                    default=[256, 512, 1024, 2048, 4096])
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

    cfg = PipelineConfig(min_volume=7, max_volume=14)
    g, _ = trackml.load_event(trackml.DEFAULT_EVENT, cfg, dtype=jnp.float32)
    g = pipeline._prepare_jit(g, cfg)
    g1 = pipeline._stage_jit(g, cfg, 1, None)
    print(f"[tiles] N={g.num_padded_nodes} backend={jax.default_backend()}",
          file=sys.stderr)

    @jax.jit
    def _nop(x):
        return x + 1.0
    _ = _nop(jnp.float32(0)).item()
    t = time.time()
    for _ in range(5):
        _ = _nop(jnp.float32(0)).item()
    rtt = (time.time() - t) / 5
    n = args.n

    def dep_upd(s):
        f = (s.merged_state.sum() < 2.0 ** 100).astype(s.dtype)
        return s.replace(upd_prior=s.upd_prior * f)

    for t_ in args.tiles:
        @jax.jit
        def loop(s, t_=t_):
            def body(_, st):
                return clustering.cluster(dep_upd(st), cfg, True,
                                          backend="pallas", pallas_tile=t_)
            out = jax.lax.fori_loop(0, n, body, s)
            return out.merged_state.sum() + out.active.sum().astype(out.dtype)
        try:
            t0 = time.time()
            _ = loop(g1).item()
            first = time.time() - t0
            t0 = time.time()
            _ = loop(g1).item()
            dt = (time.time() - t0 - rtt) / n
            print(f"pallas tile={t_:5d}  {dt * 1e3:8.2f} ms/iter  "
                  f"(first {first:.1f}s)", flush=True)
        except Exception as e:  # VMEM OOM at large tiles
            print(f"pallas tile={t_:5d}  FAILED: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()

"""Pileup-batch throughput on ONE chip: batched vmap vs sequential.

The "data" axis of the multi-chip design (SURVEY.md section 2.3) only
pays if batching events into one program beats running them back to back
on the same chip — bigger kernels amortize launch overhead and fill the
VPU between the gather/scatter phases.  This measures the full
3-iteration fused pipeline (pipeline.full_pipeline incl. device CCA) on
B copies of the full TrackML event (identical values, which is fine for
a shape-driven throughput measure), fused inside one jit per variant
with a scalar checksum to force completion (CLAUDE.md methodology).

Usage: python tools/bench_pileup.py [--batch 3] [--volumes 7 14]
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
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--n", type=int, default=3)
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
    from gnn_track_finding_tpu.parallel import mesh as pmesh

    cfg = PipelineConfig(min_volume=args.volumes[0],
                         max_volume=args.volumes[1])
    g, _ = trackml.load_event(trackml.DEFAULT_EVENT, cfg, dtype=jnp.float32)
    b = args.batch
    n = args.n
    print(f"[pileup] backend={jax.default_backend()} N={g.num_padded_nodes} "
          f"E={g.num_padded_edges} B={b}", file=sys.stderr)

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def seq(gr, cfg):
        # B sequential events x n reps fused in one jit
        def body(i, carry):
            acc, chk = carry
            gg = gr.replace(xyzr=gr.xyzr + chk * 1e-30)
            final, accepted, _ = pipeline.full_pipeline(gg, cfg)
            return (acc + accepted.sum(),
                    chk + final.active.sum().astype(gr.dtype) * 1e-30)
        acc, _ = jax.lax.fori_loop(
            0, b * n, body, (jnp.int32(0), jnp.asarray(0.0, g.dtype)))
        return acc

    batch = pmesh.stack_events([g] * b)

    @functools.partial(jax.jit, static_argnums=1)
    def par(gb, cfg):
        def body(i, carry):
            acc, chk = carry
            gg = jax.tree.map(lambda x: x, gb)
            gg = gg.replace(xyzr=gb.xyzr + chk * 1e-30)
            accepted = jax.vmap(
                lambda e: pipeline.full_pipeline(e, cfg)[1].sum())(gg)
            return acc + accepted.sum(), chk + accepted.sum().astype(g.dtype) * 1e-30
        acc, _ = jax.lax.fori_loop(
            0, n, body, (jnp.int32(0), jnp.asarray(0.0, g.dtype)))
        return acc

    t0 = time.time()
    c1 = seq(g, cfg).item()
    print(f"[pileup] sequential compile+first {time.time() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    c1 = seq(g, cfg).item()
    t_seq = (time.time() - t0) / (b * n)

    t0 = time.time()
    c2 = par(batch, cfg).item()
    print(f"[pileup] batched compile+first {time.time() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    c2 = par(batch, cfg).item()
    t_par = (time.time() - t0) / (b * n)

    print(f"[pileup] sequential {t_seq:.3f} s/event "
          f"({1.0 / t_seq:.3f} events/s, checksum {c1})")
    print(f"[pileup] batched(B={b}) {t_par:.3f} s/event "
          f"({1.0 / t_par:.3f} events/s, checksum {c2})")
    print(f"[pileup] batching speedup x{t_seq / t_par:.3f}")


if __name__ == "__main__":
    main()

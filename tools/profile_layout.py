"""Measure (E,3,3)-tensor einsum math vs componentwise (E,) lane math.

Hypothesis: minor dims of size 3 waste the (8,128) VPU tile, so batched
3x3 algebra should run as tuples of (E,) component vectors.
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

    from gnn_track_finding_tpu.ops import linalg

    E = 344064
    dt = jnp.float32

    @jax.jit
    def _nop(x):
        return x + 1.0
    _ = _nop(jnp.float32(0)).item()
    t = time.time()
    for _ in range(5):
        _ = _nop(jnp.float32(0)).item()
    rtt = (time.time() - t) / 5
    print(f"[layout] backend={jax.default_backend()} rtt={rtt*1e3:.1f}ms",
          file=sys.stderr)

    n = 50

    def measure(name, fn, x):
        @jax.jit
        def loop(x0):
            def body(_, c):
                return fn(c)
            return jax.lax.fori_loop(0, n, body, x0)
        r = loop(x)
        _ = jax.tree_util.tree_leaves(r)[0].sum().item()
        t0 = time.time()
        r = loop(x)
        _ = jax.tree_util.tree_leaves(r)[0].sum().item()
        dt_ = (time.time() - t0 - rtt) / n
        print(f"{name:40s} {dt_ * 1e3:8.3f} ms/iter")

    key = jax.random.PRNGKey(0)
    F = jax.random.normal(key, (E, 3, 3), dt)
    C = jax.random.normal(key, (E, 3, 3), dt)

    # 1. einsum sandwich on (E,3,3)
    def f_einsum(c):
        out = linalg.sandwich3(F, c)
        return out + 1e-30
    measure("sandwich3 einsum (E,3,3)", f_einsum, C)

    # 2. componentwise sandwich on 9 x (E,)
    Fc = tuple(F[:, i, j] for i in range(3) for j in range(3))
    Cc = tuple(C[:, i, j] for i in range(3) for j in range(3))

    def cw_matmul(a, b):  # a@b, row-major 9-tuples
        return tuple(
            a[3 * i + 0] * b[3 * 0 + j]
            + a[3 * i + 1] * b[3 * 1 + j]
            + a[3 * i + 2] * b[3 * 2 + j]
            for i in range(3) for j in range(3))

    def cw_sandwich(f, c):
        fc = cw_matmul(f, c)
        # (f c) f^T : out[i,j] = sum_k fc[i,k] f[j,k]
        return tuple(
            fc[3 * i + 0] * f[3 * j + 0]
            + fc[3 * i + 1] * f[3 * j + 1]
            + fc[3 * i + 2] * f[3 * j + 2]
            for i in range(3) for j in range(3))

    def f_cw(cc):
        out = cw_sandwich(Fc, cc)
        return tuple(o + 1e-30 for o in out)
    measure("sandwich componentwise 9x(E,)", f_cw, Cc)

    # 3. the (E,3,3) <-> components conversion cost
    def f_conv(c):
        cc = tuple(c[:, i, j] for i in range(3) for j in range(3))
        out = cw_sandwich(Fc, cc)
        m = jnp.stack([jnp.stack(out[3 * i:3 * i + 3], -1) for i in range(3)],
                      -2)
        return m + 1e-30
    measure("convert+cw+stack (E,3,3)", f_conv, C)

    # 4. plain elementwise on (E,3,3) vs (E,)
    measure("elementwise mul (E,3,3)", lambda c: c * 1.0000001, C)
    measure("elementwise mul 9x(E,)",
            lambda cc: tuple(x * 1.0000001 for x in cc), Cc)

    # 5. division and transcendental cost on (E,)
    x = jnp.abs(jax.random.normal(key, (E,), dt)) + 0.5
    measure("div (E,)", lambda v: 1.0 / v, x)
    measure("rsqrt (E,)", lambda v: jax.lax.rsqrt(v), x)
    measure("arctan2+sin+cos (E,)",
            lambda v: jnp.sin(jnp.arctan2(v, 1.0 + v)) + jnp.cos(
                jnp.arctan2(v, 1.0 + v)), x)
    measure("exp (E,)", lambda v: jnp.exp(-v), x)


if __name__ == "__main__":
    main()

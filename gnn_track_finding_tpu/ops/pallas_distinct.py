"""Pallas TPU kernel for the side-norm distinct-x counts.

The reweight side norms need, per node and side, the number of DISTINCT
neighbour-x values among its active updated in-edges (len(set()) at
helper.py:127-134).  The XLA formulation is a masked (N, K, K)
first-occurrence compare cube — at K=64 that is 235M lanes of bool
intermediates round-tripping HBM, measured ~6.7 ms per reweight pass at
full event (tools/profile_extrap_parts.py), twice per extrapolation
stage.  This kernel keeps a lane-tile of nodes entirely in VMEM in the
node-minor layout of ops/pallas_cluster.py: x and ok tables load once as
(K, T) blocks, a K-step fori_loop compares row i against the whole block
(the lower-triangle mask via iota), and HBM sees each input exactly once
plus a (2, T) output.

Numerics are the integers of priors._distinct_counts exactly (raw-value
float equality, strict lower-triangle "earlier", sides from x < node_x);
equality is asserted in tests/test_pallas_distinct.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512


def _kernel(x_ref, ok_ref, nodex_ref, out_ref):
    # statically unrolled over K (Mosaic has no dynamic_slice; static row
    # slices of the VMEM-resident block are free)
    k, t = x_ref.shape
    dt = x_ref.dtype
    xall = x_ref[:, :]                       # (K, T)
    okall = ok_ref[:, :] > 0
    leftall = xall < nodex_ref[0, :][None, :]
    one = jnp.ones((1, t), dt)
    zero = jnp.zeros((1, t), dt)
    cl = zero
    cr = zero
    for i in range(k):
        xi = xall[i:i + 1, :]
        oki = okall[i:i + 1, :]
        li = leftall[i:i + 1, :]
        if i == 0:
            first = oki
        else:
            dup = jnp.any(okall[:i] & (xall[:i] == xi) & (leftall[:i] == li),
                          axis=0, keepdims=True)
            first = oki & ~dup
        cl = cl + jnp.where(first & li, one, zero)
        cr = cr + jnp.where(first & ~li, one, zero)
    out_ref[0, :] = cl[0]
    out_ref[1, :] = cr[0]


def distinct_counts_tile(ok_slot: jax.Array, x_slot: jax.Array,
                         node_x: jax.Array, interpret: bool = False,
                         tile: int | None = None) -> jax.Array:
    """(N, 2) distinct-x counts per (node, side) from the (N, K) tables.

    Same contract as priors._distinct_counts with left_slot derived from
    x_slot < node_x (the production call shape)."""
    n, k = x_slot.shape
    dt = x_slot.dtype
    tile = min(TILE, n) if tile is None else tile
    assert n % tile == 0, (n, tile)
    ispec = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(n // tile,),
        in_specs=[ispec(k), ispec(k), ispec(1)],
        out_specs=ispec(2),
        out_shape=jax.ShapeDtypeStruct((2, n), dt),
        interpret=interpret,
    )(x_slot.T, ok_slot.astype(jnp.int32).T, node_x[None, :])
    return out.T

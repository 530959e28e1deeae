"""Gather utilities for TPU-friendly lowering.

Measured on v5e: gathers of 1-element rows lower to a pathological path
(hundreds of ms for ~300k lookups) while rows of width >= 2 run at memory
speed (~1.7 ms).  `gather1d` therefore packs a 1-D operand into width-2
rows before gathering; `table_lookup` implements two-index lookups as a
row gather + take_along_axis (the direct x[idx, slot] form lowers ~3x
slower).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather1d(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x[idx] for 1-D x via the width-2 row-packing fast path."""
    return jnp.stack([x, x], axis=-1)[idx, 0]


def table_lookup(table: jax.Array, row: jax.Array, col: jax.Array) -> jax.Array:
    """table[row, col] via row gather + take_along_axis."""
    return jnp.take_along_axis(table[row], col[..., None], axis=-1)[..., 0]

"""Batched closed-form small-matrix algebra.

The reference leans on np.linalg.inv for 2x2/3x3 matrices inside per-node
Python loops (clustering.py:20,91-105; helper.py:384).  On TPU those become
closed-form cofactor expressions vectorised over the edge axis — pure VPU
elementwise math with no dynamic shapes, which XLA fuses into the
surrounding kernels.  All functions broadcast over arbitrary leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def tiny(dtype):
    """Smallest safe positive guard constant for the dtype (1e-300
    underflows to 0 in float32, defeating division guards)."""
    return jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-30, dtype)


def det2(m):
    return m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]


def inv2(m):
    """Closed-form inverse of (..., 2, 2)."""
    d = det2(m)
    inv = jnp.stack([
        jnp.stack([m[..., 1, 1], -m[..., 0, 1]], axis=-1),
        jnp.stack([-m[..., 1, 0], m[..., 0, 0]], axis=-1),
    ], axis=-2)
    return inv / d[..., None, None]


def det3(m):
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def adj3(m):
    """Adjugate (transposed cofactor matrix) of (..., 3, 3)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    row0 = jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1)
    row1 = jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1)
    row2 = jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def inv3(m):
    """Closed-form inverse of (..., 3, 3)."""
    return adj3(m) / det3(m)[..., None, None]


def mat3_vec(m, v):
    """(..., 3, 3) @ (..., 3) -> (..., 3)."""
    return jnp.einsum("...ij,...j->...i", m, v)


def mat3_mat(a, b):
    """(..., 3, 3) @ (..., 3, 3)."""
    return jnp.einsum("...ij,...jk->...ik", a, b)


def sandwich3(f, c):
    """F C F^T for (..., 3, 3) operands."""
    return jnp.einsum("...ij,...jk,...lk->...il", f, c, f)


def merge_gaussians(mean1, cov1, mean2, cov2):
    """Inverse-variance-weighted merge of two 3D Gaussians.

    Multivariate inverse-variance weighting as in clustering.py:97-105 and
    extrapolate_merged_states.py:15-23:
      C = (C1^-1 + C2^-1)^-1,  mu = C (C1^-1 mu1 + C2^-1 mu2).
    """
    i1 = inv3(cov1)
    i2 = inv3(cov2)
    merged_cov = inv3(i1 + i2)
    merged_mean = mat3_vec(merged_cov, mat3_vec(i1, mean1) + mat3_vec(i2, mean2))
    return merged_mean, merged_cov


def kl_distance(mean1, cov1, mean2, cov2, bug_compat: bool = True):
    """Symmetrised KL-style distance between two 3D Gaussians.

    Reference: clustering.py:90-94.  NOTE the reference computes
    ``np.trace((cov1 - cov2) * (inv2 - inv1))`` with ELEMENTWISE ``*`` on
    ndarray operands, so the trace sums the elementwise product's diagonal
    rather than a matrix product's.  bug_compat=True reproduces that;
    False uses the proper matrix-product trace.
    """
    i1 = inv3(cov1)
    i2 = inv3(cov2)
    dc = cov1 - cov2
    di = i2 - i1
    if bug_compat:
        trace = jnp.einsum("...ii->...", dc * di)
    else:
        trace = jnp.einsum("...ij,...ji->...", dc, di)
    dm = mean1 - mean2
    quad = jnp.einsum("...i,...ij,...j->...", dm, i1 + i2, dm)
    return trace + quad

"""Pallas TPU kernel for the GMR clustering inner loop.

The XLA path (ops/clustering.py) expresses the per-node pairwise
Mahalanobis matrix + 14-step greedy KL absorption as masked batched ops
and a lax.scan; every scan step round-trips (N,16,3,3) carries through
HBM and the one-hot state selections gather tile-sized slices — ~10 GB of
real traffic per call.  This kernel keeps a tile of nodes entirely in
VMEM: states live as (16*d, T) blocks with the node axis on lanes, the
pair loop and the greedy loop are fully unrolled vector ops, and HBM sees
each input exactly once.

Numerics follow clustering.py:11-124,228-316 exactly (same quirks as the
XLA path: X-coordinate endcap test under bug_compat, elementwise-product
trace in the KL distance, nonzero-minimum pair selection); equality with
the XLA path is asserted in tests/test_pallas_cluster.py.

Layout: inputs are transposed host-side to node-minor (rows, N) form:
  jsv   (48, N)   joint states     [k*3 + c]
  jcov  (144, N)  joint covs       [k*9 + r*3 + c]
  psv   (48, N)   parabolic states
  pcov  (144, N)  parabolic covs
  prior (16, N)
  valid (16, N)   int32 0/1
  nbx   (64, N)   neighbour xyzr   [k*4 + c]
  nodex (4, N)    node xyzr
  gate  (1, N)    int32: 3..15 member edges
  klthr (1, N)    per-node KL threshold (LUT or broadcast scalar)
outputs:
  found (1, N) int32, pm (3, N), pc (9, N), mprior (1, N), deact (16, N)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnn_track_finding_tpu.config import PipelineConfig

K = 16      # default table width == reference's upper degree gate
TILE = 512  # default lane-tile; parameterizable via cluster_tile(tile=...)


def _inv2(a, b, c, d):
    """Inverse of [[a, b], [c, d]] (elementwise over lanes)."""
    det = a * d - b * c
    inv_det = 1.0 / det
    return d * inv_det, -b * inv_det, -c * inv_det, a * inv_det


def _inv3(m):
    """Closed-form inverse of a 3x3 given as tuple of 9 lane-vectors."""
    a, b, c, d, e, f, g, h, i = m
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    idet = 1.0 / det
    return tuple(x * idet for x in (A, B, C, D, E, F, G, H, I))


def _mat3_vec(m, v):
    a, b, c, d, e, f, g, h, i = m
    x, y, z = v
    return (a * x + b * y + c * z, d * x + e * y + f * z,
            g * x + h * y + i * z)


def _mat3_add(m1, m2):
    return tuple(x + y for x, y in zip(m1, m2))


def _merge(mean1, cov1, mean2, cov2):
    """Inverse-variance merge (clustering.py:97-105) on lane vectors."""
    i1 = _inv3(cov1)
    i2 = _inv3(cov2)
    s = _mat3_add(i1, i2)
    mc = _inv3(s)
    mv = _mat3_vec(i1, mean1)
    mv2 = _mat3_vec(i2, mean2)
    mm = _mat3_vec(mc, tuple(x + y for x, y in zip(mv, mv2)))
    return mm, mc


def _kl_pre(mean1, cov1, i1, mean2, cov2, i2, bug_compat):
    """clustering.py:90-94 (elementwise-product trace under bug_compat).

    Takes both inverses PRECOMPUTED: i1 (per-k, loop-invariant across the
    greedy steps) and i2 (the running merged cov's inverse, shared by all
    K distance evaluations of a step) — hoisting them out of the (step, k)
    double loop removes ~2/3 of the kernel's vector ops while producing
    bit-identical values (same products, same order)."""
    if bug_compat:
        tr = sum((cov1[d] - cov2[d]) * (i2[d] - i1[d]) for d in (0, 4, 8))
    else:
        # proper matrix-product trace
        tr = 0.0
        for r in range(3):
            for cc in range(3):
                tr = tr + (cov1[r * 3 + cc] - cov2[r * 3 + cc]) * (
                    i2[cc * 3 + r] - i1[cc * 3 + r])
    dm = tuple(mean1[d] - mean2[d] for d in range(3))
    si = tuple(i1[d] + i2[d] for d in range(9))
    q = _mat3_vec(si, dm)
    quad = sum(dm[d] * q[d] for d in range(3))
    return tr + quad


def _kernel(cfg: PipelineConfig, chi2_thr: float, K: int,
            jsv_ref, jcov_ref, psv_ref, pcov_ref, prior_ref, valid_ref,
            nbx_ref, nodex_ref, gate_ref, klthr_ref,
            found_ref, pm_ref, pc_ref, mprior_ref, deact_ref):
    dt = jsv_ref.dtype
    big = jnp.asarray(jnp.inf, dt)

    jsv = [tuple(jsv_ref[k * 3 + d, :] for d in range(3)) for k in range(K)]
    jcov = [tuple(jcov_ref[k * 9 + d, :] for d in range(9)) for k in range(K)]
    psv = [tuple(psv_ref[k * 3 + d, :] for d in range(3)) for k in range(K)]
    pcov = [tuple(pcov_ref[k * 9 + d, :] for d in range(9)) for k in range(K)]
    prior = [prior_ref[k, :] for k in range(K)]
    valid = [valid_ref[k, :] > 0 for k in range(K)]
    nbx = [tuple(nbx_ref[k * 4 + d, :] for d in range(4)) for k in range(K)]
    node = tuple(nodex_ref[d, :] for d in range(4))
    gate = gate_ref[0, :] > 0
    klthr = klthr_ref[0, :]

    s_rz = cfg.sigma0rz
    s_rz2 = cfg.sigma0rz2

    def sig(coord):
        endcap = jnp.abs(coord) >= cfg.endcap_boundary
        sz = jnp.where(endcap, s_rz, s_rz2)
        sr = jnp.where(endcap, s_rz2, s_rz)
        return sz, sr

    # endcap test coordinate: X under bug_compat (clustering.py:49-57)
    test_col = 0 if cfg.bug_compat else 2
    sza, sra = sig(node[test_col])
    z_a, r_a = node[2], node[3]

    # ---- pairwise chi2 minimum (clustering.py:11-86,119-124) ----
    best = jnp.full_like(klthr, jnp.inf)
    bi = jnp.zeros_like(klthr, dtype=jnp.int32)
    bj = jnp.zeros_like(bi)
    for i in range(1, K):
        szb, srb = sig(nbx[i][test_col])
        z_b, r_b = nbx[i][2], nbx[i][3]
        inv_b = 1.0 / (r_b - r_a)
        tau_b = (z_b - z_a) * inv_b
        for j in range(i):
            # [a, b] block
            da = jsv[i][0] - jsv[j][0]
            db = jsv[i][1] - jsv[j][1]
            c00 = jcov[i][0] + jcov[j][0]
            c01 = jcov[i][1] + jcov[j][1]
            c10 = jcov[i][3] + jcov[j][3]
            c11 = jcov[i][4] + jcov[j][4]
            i00, i01, i10, i11 = _inv2(c00, c01, c10, c11)
            d1 = da * (i00 * da + i01 * db) + db * (i10 * da + i11 * db)
            # delta-tau
            szc, src_ = sig(nbx[j][test_col])
            z_c, r_c = nbx[j][2], nbx[j][3]
            inv_c = 1.0 / (r_c - r_a)
            tau_c = (z_c - z_a) * inv_c
            j2 = inv_b
            j3 = -inv_c
            j1 = -j3 - j2
            j5 = -(z_b - z_a) * inv_b * inv_b
            j6 = (z_c - z_a) * inv_c * inv_c
            j4 = -j5 - j6
            var_dt = (j1 * j1 * sza * sza + j2 * j2 * szb * szb
                      + j3 * j3 * szc * szc + j4 * j4 * sra * sra
                      + j5 * j5 * srb * srb + j6 * j6 * src_ * src_)
            d2 = (tau_b - tau_c) ** 2 / var_dt
            chi2 = d1 + d2
            ok = valid[i] & valid[j] & (chi2 != 0.0)
            chi2 = jnp.where(ok, chi2, big)
            upd = chi2 < best
            best = jnp.where(upd, chi2, best)
            bi = jnp.where(upd, i, bi)
            bj = jnp.where(upd, j, bj)

    found = gate & (best < chi2_thr)

    # ---- VECTORISED-OVER-K phase (round 4) -------------------------------
    # The greedy absorption used to run every per-k computation as its own
    # (T,)-vector op inside Python loops — ~22k tiny ops per tile whose
    # fixed issue cost dominated the kernel (14.6 ms measured vs ~1 ms of
    # raw VPU work).  Stacking the K axis into (K, T) blocks runs each
    # formula ONCE over all K states; numerics are bit-identical (same
    # per-(k, lane) arithmetic; one-hot selects sum exactly one nonzero
    # term; min/first-match reproduces the XLA backend's jnp.min/argmin
    # semantics including NaN propagation and first-occurrence ties).
    # f32 rows stack fine; BOOL/i1 stacks hit a Mosaic vreg-cast bug, so
    # valid/prior come straight off their (K, T) refs
    stack = lambda rows: jnp.stack(rows, axis=0)                # (K, T)
    jsv_s = tuple(stack([jsv[k][d] for k in range(K)]) for d in range(3))
    psv_s = tuple(stack([psv[k][d] for k in range(K)]) for d in range(3))
    jcov_s = tuple(stack([jcov[k][d] for k in range(K)]) for d in range(9))
    pcov_s = tuple(stack([pcov[k][d] for k in range(K)]) for d in range(9))
    prior_s = prior_ref[:, :]                                   # (K, T)
    valid_s = valid_ref[:, :] > 0

    # guard: unfound lanes get identity covs to keep inverses finite
    # (same values as the per-k `fix` of the scalar kernel)
    eye = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    fnd = found[None, :]
    pcov_safe = tuple(jnp.where(fnd, c, e) for c, e in zip(pcov_s, eye))
    jcov_safe = tuple(jnp.where(fnd, c, e) for c, e in zip(jcov_s, eye))
    inv_pcov = _inv3(pcov_safe)            # tuples of (K, T)
    inv_jcov = _inv3(jcov_safe)
    ivm_p = _mat3_vec(inv_pcov, psv_s)
    ivm_j = _mat3_vec(inv_jcov, jsv_s)

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K,) + found.shape, 0)

    def sel(onehot, comps):
        """One-hot contraction (K, T) x (K, T) -> (T,) per component."""
        return tuple(jnp.sum(jnp.where(onehot, c, 0.0), axis=0)
                     for c in comps)

    def merge_pre(i1, mv1, i2, mv2):
        """_merge given precomputed inverses and inverse-times-means."""
        s = _mat3_add(i1, i2)
        mc = _inv3(s)
        mm = _mat3_vec(mc, tuple(x + y for x, y in zip(mv1, mv2)))
        return mm, mc

    oi = iota_k == bi[None, :]
    oj = iota_k == bj[None, :]
    pm, pc = merge_pre(sel(oi, inv_pcov), sel(oi, ivm_p),
                       sel(oj, inv_pcov), sel(oj, ivm_p))
    jm, jc = merge_pre(sel(oi, inv_jcov), sel(oi, ivm_j),
                       sel(oj, inv_jcov), sel(oj, ivm_j))
    mprior = (sel(oi, (prior_s,))[0] + sel(oj, (prior_s,))[0])

    remaining = valid_s & ~oi & ~oj                             # (K, T)
    stopped = ~found

    # ---- greedy KL absorption, 14 masked steps (clustering.py:261-287) ----
    for _ in range(K - 2):
        # the running covs' inverses: computed ONCE per step, shared by
        # all K KL evaluations and the merge
        i2j = _inv3(jc)
        i2p = _inv3(pc)
        # all K KL distances in one set of vector ops ((K, T) vs (T,)
        # broadcast); masked slots carry +inf like the XLA path
        kl = _kl_pre(jsv_s, jcov_safe, inv_jcov, jm, jc, i2j,
                     cfg.bug_compat)
        kl = jnp.where(remaining, kl, big)
        kval = jnp.min(kl, axis=0)                              # (T,)
        # first-occurrence argmin as a one-hot: inclusive prefix count of
        # min-matches == 1 exactly at the first match (exact XLA argmin
        # tie semantics).  Mosaic has no cumsum; the prefix rides a tiny
        # (K, K) @ (K, T) lower-triangular matmul on the MXU (counts are
        # small integers, exact in f32).
        is_min = kl == kval[None, :]
        tri = jnp.tril(jnp.ones((K, K), dt))
        prefix = jnp.dot(tri, is_min.astype(dt),
                         preferred_element_type=dt)
        first = is_min & (prefix == 1.0)                        # (K, T)
        do = (~stopped) & (kval < klthr)

        s_pr = sel(first, (prior_s,))[0]
        npm, npc = merge_pre(sel(first, inv_pcov), sel(first, ivm_p),
                             i2p, _mat3_vec(i2p, pm))
        njm, njc = merge_pre(sel(first, inv_jcov), sel(first, ivm_j),
                             i2j, _mat3_vec(i2j, jm))
        pm = tuple(jnp.where(do, a, b) for a, b in zip(npm, pm))
        pc = tuple(jnp.where(do, a, b) for a, b in zip(npc, pc))
        jm = tuple(jnp.where(do, a, b) for a, b in zip(njm, jm))
        jc = tuple(jnp.where(do, a, b) for a, b in zip(njc, jc))
        mprior = jnp.where(do, mprior + s_pr, mprior)
        remaining = remaining & ~(first & do[None, :])
        stopped = stopped | ~do

    found_ref[0, :] = found.astype(jnp.int32)
    for d in range(3):
        pm_ref[d, :] = pm[d]
    for d in range(9):
        pc_ref[d, :] = pc[d]
    mprior_ref[0, :] = mprior
    deact_ref[:, :] = (remaining & fnd).astype(jnp.int32)


def cluster_tile(cfg: PipelineConfig, chi2_thr: float,
                 jsv, jcov, psv, pcov, prior, valid, nbx, nodex, gate, klthr,
                 interpret: bool = False, tile: int | None = None):
    """Invoke the kernel over a (rows, N) node-minor problem; N % tile == 0.

    The table width K is derived from the inputs (prior is (K, N)); tile
    defaults to min(TILE, N) — pass a smaller tile for interpreter-mode
    tests."""
    n = jsv.shape[1]
    k = prior.shape[0]
    assert jsv.shape[0] == 3 * k and nbx.shape[0] == 4 * k, (jsv.shape, k)
    dt = jsv.dtype
    kernel = functools.partial(_kernel, cfg, chi2_thr, k)
    if tile is None:
        # n <= TILE: one tile of the whole problem (old behaviour).
        # n > TILE: the gcd always divides n — covers shard row counts
        # that are not multiples of the default lane-tile (e.g. N/D for
        # non-power-of-two device counts in ops/clustering._cluster_sharded)
        import math
        tile = n if n <= TILE else math.gcd(n, TILE)
    assert n % tile == 0, (n, tile)
    grid = (n // tile,)
    ispec = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((1, n), jnp.int32),    # found
        jax.ShapeDtypeStruct((3, n), dt),           # pm
        jax.ShapeDtypeStruct((9, n), dt),           # pc
        jax.ShapeDtypeStruct((1, n), dt),           # mprior
        jax.ShapeDtypeStruct((k, n), jnp.int32),    # deact
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ispec(3 * k), ispec(9 * k), ispec(3 * k), ispec(9 * k),
                  ispec(k), ispec(k), ispec(4 * k), ispec(4), ispec(1),
                  ispec(1)],
        out_specs=(ispec(1), ispec(3), ispec(9), ispec(1), ispec(k)),
        out_shape=out_shape,
        interpret=interpret,
    )(jsv, jcov, psv, pcov, prior, valid, nbx, nodex, gate, klthr)

"""Two-level (smoothed rigid-body aggregation) preconditioning for PCG.

Block-Jacobi PCG on a slender-frame stiffness suffers the classic
low-energy-mode problem: smooth global deformations are invisible to a 6x6
nodal smoother, so iteration counts grow ~O(chain length) with refinement
(measured in round 2, docs/ARCHITECTURE.md section 4).  The cure is a
coarse space that carries those modes — and for frames the right tentative
basis is per-aggregate RIGID BODY MODES (the near-null space of the
unconstrained operator), SMOOTHED so the coarse functions are low-energy:

- nodes are partitioned host-side into connected aggregates of ~target
  size (greedy BFS over the member graph; for ``refine_model`` meshes the
  aggregates naturally align with member chains);
- each aggregate carries 6 coarse DOFs (3 translations + 3 rotations about
  its centroid); the TENTATIVE prolongator P_tent maps aggregate rigid
  motion to nodal DOFs, P_i = [[I, -S(r_i)], [0, I]] with r_i the node's
  centroid offset (mm, matching the solver's N/mm units);
- one damped-Jacobi smoothing pass P = (I - omega D_bj^-1 A) P_tent
  removes the inter-aggregate displacement jumps that make piecewise-rigid
  fields high-energy (smoothed aggregation, Vanek/Mandel/Brezina 1996 —
  MEASURED here: unsmoothed aggregation cut iterations only 1.1x; one
  omega = 0.5 pass cuts 6.9x, see below);
- the Galerkin coarse operator A_c = P^T A P is dense-assembled and
  Cholesky-factored once; the preconditioner is the additive two-level
  combination M^-1 = D_bj^-1 + P A_c^-1 P^T (sum of SPD terms -> SPD,
  CG-safe; the symmetric multiplicative variant was A/B'd and its 2 extra
  matvecs/iteration were not repaid: 589-900 iterations either way).

Everything per-iteration is one dense [6n, 6n_agg] matvec pair and a tiny
triangular solve — no sequential sweeps (an IC(0)/SSOR forward-backward
substitution would serialize ~n_nodes steps on TPU, which is exactly the
scan-depth cost the condensation solver already pays deliberately).

Measured on the refined jacket (f64, storm-wave RHS): block-Jacobi
4,275 iterations -> two-level 621 at 9,612 DOF (6.9x, tol 1e-10), and
669 iterations at 19,404 DOF (tol 1e-9, solution matches the exact
condensation solver to 2.8e-12) — near-REFINEMENT-INDEPENDENT iteration
counts, the signature of a working coarse space, where block-Jacobi
grows ~O(n_seg).  The distributed variant at n_seg=16 (4,716 DOF) is
asserted >= 3x in tests/test_pcg_precond.py.  This closes BASELINE.md's
"IC-preconditioned CG" role for general sparse meshes (the reference has
one dense LAPACK solve, `/root/reference/JacketAnalysisGUI_v2.py:485`).

Scale note: the smoothed prolongator is stored DENSE ([6n, 6 n_agg]);
``build_coarse_space`` caps n_agg at ~192 aggregates so memory stays
O(100 MB) up to ~100k DOF.  The 1e5+ tier of THIS framework is served by
the exact chain condensation (ops/condense.py) by design; the PCG tier
exists for general imported meshes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import BCSRMatrix, bcsr_matvec


def aggregate_nodes(conn, n_nodes: int, target_size: int = 32) -> np.ndarray:
    """Partition the node graph into connected aggregates of ~target_size
    (host-side, greedy BFS; runs once per mesh).

    Uses the native C++ kit when built (bit-identical traversal order —
    tested in tests/test_native.py); pure-Python BFS otherwise."""
    conn = np.asarray(conn)
    try:
        from ..native import aggregate_nodes_native
        out = aggregate_nodes_native(conn, n_nodes, target_size)
    except Exception:
        out = None
    if out is not None:
        return out
    # adjacency via sorted half-edges
    src = np.concatenate([conn[:, 0], conn[:, 1]])
    dst = np.concatenate([conn[:, 1], conn[:, 0]])
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    ptr = np.searchsorted(src_s, np.arange(n_nodes + 1))

    agg = np.full(n_nodes, -1, dtype=np.int64)
    next_agg = 0
    for seed in range(n_nodes):
        if agg[seed] >= 0:
            continue
        # BFS from the seed over unassigned nodes
        frontier = [seed]
        agg[seed] = next_agg
        count = 1
        while frontier and count < target_size:
            nxt = []
            for u in frontier:
                for v in dst_s[ptr[u]:ptr[u + 1]]:
                    if agg[v] < 0:
                        agg[v] = next_agg
                        nxt.append(v)
                        count += 1
                        if count >= target_size:
                            break
                if count >= target_size:
                    break
            frontier = nxt
        next_agg += 1
    return agg


def aggregates_from_pattern(pattern, target_size: int = 32,
                            max_aggregates: int = 192) -> np.ndarray:
    """Host-side aggregation over the BCSR pattern's node graph (the
    off-diagonal blocks ARE the adjacency).  Run once per mesh, outside
    jit; the result feeds :func:`build_coarse_space`.  ``target_size`` is
    raised as needed to keep the aggregate count <= ``max_aggregates``
    (the dense-prolongator memory bound)."""
    br = np.asarray(pattern.block_rows)
    bc = np.asarray(pattern.block_cols)
    off = br != bc
    edges = np.stack([br[off], bc[off]], axis=1)
    tsz = max(int(target_size), -(-pattern.n_nodes // max_aggregates))
    return aggregate_nodes(edges, pattern.n_nodes, tsz)


class CoarseSpace(NamedTuple):
    """Smoothed rigid-body coarse space: dense P plus the factored A_c."""

    P: jnp.ndarray        # [6n, 6 n_agg] smoothed prolongator
                          # (fixed-DOF rows zeroed)
    L_c: jnp.ndarray      # lower Cholesky of the scaled coarse operator
    scale: jnp.ndarray    # [6 n_agg] symmetric Jacobi scaling of A_c
    n_agg: int


def _skew(r):
    z = jnp.zeros_like(r[..., 0])
    return jnp.stack([
        jnp.stack([z, -r[..., 2], r[..., 1]], axis=-1),
        jnp.stack([r[..., 2], z, -r[..., 0]], axis=-1),
        jnp.stack([-r[..., 1], r[..., 0], z], axis=-1),
    ], axis=-2)


def build_coarse_space(A: BCSRMatrix, coords, fixed_mask, agg=None,
                       n_agg: int | None = None, target_size: int = 32,
                       omega: float = 0.5,
                       n_smooth: int = 1) -> CoarseSpace:
    """Build the smoothed prolongator and factor A_c = P^T A P (once per
    (mesh, K); two multi-RHS SpMVs + one small Cholesky).

    ``agg``/``n_agg``: host-computed aggregate ids
    (:func:`aggregates_from_pattern`) and their count — REQUIRED when
    calling under jit (the aggregation itself is host-side graph
    traversal; n_agg must be static); computed on the fly otherwise.
    ``omega``/``n_smooth``: damped-Jacobi prolongator smoothing (the A/B
    in the module docstring picked 0.5 / 1).
    """
    n = A.pattern.n_nodes
    if agg is None:
        agg = aggregates_from_pattern(A.pattern, target_size)
    if n_agg is None:
        n_agg = int(np.asarray(agg).max()) + 1
    dtype = A.blocks.dtype

    coords = jnp.asarray(coords)
    agg = jnp.asarray(agg)
    # centroids (metres), offsets in mm to match the N/mm DOF units
    cent = jax.ops.segment_sum(coords, agg, num_segments=n_agg) \
        / jax.ops.segment_sum(jnp.ones((n,), coords.dtype), agg,
                              num_segments=n_agg)[:, None]
    r_mm = (coords - cent[agg]) * 1000.0

    eye3 = jnp.eye(3, dtype=dtype)
    Z3 = jnp.zeros((n, 3, 3), dtype)
    top = jnp.concatenate([jnp.broadcast_to(eye3, (n, 3, 3)),
                           -_skew(r_mm).astype(dtype)], axis=-1)
    bot = jnp.concatenate([Z3, jnp.broadcast_to(eye3, (n, 3, 3))], axis=-1)
    Pb = jnp.concatenate([top, bot], axis=-2)              # [n, 6, 6]
    free = jnp.logical_not(jnp.asarray(fixed_mask)).astype(dtype)
    free6 = jnp.repeat(free, 6)
    Pb = Pb * free[:, None, None]                          # zero fixed rows

    # dense tentative prolongator via one-hot aggregate membership
    onehot = (agg[:, None] == jnp.arange(n_agg)[None, :]).astype(dtype)
    P = jnp.einsum("na,nij->niaj", onehot, Pb).reshape(6 * n, 6 * n_agg)

    # damped-Jacobi smoothing: P <- (I - omega D_bj^-1 A) P
    from .assembly import bcsr_block_diagonal
    mask = free6.reshape(n, 6)
    eye6 = jnp.eye(6, dtype=dtype)
    Dm = bcsr_block_diagonal(A) * mask[:, :, None] * mask[:, None, :] \
        + eye6 * (1.0 - mask)[:, :, None]
    from .solve import spd_block_inv
    Dinv = spd_block_inv(Dm)  # Cholesky-based: f64 LU is unimplemented on TPU

    def dinv_mat(X):
        Xb = X.reshape(n, 6, -1)
        return jnp.einsum("nij,njk->nik", Dinv, Xb).reshape(6 * n, -1)

    # multi-RHS SpMV chunked over the coarse-column axis: bcsr_matvec
    # gathers [n_blocks, 6, n_cols] per call, which at ~100k DOF with the
    # full 6*n_agg column block is a multi-GB intermediate that XLA padded
    # past HBM (observed 18 GB alloc / compile OOM on the v5e).  A
    # lax.map over 128-column chunks bounds it at ~150 MB; the coarse
    # build runs once per (mesh, K), so the serialization is free.
    def amat(X, chunk: int = 128):
        ncols = X.shape[1]
        if ncols <= chunk:
            return bcsr_matvec(A, X)
        pad = (-ncols) % chunk
        Xp = jnp.pad(X, ((0, 0), (0, pad)))
        Xc = jnp.moveaxis(Xp.reshape(6 * n, -1, chunk), 1, 0)
        Yc = jax.lax.map(lambda xc: bcsr_matvec(A, xc), Xc)
        return jnp.moveaxis(Yc, 0, 1).reshape(6 * n, -1)[:, :ncols]

    for _ in range(n_smooth):
        P = P - omega * dinv_mat(amat(P))
        P = P * free6[:, None]

    # Galerkin coarse operator, symmetric Jacobi scaling + tiny shift;
    # inactive coarse DOFs (fully fixed aggregates / zero columns) get
    # identity rows so the Cholesky stays defined and the correction is
    # exactly zero there
    Ac = P.T @ amat(P)
    d = jnp.diagonal(Ac)
    active = d > 1e-12 * jnp.max(d)
    ds = jnp.where(active, 1.0 / jnp.sqrt(jnp.where(active, d, 1.0)), 0.0)
    Acs = Ac * ds[:, None] * ds[None, :]
    idx = jnp.arange(6 * n_agg)
    Acs = Acs.at[idx, idx].set(jnp.where(active, Acs[idx, idx] + 1e-10, 1.0))
    L_c = jnp.linalg.cholesky(Acs)
    return CoarseSpace(P=P, L_c=L_c, scale=ds, n_agg=n_agg)


def coarse_solve(cs: CoarseSpace, rc):
    """A_c^{-1} rc through the scaled Cholesky factor."""
    y = cs.scale * rc
    y = jax.scipy.linalg.solve_triangular(cs.L_c, y, lower=True)
    y = jax.scipy.linalg.solve_triangular(cs.L_c.T, y, lower=False)
    return cs.scale * y


def two_level_preconditioner(block_jacobi, cs: CoarseSpace):
    """Additive two-level preconditioner: D_bj^-1 + P A_c^-1 P^T.

    ``block_jacobi``: the existing nodal smoother callable
    (:func:`.solve.block_jacobi_preconditioner` output).  The sum of two
    SPD operators is SPD, so plain CG applies unchanged.
    """
    def precond(r):
        return block_jacobi(r) + cs.P @ coarse_solve(cs, cs.P.T @ r)
    return precond

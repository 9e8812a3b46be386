"""Modal analysis: consistent mass matrices and natural frequencies.

A capability upgrade beyond the reference, which explicitly excludes
dynamics (`/root/reference/JacketAnalysisGUI_v2.py` Info tab: "no dynamics")
— yet natural periods are the first thing a jacket designer checks against
the wave period to rule out resonance.  Implemented with the same batched
tensor style as the statics: stacked consistent element mass matrices
(classical Euler-Bernoulli translational + axial + torsional terms,
Przemieniecki form), congruence-transformed and assembled exactly like K,
then a symmetric generalized eigenproblem

    K phi = omega^2 M phi   ->   (L_M^-1 K L_M^-T) y = omega^2 y

via the Cholesky factor of M_ff — all jnp, so it runs jitted on TPU (f64 on
CPU for validation).

Unit system: K is N/mm, displacements mm / rad, so M carries tonnes
(1 t = 1 N s^2/mm) and t*mm^2 for rotary terms; omega comes out in rad/s.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .beams import element_stiffness, local_axes, transformation_matrices
from .sections import TubeSections


def _build_mass_patterns():
    """Constant 12x12 patterns: M_local = rho A L * P0 + rho Ix L * P1
    + rho A L * L * P2 + rho A L * L^2 * P3   (bending terms split by their
    L power so the contraction stays one matmul)."""
    P = np.zeros((4, 12, 12))

    def sym(c, i, j, v):
        P[c, i, j] += v
        if i != j:
            P[c, j, i] += v

    # axial (dofs 0, 6) and torsion (3, 9): (1/6)[[2,1],[1,2]]
    for c, (i, j) in [(0, (0, 6)), (1, (3, 9))]:
        sym(c, i, i, 2.0 / 6.0)
        sym(c, j, j, 2.0 / 6.0)
        sym(c, i, j, 1.0 / 6.0)

    # bending in local y (v=1, theta_z=5 | v=7, theta_z=11), /420
    b = 1.0 / 420.0
    sym(0, 1, 1, 156 * b); sym(0, 7, 7, 156 * b); sym(0, 1, 7, 54 * b)
    sym(2, 1, 5, 22 * b); sym(2, 7, 11, -22 * b)
    sym(2, 1, 11, -13 * b); sym(2, 5, 7, 13 * b)
    sym(3, 5, 5, 4 * b); sym(3, 11, 11, 4 * b); sym(3, 5, 11, -3 * b)

    # bending in local z (w=2, theta_y=4 | w=8, theta_y=10); theta_y = -w'
    sym(0, 2, 2, 156 * b); sym(0, 8, 8, 156 * b); sym(0, 2, 8, 54 * b)
    sym(2, 2, 4, -22 * b); sym(2, 8, 10, 22 * b)
    sym(2, 2, 10, 13 * b); sym(2, 4, 8, -13 * b)
    sym(3, 4, 4, 4 * b); sym(3, 10, 10, 4 * b); sym(3, 4, 10, -3 * b)
    return P.reshape(4, 144)


_MPAT = _build_mass_patterns()


def element_mass(coords, conn, sec: TubeSections, sect_id):
    """Stacked global-frame consistent mass matrices [M, 12, 12] (tonnes)."""
    c1 = coords[conn[:, 0]]
    c2 = coords[conn[:, 1]]
    dL = c2 - c1
    L = jnp.linalg.norm(dL, axis=-1)              # m
    L_mm = L * 1000.0
    dtype = coords.dtype

    rho_t = sec.rho_steel[sect_id] * 1e-12        # t/mm^3
    A = sec.Ax[sect_id]                           # mm^2
    Ix = sec.Ix[sect_id]                          # mm^4
    mAL = rho_t * A * L_mm                        # t
    mIx = rho_t * Ix * L_mm                       # t mm^2

    coeffs = jnp.stack([mAL, mIx, mAL * L_mm, mAL * L_mm**2], axis=-1)
    pat = jnp.asarray(_MPAT, dtype=dtype)
    M_local = (coeffs @ pat).reshape(-1, 12, 12)

    R = local_axes(dL, L)
    T = transformation_matrices(R)
    return jnp.einsum("mji,mjk,mkl->mil", T, M_local, T)


class ModalResults(NamedTuple):
    frequencies_hz: jnp.ndarray    # [n_modes]
    omega: jnp.ndarray             # [n_modes] rad/s
    periods_s: jnp.ndarray         # [n_modes]
    mode_shapes: jnp.ndarray       # [n_modes, n_dof] (zeros at fixed DOFs)
    total_mass_t: jnp.ndarray      # structural mass [tonnes]


def modal_analysis(model, n_modes: int = 10, E: float = 210000.0,
                   nu: float = 0.3, topside_mass_t: float = 0.0) -> ModalResults:
    """Natural frequencies/mode shapes of the (supported) structure.

    ``topside_mass_t`` lumps an optional deck mass equally onto the top
    nodes' translational DOFs — the dominant dynamic effect for jackets.
    Dense path (fine to a few thousand DOF).
    """
    from .assembly import assemble_dense
    from .solve import free_fixed_dofs

    dtype = model.coords.dtype
    G = E / (2.0 * (1.0 + nu))
    Kg, _, _, L_m = element_stiffness(model.coords, model.conn,
                                      model.sections, model.sect_id, E, G)
    Mg = element_mass(model.coords, model.conn, model.sections, model.sect_id)
    K = assemble_dense(Kg, model.conn, model.n_dof)
    M = assemble_dense(Mg, model.conn, model.n_dof)

    if topside_mass_t:
        top = np.where(np.asarray(model.top_mask))[0]
        per = topside_mass_t / max(len(top), 1)
        for i in top:
            for c in range(3):
                M = M.at[6 * i + c, 6 * i + c].add(per)

    free, _ = free_fixed_dofs(model.fixed_mask)
    free = jnp.asarray(free)
    K_ff = K[jnp.ix_(free, free)]
    M_ff = M[jnp.ix_(free, free)]

    Lm = jnp.linalg.cholesky(M_ff)
    Y = jax.scipy.linalg.solve_triangular(Lm, K_ff, lower=True)
    A = jax.scipy.linalg.solve_triangular(Lm, Y.T, lower=True)
    A = 0.5 * (A + A.T)
    w2, V = jnp.linalg.eigh(A)
    w2 = jnp.clip(w2[:n_modes], 0.0)
    omega = jnp.sqrt(w2)
    phi_f = jax.scipy.linalg.solve_triangular(Lm.T, V[:, :n_modes],
                                              lower=False)
    shapes = jnp.zeros((n_modes, model.n_dof), dtype=dtype)
    shapes = shapes.at[:, free].set(phi_f.T)

    mass_per_m = model.sections.mass_per_m[model.sect_id]
    total_mass = jnp.sum(mass_per_m * L_m) / 1000.0 + topside_mass_t
    return ModalResults(
        frequencies_hz=omega / (2.0 * jnp.pi),
        omega=omega,
        periods_s=jnp.where(omega > 0, 2.0 * jnp.pi / omega, jnp.inf),
        mode_shapes=shapes,
        total_mass_t=total_mass,
    )

"""Damage-tolerance (member-removal) robustness screen.

Beyond-reference capability: offshore standards (ISO 19902 sec. 7 /
NORSOK N-001 ALS) require the structure to survive the accidental loss of
any single (non-critical) member — boat impact, dropped object, fatigue
severance.  The reference cannot express this at all; here the screen
re-analyzes EVERY single-member-removed configuration in one vmapped
device program: damaged stiffness = K_intact - (the member's assembled
block), batched Jacobi-scaled Cholesky over the damage axis, shared load
vector.  For an M-member jacket that is M complete FEM solutions in one
jit call.

Simplifications (documented): the removed member keeps attracting its
hydrodynamic load share (conservative for screening — the load re-routes
through the same nodes); loads are the INTACT case's (ALS practice pairs
damage with a reduced environment — pass that case).  A damaged
configuration whose stiffness goes singular (the member was load-path
critical) shows up as a non-finite solution and is flagged rather than
crashing the batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import assemble_dense
from .beams import element_stiffness, internal_forces
from .morison import hydro_members, morison_loads
from .sections import von_mises_8pt
from .solve import factor_dense, free_fixed_dofs, solve_factored


class RemovalScreen(NamedTuple):
    """One row per removed member (the damage axis)."""

    max_util: jnp.ndarray          # [M] peak utilization of the OTHERS
    max_displacement_mm: jnp.ndarray  # [M]
    stable: jnp.ndarray            # [M] bool: finite, solvable state
    critical: jnp.ndarray          # [M] bool: unstable OR utilization > 1
    governing_member: jnp.ndarray  # [M] int: worst OTHER member
    intact_util: jnp.ndarray       # [] intact-state peak utilization


def member_removal_screen(model, wave, case, n_gauss: int = 15,
                          accel: str = "analytic",
                          support_stiffness=None) -> RemovalScreen:
    """Single-member-removal screen over every member, one vmapped solve.

    ``critical[m]`` marks members whose loss makes the damaged state
    unstable (singular stiffness) or drives another member past yield
    (utilization > 1) — the redundancy ranking ALS design starts from.
    """
    dtype = model.coords.dtype
    G = case.E / (2.0 * (1.0 + case.nu))
    with jax.default_matmul_precision("highest"):
        Kg, K_local, T, L_m = element_stiffness(
            model.coords, model.conn, model.sections, model.sect_id,
            case.E, G, release=model.release)
        K = assemble_dense(Kg, model.conn, model.n_dof)

        conn_h, D_m, Cd_h, Cm_h = hydro_members(model, case.marine_growth_mm,
                                                case.Cd, case.Cm)
        mor = morison_loads(wave, model.coords, conn_h, D_m,
                            case.wave_dir_deg, case.current_dir_deg,
                            Cd_h, Cm_h, case.rho_water, case.t_analysis,
                            n_gauss=n_gauss, accel=accel,
                            slam_cs=case.slam_cs)
        from ..api import assemble_loads
        F = assemble_loads(model, case, mor.nodal_forces, L_m)

        if support_stiffness is not None:
            from .solve import support_spring_nodes
            ks = jnp.asarray(support_spring_nodes(
                model.fixed_mask, support_stiffness).reshape(-1), dtype)
            idx = jnp.arange(model.n_dof)
            K = K.at[idx, idx].add(ks)
            free = idx
        else:
            free_np, _ = free_fixed_dofs(model.fixed_mask)
            free = jnp.asarray(free_np)

        dofs = jnp.concatenate([6 * model.conn[:, 0:1] + jnp.arange(6),
                                6 * model.conn[:, 1:2] + jnp.arange(6)],
                               axis=-1)
        M = model.n_members
        eye_drop = 1.0 - jnp.eye(M, dtype=dtype)           # [M, M] keep mask

        def solve_intact():
            U = solve_factored(factor_dense(K, free), F)
            F1, _ = internal_forces(K_local, T, U[dofs])
            vm = von_mises_8pt(model.sections, model.sect_id,
                               F1[:, 0], F1[:, 1], F1[:, 2],
                               F1[:, 3], F1[:, 4], F1[:, 5])
            return jnp.max(vm) / case.fy

        def removed(m):
            # damaged stiffness: subtract member m's assembled block
            d1 = dofs[m]
            Km = K.at[jnp.ix_(d1, d1)].add(-Kg[m])
            U = solve_factored(factor_dense(Km, free), F)
            F1, _ = internal_forces(K_local, T, U[dofs])
            vm = von_mises_8pt(model.sections, model.sect_id,
                               F1[:, 0], F1[:, 1], F1[:, 2],
                               F1[:, 3], F1[:, 4], F1[:, 5])
            util = vm / case.fy * eye_drop[m]              # exclude itself
            disp = jnp.max(jnp.linalg.norm(U.reshape(-1, 6)[:, :3], axis=-1))
            return jnp.max(util), disp, jnp.argmax(util)

        util_d, disp_d, gov = jax.vmap(removed)(jnp.arange(M))
        intact = solve_intact()

    stable = jnp.isfinite(util_d) & jnp.isfinite(disp_d) \
        & (disp_d < 1e7)
    critical = jnp.logical_or(~stable, util_d > 1.0)
    return RemovalScreen(
        max_util=util_d,
        max_displacement_mm=disp_d,
        stable=stable,
        critical=critical,
        governing_member=gov,
        intact_util=intact,
    )

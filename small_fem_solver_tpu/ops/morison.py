"""Morison-equation hydrodynamic member loading, fully vectorized.

Capability parity with the reference ``MorisonCalculator``
(`/root/reference/JacketAnalysisGUI_v2.py:539-724`), redesigned TPU-first:
the reference loops Python-side over members and 15 Gauss points, calling the
wave model ~765 times per load evaluation; here all (member, quadrature
point) kinematics are evaluated in ONE call to the Fourier wave kernel on an
``[M, Q]`` grid, the drag/inertia integrands are masked elementwise by
submergence, and nodal forces come from a ``segment_sum`` scatter.  The whole
thing jits and vmaps over wave phase and over (H, T, heading) case batches.

Semantics replicated exactly for 1e-8 parity:

- compass-to-math heading conversion theta = deg2rad(90 - dir)
  (`JacketAnalysisGUI_v2.py:555-556`);
- 2D wave kinematics sampled along the wave heading, current re-split onto
  its own heading with the wave-only u = u - U_c trick (`:559-589`);
- fixed n-point Gauss-Legendre line quadrature with s = (xi+1)/2,
  w = weight/2 (`:615-617`);
- perpendicular decomposition, drag threshold |U_perp| > 1e-10 (`:641-651`);
- drag 0.5 rho Cd D |U_perp| U_perp L w, inertia rho Cm (pi D^2/4) A_perp L w
  (`:649-652`);
- lever-rule nodal split F1 += (1-s) f, F2 += s f, forces only (no end
  moments) (`:658-662`);
- dry points contribute nothing, including to submerged length (`:626-628`).

Outputs are in N (SI evaluation: D in m, rho in kg/m^3).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .waves import FourierWave, kinematics


def gauss_legendre_01(n: int, dtype=np.float64):
    """Nodes/weights of n-point Gauss-Legendre on [0, 1] (host constant).

    Matches the reference's use of ``numpy.polynomial.legendre.leggauss``
    with s = (xi+1)/2, w = weight/2 (`JacketAnalysisGUI_v2.py:615-617`).
    """
    xi, wt = np.polynomial.legendre.leggauss(n)
    return (xi.astype(dtype) + 1.0) / 2.0, wt.astype(dtype) / 2.0


class MorisonLoads(NamedTuple):
    """Result pytree of one Morison evaluation (units: N, m)."""

    nodal_forces: jnp.ndarray     # [n_nodes, 3]
    total_drag: jnp.ndarray       # [3]
    total_inertia: jnp.ndarray    # [3]
    total_morison: jnp.ndarray    # [3]
    member_drag: jnp.ndarray      # [M, 3]
    member_inertia: jnp.ndarray   # [M, 3]
    member_submerged_length: jnp.ndarray  # [M]


def morison_loads(
    wave: FourierWave,
    coords: jnp.ndarray,
    conn: jnp.ndarray,
    D_m: jnp.ndarray,
    wave_dir_deg,
    current_dir_deg,
    Cd,
    Cm,
    rho_water,
    t,
    n_gauss: int = 15,
    accel: str = "fd",
) -> MorisonLoads:
    """Morison drag+inertia loads for all members at time ``t``.

    ``D_m``: [M] member outer diameters in metres
    (= section D_mm / 1000, `JacketAnalysisGUI_v2.py:610`).
    """
    dtype = coords.dtype
    theta_w = jnp.deg2rad(jnp.asarray(90.0 - wave_dir_deg, dtype=dtype))
    theta_c = jnp.deg2rad(jnp.asarray(90.0 - current_dir_deg, dtype=dtype))
    cos_w, sin_w = jnp.cos(theta_w), jnp.sin(theta_w)
    cos_c, sin_c = jnp.cos(theta_c), jnp.sin(theta_c)

    c1 = coords[conn[:, 0]]
    c2 = coords[conn[:, 1]]
    dL = c2 - c1
    L = jnp.linalg.norm(dL, axis=-1)                      # [M]
    e = dL / L[:, None]                                   # [M, 3]

    s, w = gauss_legendre_01(n_gauss)
    s = jnp.asarray(s, dtype=dtype)                       # [Q]
    w = jnp.asarray(w, dtype=dtype)

    pos = c1[:, None, :] + s[None, :, None] * dL[:, None, :]   # [M, Q, 3]
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]

    # 2D kinematics sampled along the wave heading (`:559-563`)
    x_wave = x * cos_w + y * sin_w
    kin = kinematics(wave, x_wave, z, jnp.asarray(t, dtype=dtype), accel=accel)
    sub = kin.submerged                                   # [M, Q] bool
    subf = sub.astype(dtype)

    # split wave and current contributions onto their headings (`:572-589`)
    u_wave_only = kin.u - wave.U_c
    U = jnp.stack([
        u_wave_only * cos_w + wave.U_c * cos_c,
        u_wave_only * sin_w + wave.U_c * sin_c,
        kin.w,
    ], axis=-1)                                           # [M, Q, 3]
    A = jnp.stack([kin.du_dt * cos_w, kin.du_dt * sin_w, kin.dw_dt], axis=-1)

    # perpendicular decomposition (`:641-643`)
    eb = e[:, None, :]
    U_perp = U - jnp.sum(U * eb, axis=-1, keepdims=True) * eb
    A_perp = A - jnp.sum(A * eb, axis=-1, keepdims=True) * eb
    U_mag = jnp.linalg.norm(U_perp, axis=-1)

    D = D_m[:, None]
    Lw = (L[:, None] * w[None, :])                        # [M, Q] line measure
    A_cross = jnp.pi * D**2 / 4.0

    drag_on = jnp.logical_and(sub, U_mag > 1e-10).astype(dtype)  # (`:648-651`)
    F_drag = (0.5 * rho_water * Cd * D * U_mag * Lw)[..., None] * U_perp \
        * drag_on[..., None]
    F_inertia = (rho_water * Cm * A_cross * Lw)[..., None] * A_perp \
        * subf[..., None]

    f = F_drag + F_inertia                                # [M, Q, 3]

    # lever-rule end split (`:658-659`)
    F1 = jnp.sum((1.0 - s)[None, :, None] * f, axis=1)    # [M, 3]
    F2 = jnp.sum(s[None, :, None] * f, axis=1)

    member_drag = jnp.sum(F_drag, axis=1)
    member_inertia = jnp.sum(F_inertia, axis=1)
    submerged_length = jnp.sum(Lw * subf, axis=1)

    n_nodes = coords.shape[0]
    contrib = jnp.concatenate([F1, F2], axis=0)
    nodes = jnp.concatenate([conn[:, 0], conn[:, 1]])
    nodal = jax.ops.segment_sum(contrib, nodes, num_segments=n_nodes)

    total_drag = jnp.sum(member_drag, axis=0)
    total_inertia = jnp.sum(member_inertia, axis=0)
    return MorisonLoads(
        nodal_forces=nodal,
        total_drag=total_drag,
        total_inertia=total_inertia,
        total_morison=total_drag + total_inertia,
        member_drag=member_drag,
        member_inertia=member_inertia,
        member_submerged_length=submerged_length,
    )


class PhaseScan(NamedTuple):
    """Result of a vmapped critical-phase scan (`JacketAnalysisGUI_v2.py:684-724`)."""

    t: jnp.ndarray            # [S]
    phase_deg: jnp.ndarray    # [S]
    total_kN: jnp.ndarray     # [S]
    drag_kN: jnp.ndarray      # [S]
    inertia_kN: jnp.ndarray   # [S]
    F_kN: jnp.ndarray         # [S, 3]
    critical_index: jnp.ndarray
    nodal_forces: jnp.ndarray | None = None  # [S, n_nodes, 3] (optional)


def phase_scan(
    wave: FourierWave,
    coords, conn, D_m,
    wave_dir_deg, current_dir_deg, Cd, Cm, rho_water,
    n_steps: int = 36,
    n_gauss: int = 15,
    accel: str = "fd",
    keep_nodal: bool = False,
) -> PhaseScan:
    """Scan one wave period for the critical phase — as ONE vmapped batch.

    The reference runs n_steps serial Python re-evaluations
    (`JacketAnalysisGUI_v2.py:695-700`); here the phase axis is a vmap, so a
    360-point scan is a single XLA program.  Matches the reference's
    sampling t_i = i T / n_steps and its argmax over |total_morison|.
    """
    dtype = coords.dtype
    i = jnp.arange(n_steps, dtype=dtype)
    ts = i * wave.T / n_steps

    def one(t):
        r = morison_loads(wave, coords, conn, D_m, wave_dir_deg,
                          current_dir_deg, Cd, Cm, rho_water, t,
                          n_gauss=n_gauss, accel=accel)
        out = (r.total_morison, r.total_drag, r.total_inertia)
        return out + ((r.nodal_forces,) if keep_nodal else ())

    res = jax.vmap(one)(ts)
    total, drag, inertia = res[0], res[1], res[2]
    total_kN = jnp.linalg.norm(total, axis=-1) / 1000.0
    phase_deg = jnp.degrees(wave.omega * ts) % 360.0
    crit = jnp.argmax(total_kN)
    return PhaseScan(
        t=ts,
        phase_deg=phase_deg,
        total_kN=total_kN,
        drag_kN=jnp.linalg.norm(drag, axis=-1) / 1000.0,
        inertia_kN=jnp.linalg.norm(inertia, axis=-1) / 1000.0,
        F_kN=total / 1000.0,
        critical_index=crit,
        nodal_forces=res[3] if keep_nodal else None,
    )

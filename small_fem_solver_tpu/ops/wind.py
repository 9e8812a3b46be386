"""Wind loading: API RP 2A wind profile, member drag and topside block.

The reference carries wind only implicitly — the user hand-computes a
topside shear and types it into the Loads tab
(`/root/reference/JacketAnalysisGUI_v2.py:1466-1478`).  This module
computes wind loads from a wind SPEED, the way API RP 2A section 2.3.2
prescribes, batched in jnp so it rides inside every jitted load path:

- height profile: the API 1-hour mean power law
  ``u(z) = u_ref (z / z_ref)^alpha`` with ``z_ref = 10 m``,
  ``alpha = 0.125`` (use a gust factor on ``u_ref`` for shorter
  averaging intervals);
- exposed structural members: cylinder drag per unit length
  ``q = 0.5 rho_air Cs D |U_perp| U_perp`` on the above-water span,
  evaluated on the same fixed Gauss-Legendre quadrature as the Morison
  kernel and lever-split to the end nodes (members fully submerged at
  still water see nothing — wave-phase-dependent emergence is a Morison
  effect, not a wind one);
- topside: a block force ``0.5 rho_air Cs A u(z_top)^2`` along the wind
  heading, split over the interface nodes (overturning follows from the
  node elevations).

Compass convention matches the wave/current headings (degrees from
North, clockwise; the math angle is ``90 - dir``,
`JacketAnalysisGUI_v2.py:555-556`).  ``rho_air = 1.226 kg/m^3`` (API).
Wind is steady: the load vector is case-constant, so phase scans and
envelopes see it as a static offset.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

RHO_AIR = 1.226          # kg/m^3 (API RP 2A 2.3.2)
Z_REF_M = 10.0
ALPHA_1H = 0.125         # 1-hour mean power-law exponent


def wind_profile(u_ref_ms, z_m, z_ref: float = Z_REF_M,
                 alpha: float = ALPHA_1H):
    """API power-law wind speed at elevation ``z_m`` above still water.

    Elevations below 0.1 m clamp to the 0.1 m speed (the profile is only
    evaluated above water; the clamp keeps the gradient finite).
    """
    z = jnp.maximum(jnp.asarray(z_m), 0.1)
    return jnp.asarray(u_ref_ms) * (z / z_ref) ** alpha


def wind_member_ends(coords, conn, D_m, u_ref_ms, wind_dir_deg,
                     Cs=0.5, n_gauss: int = 15):
    """Per-member wind end forces (F1, F2) [M, 3] (N) on exposed spans.

    ``coords`` [n, 3] m (z = 0 at still water), ``conn`` [M, 2], ``D_m``
    [M] exposed diameters in metres.  Same Gauss quadrature + lever-rule
    end split as the Morison kernel (`JacketAnalysisGUI_v2.py:615-659`
    replicated there); only points with z > 0 load.
    """
    from .morison import gauss_legendre_01
    dtype = coords.dtype
    theta = jnp.deg2rad(jnp.asarray(90.0 - wind_dir_deg, dtype=dtype))
    wvec = jnp.stack([jnp.cos(theta), jnp.sin(theta),
                      jnp.zeros((), dtype)])              # unit, horizontal

    s_np, w_np = gauss_legendre_01(n_gauss)
    s = jnp.asarray(s_np, dtype=dtype)
    w = jnp.asarray(w_np, dtype=dtype)

    c1 = coords[conn[:, 0]]
    c2 = coords[conn[:, 1]]
    dL = c2 - c1
    L = jnp.linalg.norm(dL, axis=-1)
    e = dL / jnp.maximum(L, 1e-12)[:, None]               # [M, 3]

    pts = c1[:, None, :] + s[None, :, None] * dL[:, None, :]   # [M, Q, 3]
    z = pts[..., 2]
    u = wind_profile(u_ref_ms, z)                         # [M, Q]
    U = u[..., None] * wvec[None, None, :]                # [M, Q, 3]
    Ue = jnp.einsum("mqk,mk->mq", U, e)
    U_perp = U - Ue[..., None] * e[:, None, :]
    U_mag = jnp.linalg.norm(U_perp, axis=-1)

    dry = (z > 0.0).astype(dtype)
    Lw = L[:, None] * w[None, :]
    q = (0.5 * RHO_AIR * jnp.asarray(Cs, dtype) * D_m[:, None]
         * U_mag * Lw * dry)                              # [M, Q]
    f = q[..., None] * U_perp                             # [M, Q, 3]

    F1 = jnp.sum((1.0 - s)[None, :, None] * f, axis=1)
    F2 = jnp.sum(s[None, :, None] * f, axis=1)
    return F1, F2


def wind_member_forces(coords, conn, D_m, u_ref_ms, wind_dir_deg,
                       Cs=0.5, n_gauss: int = 15):
    """Nodal wind forces [n_nodes, 3] (N) + total [3] on exposed members
    (see :func:`wind_member_ends`)."""
    F1, F2 = wind_member_ends(coords, conn, D_m, u_ref_ms, wind_dir_deg,
                              Cs=Cs, n_gauss=n_gauss)
    n_nodes = coords.shape[0]
    ends = jnp.concatenate([F1, F2], axis=0)
    nodes = jnp.concatenate([conn[:, 0], conn[:, 1]])
    nodal = jax.ops.segment_sum(ends, nodes, num_segments=n_nodes)
    return nodal, jnp.sum(F1 + F2, axis=0)


def wind_topside_force(u_ref_ms, area_m2, z_m, Cs=1.0):
    """Topside block wind force magnitude [N] at elevation ``z_m``."""
    u = wind_profile(u_ref_ms, z_m)
    return 0.5 * RHO_AIR * jnp.asarray(Cs) * jnp.asarray(area_m2) * u**2

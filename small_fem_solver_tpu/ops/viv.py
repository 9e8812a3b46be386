"""Vortex-induced vibration (VIV) susceptibility screening.

The reference excludes VIV outright (its Info tab exclusion list,
`/root/reference/JacketAnalysisGUI_v2.py:1544-1799`).  Slender tubular
braces in steady current are the classic jacket VIV case; this module
implements the standard screening an offshore engineer runs before any
detailed VIV fatigue assessment, batched over all members in jnp:

1. Member natural frequency ``f_n`` — first bending mode of each span as
   a uniform beam, ``f_n = (lambda_1^2 / 2 pi L^2) sqrt(EI / m_e)`` with
   clamped-clamped ``lambda_1^2 = 22.373`` (welded jacket bracing) or
   pinned-pinned ``pi^2`` selectable.  The effective mass per unit length
   ``m_e`` includes the steel, the internal fluid of flooded members, and
   the added mass of submerged members (``Ca rho_w pi D^2/4``, hydro
   diameter incl. marine growth).
2. Reduced velocity ``V_r = U / (f_n D)`` with the current speed taken at
   the member midpoint depth (uniform or power-law profile, matching the
   Morison loading options).
3. Stability parameter ``K_s = 2 m_e delta / (rho_w D^2)`` with the
   logarithmic decrement ``delta = 2 pi zeta``.

Onset criteria (DNV-CN 30.5 / DNV-RP-C205 sec. 9 screening values, also
the API RP 2A commentary numbers):

- in-line VIV possible when ``V_r >= 1.0`` and ``K_s <= 1.8``;
- cross-flow VIV possible when ``V_r >= 3.5`` and ``K_s <= 16``.

Reported "utilizations" are onset ratios ``V_r / V_r_onset`` (gated to 0
when the stability parameter suppresses the response or the member is dry),
so ``uc >= 1`` flags a susceptible member.  This is a SCREEN on the steady
current — wave-induced VIV (KC-number dependent) and wind VIV on emerged
members are out of scope and documented as such.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# first-mode frequency coefficients lambda_1^2 for a uniform beam span
_LAMBDA1_SQ = {"fixed": 4.730040744862704**2, "pinned": float(np.pi**2)}

# screening onset values (DNV-CN 30.5 / RP-C205 sec. 9)
VR_ONSET_INLINE = 1.0
VR_ONSET_CROSSFLOW = 3.5
KS_SUPPRESS_INLINE = 1.8
KS_SUPPRESS_CROSSFLOW = 16.0


class VIVScreen(NamedTuple):
    """Per-member VIV screening results (all arrays ``[M]``)."""

    f_n_hz: jnp.ndarray        # first-mode natural frequency of the span
    m_e_kg_m: jnp.ndarray      # effective mass per unit length
    U_ms: jnp.ndarray          # current speed at the member midpoint (0 dry)
    V_r: jnp.ndarray           # reduced velocity U / (f_n D)
    K_s: jnp.ndarray           # stability parameter 2 m_e delta / (rho D^2)
    uc_inline: jnp.ndarray     # V_r / 1.0, 0 when suppressed (K_s) or dry
    uc_crossflow: jnp.ndarray  # V_r / 3.5, 0 when suppressed or dry
    submerged: jnp.ndarray     # bool: midpoint below MWL
    flags: np.ndarray          # str: 'ok' | 'inline' | 'crossflow' | 'both'


def viv_screen(model, U_c, d, rho_water=1025.0, zeta: float = 0.01,
               Ca: float = 1.0, current_alpha=None,
               marine_growth_mm: float = 0.0, flooded: str = "none",
               E: float = 210000.0, end_fixity: str = "fixed") -> VIVScreen:
    """Current-induced VIV susceptibility screen for every member.

    ``model``: the COARSE :class:`..models.model.JacketModel` (spans must be
    the full node-to-node framing lengths — a :func:`refine_model` mesh
    would wrongly shorten them and raise every ``f_n``).
    ``U_c``: surface current speed [m/s]; ``d``: water depth [m];
    ``current_alpha``: power-law exponent for ``U(z) = U_c ((z+d)/d)^a``
    (None = uniform, the reference's current model,
    `JacketAnalysisGUI_v2.py:281`); ``zeta``: structural damping ratio
    (default 1%, bare welded steel in water); ``Ca``: added-mass
    coefficient (1.0 for a circular cylinder; use ``Cm - 1`` to match the
    Morison inertia coefficient); ``flooded``: 'none' | 'legs' | 'all' —
    which member types carry internal water mass (matches the buoyancy
    modes, see ``LoadCase.buoyancy``); ``end_fixity``: 'fixed' (welded,
    default) or 'pinned' (conservative: lower ``f_n``, higher ``V_r``).
    """
    if end_fixity not in _LAMBDA1_SQ:
        raise ValueError("end_fixity must be 'fixed' or 'pinned' "
                         f"(got {end_fixity!r})")
    if flooded not in ("none", "legs", "all"):
        raise ValueError("flooded must be 'none', 'legs' or 'all' "
                         f"(got {flooded!r})")
    lam2 = _LAMBDA1_SQ[end_fixity]

    sec = model.sections
    sid = model.sect_id
    dtype = model.coords.dtype

    c1 = model.coords[model.conn[:, 0]]
    c2 = model.coords[model.conn[:, 1]]
    L = jnp.linalg.norm(c2 - c1, axis=-1)                    # [M] m
    z_mid = 0.5 * (c1[:, 2] + c2[:, 2])                      # m, MWL at 0
    submerged = z_mid < 0.0

    # hydro diameter (incl. marine growth) in m; steel props
    D_h = (sec.D_outer[sid] + 2.0 * marine_growth_mm) / 1000.0
    D_i = sec.D_inner[sid] / 1000.0
    m_steel = sec.mass_per_m[sid]                            # kg/m

    flooded_m = {
        "none": jnp.zeros(model.n_members, dtype=bool),
        "all": jnp.ones(model.n_members, dtype=bool),
        "legs": jnp.asarray([ty == "leg" for ty in model.member_types]),
    }[flooded]
    m_fluid = jnp.where(flooded_m & submerged,
                        rho_water * jnp.pi * D_i**2 / 4.0, 0.0)
    m_added = jnp.where(submerged, Ca * rho_water * jnp.pi * D_h**2 / 4.0,
                        0.0)
    m_e = m_steel + m_fluid + m_added                        # kg/m

    # EI in SI: E [MPa] * I [mm^4] = N mm^2 -> * 1e-6 N m^2
    EI = jnp.asarray(E, dtype) * sec.Iy[sid] * 1e-6
    f_n = lam2 / (2.0 * jnp.pi * L**2) * jnp.sqrt(EI / m_e)  # Hz

    # current at midpoint depth (screen uses still-water submergence)
    U_c = jnp.asarray(U_c, dtype)
    if current_alpha is None:
        U = jnp.where(submerged, U_c, 0.0)
    else:
        frac = jnp.clip((z_mid + d) / d, 0.0, 1.0)
        U = jnp.where(submerged, U_c * frac**current_alpha, 0.0)

    V_r = U / (f_n * D_h)
    delta = 2.0 * jnp.pi * zeta
    K_s = 2.0 * m_e * delta / (rho_water * D_h**2)

    il_on = (K_s <= KS_SUPPRESS_INLINE) & submerged
    cf_on = (K_s <= KS_SUPPRESS_CROSSFLOW) & submerged
    uc_il = jnp.where(il_on, V_r / VR_ONSET_INLINE, 0.0)
    uc_cf = jnp.where(cf_on, V_r / VR_ONSET_CROSSFLOW, 0.0)

    il = np.asarray(uc_il) >= 1.0
    cf = np.asarray(uc_cf) >= 1.0
    flags = np.where(il & cf, "both",
                     np.where(cf, "crossflow", np.where(il, "inline", "ok")))
    return VIVScreen(f_n_hz=f_n, m_e_kg_m=m_e, U_ms=U, V_r=V_r, K_s=K_s,
                     uc_inline=uc_il, uc_crossflow=uc_cf,
                     submerged=submerged, flags=flags)

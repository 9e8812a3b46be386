"""API RP 2A-WSD cylindrical-member strength checks (working stress).

The reference stops at a von Mises yield screen and its Info tab defers
"code checks (API RP 2A / ISO 19902 ...)" to other tools
(`/root/reference/JacketAnalysisGUI_v2.py:1544-1799`).  This module
implements the API RP 2A-WSD (21st ed., section 3.2/3.3) MEMBER strength
checks — the unity checks an offshore structural engineer actually reports
— batched over all members in jnp, fed by the end forces every analysis
already recovers.

Scope (documented, deliberate):

- cylindrical members, axial + bending interaction (3.3.1):
    tension:      ft/Ft + fb/Fb                              <= 1
    compression:  fa/Fa + Cm fb / ((1 - fa/Fe') Fb)          <= 1   (3.3.1-1)
                  fa/(0.6 Fy) + fb/Fb                        <= 1   (3.3.1-2)
                  (the simple sum fa/Fa + fb/Fb when fa/Fa <= 0.15, 3.3.1-3)
- allowable axial tension Ft = 0.6 Fy (3.2.1);
- allowable compression Fa by the AISC column curve (3.2.2) with the
  LOCAL-BUCKLING-reduced yield Fxc for D/t > 60 (3.2.2-3: elastic
  Fxe = 2 C_x E t/D with C_x = 0.3, inelastic
  Fxc = Fy [1.64 - 0.23 (D/t)^(1/4)] <= Fxe);
- allowable bending Fb in the three D/t ranges of 3.2.3-1/2/3 (SI form,
  Fy in MPa):
    Fb = 0.75 Fy                                   for D/t <= 10340/Fy
    Fb = [0.84 - 1.74 Fy D/(E t)] Fy               for D/t <= 20680/Fy
    Fb = [0.72 - 0.58 Fy D/(E t)] Fy               for D/t <= 300
- hydrostatic collapse, punching shear / joint checks, and shear checks
  are NOT implemented (joint classification needs can/stub geometry the
  model does not carry).

Conventions: stresses in MPa; fb is the resultant bending stress
sqrt(fby^2 + fbz^2) at the more-stressed member end; effective length
factors per API table 3.3.1-1 defaults (legs K = 1.0, braces K = 0.8),
Cm = 0.85 (members with lateral loading between restrained ends).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def allowable_tension(Fy):
    """Ft = 0.6 Fy (API RP 2A-WSD 3.2.1-1)."""
    return 0.6 * jnp.asarray(Fy)


def local_buckling_fxc(Fy, E, D_over_t):
    """Local-buckling-reduced axial yield Fxc (3.2.2-3/4).

    For D/t <= 60 the full yield applies; beyond, the inelastic local
    buckling stress Fxc = Fy [1.64 - 0.23 (D/t)^0.25], capped by the
    elastic Fxe = 2 (0.3) E t/D.
    """
    Fy = jnp.asarray(Fy)
    dt = jnp.asarray(D_over_t)
    Fxe = 2.0 * 0.3 * E / dt
    Fxc_inel = Fy * (1.64 - 0.23 * dt**0.25)
    Fxc = jnp.minimum(jnp.minimum(Fxc_inel, Fxe), Fy)
    return jnp.where(dt <= 60.0, Fy, Fxc)


def allowable_compression(Fy, E, KL_over_r, D_over_t):
    """Fa by the AISC/API column curve (3.2.2-1/2) on the local-buckling
    yield Fxc."""
    Fxc = local_buckling_fxc(Fy, E, D_over_t)
    lam = jnp.asarray(KL_over_r)
    Cc = jnp.sqrt(2.0 * jnp.pi**2 * E / Fxc)
    r = lam / Cc
    Fa_inel = (1.0 - 0.5 * r**2) * Fxc / (
        5.0 / 3.0 + 3.0 * r / 8.0 - r**3 / 8.0)
    Fa_el = 12.0 * jnp.pi**2 * E / (23.0 * lam**2)
    return jnp.where(lam < Cc, Fa_inel, Fa_el)


def allowable_bending(Fy, E, D_over_t):
    """Fb in the three D/t ranges of 3.2.3 (SI units, Fy in MPa)."""
    Fy = jnp.asarray(Fy)
    dt = jnp.asarray(D_over_t)
    lim1 = 10340.0 / Fy
    lim2 = 20680.0 / Fy
    Fb1 = 0.75 * Fy
    Fb2 = (0.84 - 1.74 * Fy * dt / E) * Fy
    Fb3 = (0.72 - 0.58 * Fy * dt / E) * Fy
    return jnp.where(dt <= lim1, Fb1, jnp.where(dt <= lim2, Fb2, Fb3))


class CodeCheck(NamedTuple):
    """API RP 2A-WSD member unity checks (all [M] unless noted)."""

    uc: jnp.ndarray               # governing unity check per member
    uc_stability: jnp.ndarray     # 3.3.1-1 (or the tension interaction)
    uc_yield: jnp.ndarray         # 3.3.1-2 (compression) / same (tension)
    fa_mpa: jnp.ndarray           # axial stress (+compression)
    fb_mpa: jnp.ndarray           # resultant bending stress (worst end)
    Fa_mpa: jnp.ndarray           # allowable axial (tension or compression)
    Fb_mpa: jnp.ndarray           # allowable bending
    KL_over_r: jnp.ndarray        # slenderness used
    governing: np.ndarray         # [M] str: 'tension' | 'stability' | 'yield'


def member_code_check(model, results, Fy=None, E=None,
                      K_leg: float = 1.0, K_brace: float = 0.8,
                      Cm: float = 0.85, L_override=None) -> CodeCheck:
    """API RP 2A-WSD strength unity checks from an analysis result.

    ``results``: any :class:`..api.AnalysisResults` (its ``F1_local`` /
    ``F2_local`` member end forces feed the stresses; run the analysis at
    the governing phase — e.g. ``ts[critical_index]`` of a scan).
    ``Fy``/``E`` default to 355 / 210000 MPa.  ``K_leg``/``K_brace``:
    effective-length factors by member type (API table 3.3.1-1 defaults);
    ``L_override`` replaces the member lengths (e.g. face-to-face brace
    lengths) when given.

    Sign conventions: the reference's end-force recovery negates node-1
    forces, so the axial force in member convention is N = -F1[0]
    (positive = compression, matching ops/buckling.py).
    """
    sec = model.sections
    sid = model.sect_id
    Fy = jnp.asarray(355.0 if Fy is None else Fy)
    E = jnp.asarray(210000.0 if E is None else E)

    A = sec.Ax[sid]                          # mm^2
    W = sec.Wy[sid]                          # mm^3 (section modulus)
    D = sec.D_outer[sid]
    t = sec.t[sid]
    dt = D / t
    # radius of gyration of a thin tube r = sqrt(I/A)
    r_gyr = jnp.sqrt(sec.Iy[sid] / A)        # mm

    L_m = results.length_m if L_override is None else jnp.asarray(L_override)
    K = jnp.asarray([K_leg if ty == "leg" else K_brace
                     for ty in model.member_types], dtype=A.dtype)
    KL_r = K * (L_m * 1000.0) / r_gyr

    # stresses from the worse member end (N, N*mm -> MPa)
    N1 = -results.F1_local[:, 0]             # +compression
    N2 = results.F2_local[:, 0]
    N = jnp.where(jnp.abs(N1) >= jnp.abs(N2), N1, N2)
    fa = N / A                               # + compression [MPa]
    fb1 = jnp.sqrt(results.F1_local[:, 4]**2 + results.F1_local[:, 5]**2) / W
    fb2 = jnp.sqrt(results.F2_local[:, 4]**2 + results.F2_local[:, 5]**2) / W
    fb = jnp.maximum(fb1, fb2)

    Ft = allowable_tension(Fy)
    Fa = allowable_compression(Fy, E, KL_r, dt)
    Fb = allowable_bending(Fy, E, dt)
    # Euler stress for the amplification term (12/23 safety factor, 3.3.1-4)
    Fe = 12.0 * jnp.pi**2 * E / (23.0 * KL_r**2)

    comp = fa > 0.0
    fa_c = jnp.abs(fa)

    # --- compression interaction (3.3.1-1/2/3) ---
    amp = jnp.maximum(1.0 - fa_c / Fe, 1e-3)
    uc1 = fa_c / Fa + Cm * fb / (amp * Fb)
    uc2 = fa_c / (0.6 * Fy) + fb / Fb
    uc_simple = fa_c / Fa + fb / Fb
    small_axial = fa_c / Fa <= 0.15
    uc_stab_c = jnp.where(small_axial, uc_simple, jnp.maximum(uc1, uc2))
    uc_yield_c = jnp.where(small_axial, uc_simple, uc2)

    # --- tension interaction (3.3.1-2 form) ---
    uc_t = fa_c / Ft + fb / Fb

    uc_stab = jnp.where(comp, uc_stab_c, uc_t)
    uc_yield = jnp.where(comp, uc_yield_c, uc_t)
    uc = jnp.maximum(uc_stab, uc_yield)

    gov = np.where(np.asarray(comp),
                   np.where(np.asarray(uc_stab_c) >= np.asarray(uc_yield_c),
                            "stability", "yield"),
                   "tension")
    return CodeCheck(uc=uc, uc_stability=uc_stab, uc_yield=uc_yield,
                     fa_mpa=fa, fb_mpa=fb,
                     Fa_mpa=jnp.where(comp, Fa, Ft), Fb_mpa=Fb,
                     KL_over_r=KL_r, governing=gov)

"""ISO 19902 cylindrical-member strength checks (partial-factor format).

The reference defers "code checks (API RP 2A / ISO 19902 ...)" to other
tools (its Info tab, `/root/reference/JacketAnalysisGUI_v2.py:1544-1799`).
:mod:`.codecheck` implements the API RP 2A-WSD working-stress checks; this
module implements the ISO 19902:2007 section 13 member checks — the
partial-factor (gamma_R) format used outside the Gulf of Mexico — batched
over all members in jnp from the same recovered end forces.

Scope (documented, deliberate):

- representative strengths (13.2):
    tension        f_t  = f_y                                    (13.2.2)
    local buckling f_yc = f_y                 for f_y/f_xe <= 0.170
                        = (1.047 - 0.274 f_y/f_xe) f_y  up to f_y/f_xe = 1.911
                        = f_xe                otherwise          (13.2.3.3)
                   with f_xe = 2 C_x E t/D, C_x = 0.3
    column         f_c  = (1.0 - 0.278 lam^2) f_yc   for lam <= 1.34
                        = 0.9 f_yc / lam^2           for lam >  1.34
                   lam = sqrt(f_yc / f_e), f_e = pi^2 E/(KL/r)^2 (13.2.3.2)
    bending        f_b  = (Z_p/Z_e) f_y            for f_y D/(E t) <= 0.0517
                        = (1.13 - 2.58 f_y D/(E t)) (Z_p/Z_e) f_y  <= 0.1034
                        = (0.94 - 0.76 f_y D/(E t)) (Z_p/Z_e) f_y  <= 120 f_y/E
                   (13.2.4; Z_p = (D^3 - D_i^3)/6 plastic modulus)
- interaction (13.3) with partial resistance factors
  gamma_Rt = 1.05, gamma_Rc = 1.18, gamma_Rb = 1.05:
    tension + bending (13.3.2, cosine interaction):
        U = 1 - cos(pi/2 * g_Rt s_t/f_t) + g_Rb sqrt(s_by^2+s_bz^2)/f_b
    compression + bending, beam-column (13.3.3-1, per-plane amplification):
        U = g_Rc s_c/f_c
            + g_Rb/f_b sqrt[(C_my s_by/(1 - s_c/f_ey))^2
                            + (C_mz s_bz/(1 - s_c/f_ez))^2]
    compression + bending, local strength (13.3.3-2):
        U = 1 - cos(pi/2 * g_Rc s_c/f_yc) + g_Rb sqrt(s_by^2+s_bz^2)/f_b
- hydrostatic-pressure interaction (13.2.6/13.4) is NOT implemented
  (member depressurization state is not modeled); nor are conical
  transitions or dented-member clauses.

Conventions: stresses in MPa; per-plane bending stresses from the
more-stressed member end; effective length factors as :mod:`.codecheck`
(legs K = 1.0, braces K = 0.8); C_m = 0.85 both planes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

GAMMA_RT = 1.05
GAMMA_RC = 1.18
GAMMA_RB = 1.05


def iso_local_buckling_fyc(Fy, E, D_over_t):
    """Representative local buckling strength f_yc (ISO 19902 13.2.3.3)."""
    Fy = jnp.asarray(Fy)
    dt = jnp.asarray(D_over_t)
    fxe = 2.0 * 0.3 * E / dt
    r = Fy / fxe
    fyc_mid = (1.047 - 0.274 * r) * Fy
    return jnp.where(r <= 0.170, Fy,
                     jnp.where(r <= 1.911, jnp.minimum(fyc_mid, Fy), fxe))


def iso_column_fc(Fy, E, KL_over_r, D_over_t):
    """Representative axial compressive strength f_c (13.2.3.2)."""
    fyc = iso_local_buckling_fyc(Fy, E, D_over_t)
    fe = jnp.pi**2 * E / jnp.asarray(KL_over_r) ** 2
    lam = jnp.sqrt(fyc / fe)
    return jnp.where(lam <= 1.34, (1.0 - 0.278 * lam**2) * fyc,
                     0.9 * fyc / lam**2), fyc, fe


def iso_bending_fb(Fy, E, D_mm, t_mm):
    """Representative bending strength f_b (13.2.4), with the plastic
    shape factor Z_p/Z_e of the tube."""
    Fy = jnp.asarray(Fy)
    D = jnp.asarray(D_mm)
    t = jnp.asarray(t_mm)
    Di = D - 2.0 * t
    Zp = (D**3 - Di**3) / 6.0
    Ze = jnp.pi / 32.0 * (D**4 - Di**4) / D
    shape = Zp / Ze
    x = Fy * D / (E * t)
    fb1 = shape * Fy
    fb2 = (1.13 - 2.58 * x) * shape * Fy
    fb3 = (0.94 - 0.76 * x) * shape * Fy
    return jnp.where(x <= 0.0517, fb1, jnp.where(x <= 0.1034, fb2, fb3))


class ISOCheck(NamedTuple):
    """ISO 19902 member unity checks (all ``[M]`` unless noted)."""

    uc: jnp.ndarray             # governing utilization per member
    uc_beam_column: jnp.ndarray # 13.3.3-1 (compression) / 13.3.2 (tension)
    uc_local: jnp.ndarray       # 13.3.3-2 (compression) / same (tension)
    fa_mpa: jnp.ndarray         # axial stress (+compression)
    fb_mpa: jnp.ndarray         # resultant bending stress (worst end)
    fc_mpa: jnp.ndarray         # representative axial strength (f_c or f_t)
    fb_rep_mpa: jnp.ndarray     # representative bending strength f_b
    fyc_mpa: jnp.ndarray        # local buckling strength f_yc
    KL_over_r: jnp.ndarray
    governing: np.ndarray       # [M] str: 'tension'|'beam-column'|'local'


def iso_member_check(model, results, Fy=None, E=None,
                     K_leg: float = 1.0, K_brace: float = 0.8,
                     Cm: float = 0.85, L_override=None) -> ISOCheck:
    """ISO 19902 section 13 strength utilizations from an analysis result.

    Same inputs and sign conventions as
    :func:`.codecheck.member_code_check` (its docstring covers the end-force
    feed); partial resistance factors gamma_Rt/Rc/Rb = 1.05/1.18/1.05 are
    module constants.  ``results.F1_local``/``F2_local`` give the member
    end forces; run at the governing phase.
    """
    sec = model.sections
    sid = model.sect_id
    Fy = jnp.asarray(355.0 if Fy is None else Fy)
    E = jnp.asarray(210000.0 if E is None else E)

    A = sec.Ax[sid]
    W = sec.Wy[sid]
    D = sec.D_outer[sid]
    t = sec.t[sid]
    r_gyr = jnp.sqrt(sec.Iy[sid] / A)

    L_m = results.length_m if L_override is None else jnp.asarray(L_override)
    K = jnp.asarray([K_leg if ty == "leg" else K_brace
                     for ty in model.member_types], dtype=A.dtype)
    KL_r = K * (L_m * 1000.0) / r_gyr

    # worst-end stresses; keep the two bending planes separate for 13.3.3-1
    N1 = -results.F1_local[:, 0]
    N2 = results.F2_local[:, 0]
    worse1 = jnp.abs(N1) >= jnp.abs(N2)
    N = jnp.where(worse1, N1, N2)
    fa = N / A                                # + compression [MPa]
    fby = jnp.abs(jnp.where(worse1, results.F1_local[:, 4],
                            results.F2_local[:, 4])) / W
    fbz = jnp.abs(jnp.where(worse1, results.F1_local[:, 5],
                            results.F2_local[:, 5])) / W
    fb = jnp.sqrt(fby**2 + fbz**2)

    fc, fyc, fe = iso_column_fc(Fy, E, KL_r, D / t)
    fb_rep = iso_bending_fb(Fy, E, D, t)

    comp = fa > 0.0
    fa_c = jnp.abs(fa)

    # --- tension + bending (13.3.2, cosine interaction) ---
    arg_t = jnp.clip(jnp.pi / 2.0 * GAMMA_RT * fa_c / Fy, 0.0, jnp.pi / 2.0)
    uc_t = 1.0 - jnp.cos(arg_t) + GAMMA_RB * fb / fb_rep

    # --- compression: beam-column (13.3.3-1) ---
    amp_y = jnp.maximum(1.0 - fa_c / fe, 1e-3)
    uc_bc = GAMMA_RC * fa_c / fc + GAMMA_RB / fb_rep * jnp.sqrt(
        (Cm * fby / amp_y) ** 2 + (Cm * fbz / amp_y) ** 2)

    # --- compression: local strength (13.3.3-2) ---
    arg_c = jnp.clip(jnp.pi / 2.0 * GAMMA_RC * fa_c / fyc, 0.0, jnp.pi / 2.0)
    uc_loc = 1.0 - jnp.cos(arg_c) + GAMMA_RB * fb / fb_rep

    uc_bc_all = jnp.where(comp, uc_bc, uc_t)
    uc_loc_all = jnp.where(comp, uc_loc, uc_t)
    uc = jnp.maximum(uc_bc_all, uc_loc_all)

    gov = np.where(np.asarray(comp),
                   np.where(np.asarray(uc_bc) >= np.asarray(uc_loc),
                            "beam-column", "local"),
                   "tension")
    return ISOCheck(uc=uc, uc_beam_column=uc_bc_all, uc_local=uc_loc_all,
                    fa_mpa=fa, fb_mpa=fb,
                    fc_mpa=jnp.where(comp, fc, Fy), fb_rep_mpa=fb_rep,
                    fyc_mpa=fyc, KL_over_r=KL_r, governing=gov)

"""API RP 2A-WSD simple tubular-joint (punching-shear) checks.

The reference's Info tab defers all code checking to other tools
(`/root/reference/JacketAnalysisGUI_v2.py:1544-1799`); round 3 added the
MEMBER strength checks (`ops/codecheck.py`), and this module adds the
companion JOINT capacity checks of API RP 2A-WSD (21st ed., section 4.3):
brace-end axial and bending capacities of the chord wall at each
brace-to-leg connection, with the arcsine axial+bending interaction.

Scope (documented, deliberate):

- simple joints (no overlap, no ring stiffeners, no grout) between a
  BRACE (any non-leg member) and a CHORD (a leg member sharing the node;
  the largest-diameter leg governs when two leg segments meet);
- basic allowable capacities (4.3-1/2, working stress, FS = 1.7):
      Pa = Qu Qf Fyc T^2 / (1.7 sin theta)
      Ma = Qu Qf Fyc T^2 (0.8 d) / (1.7 sin theta)
- Qu per Table 4.3-1 by joint classification:
      K   axial:            (3.4 + 19 beta) Qg
      T/Y axial:            (3.4 + 19 beta)
      X   axial tension:    (3.4 + 19 beta)
      X   axial compression:(3.4 + 19 beta) Qbeta
      in-plane bending:     (3.4 + 19 beta)
      out-of-plane bending: (3.4 +  7 beta) Qbeta
  with Qbeta = 0.3 / (beta (1 - 0.833 beta)) for beta > 0.6 (else 1) and
  the K-joint gap factor Qg = max(1.8 - 0.1 g/T, 1)  (gamma <= 20) /
  max(1.8 - 4 g/D, 1) (gamma > 20);
- the chord-load factor Qf = 1 - lambda gamma A^2 (lambda = 0.030 axial,
  0.045 IPB, 0.021 OPB; A^2 = (fax^2 + fb^2) / (0.6 Fyc)^2 from the
  chord's nominal stresses at the joint), Qf = 1 when the chord is in
  axial tension;
- combined interaction (4.3-3):
      UC = |P|/Pa + (2/pi) asin sqrt((M_ipb/Ma_ipb)^2 + (M_opb/Ma_opb)^2)
- joint CLASSIFICATION: pass ``joint_class`` ('Y' default — the usual
  first screen, 'K', 'X', a per-joint array, or 'auto').  'auto'
  derives per-brace K/X/Y action FRACTIONS from the analyzed load path
  per API 4.2: the brace axial component perpendicular to the chord is
  balanced first by opposing perpendicular loads of coplanar braces on
  the SAME side of the chord (K action), then by same-sense loads of
  coplanar braces on the OPPOSITE side carrying it through the chord
  (X action), and the remainder is reacted as chord beam shear (Y
  action); the axial Qu is interpolated with those fractions (4.2a).
  Coplanarity tolerance: braces within ~30 deg of the subject brace's
  chord plane participate.  Overlapping-joint checks are out of scope;
  brace-to-brace connections (no leg at the node) are skipped.

Conventions: brace in-plane bending is the moment about the brace-chord
plane normal; the brace end moment vector (local My, Mz rotated to
global; torsion excluded) is decomposed against that normal.  Near-
parallel brace/chord pairs (sin theta < 0.17, i.e. < ~10 deg) are
degenerate for punching shear and are clamped with a warning flag.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .beams import local_axes

_FS = 1.7          # working-stress safety factor of 4.3-1/2
_SIN_MIN = 0.17    # ~10 deg: below this a punching check is meaningless

_CLASS_CODES = {"Y": 0, "T": 0, "K": 1, "X": 2}


class JointCheck(NamedTuple):
    """Per brace-end joint check (all arrays [J])."""

    node: np.ndarray             # joint node index
    brace: np.ndarray            # brace member index
    chord: np.ndarray            # chord (leg) member index
    joint_class: np.ndarray      # str: 'Y' | 'K' | 'X'
    beta: jnp.ndarray            # d/D
    gamma: jnp.ndarray           # D/(2T)
    tau: jnp.ndarray             # t/T
    sin_theta: jnp.ndarray
    P_kN: jnp.ndarray            # brace axial at the joint (+compression)
    Pa_kN: jnp.ndarray           # allowable axial
    M_ipb_kNm: jnp.ndarray
    M_opb_kNm: jnp.ndarray
    Ma_ipb_kNm: jnp.ndarray
    Ma_opb_kNm: jnp.ndarray
    Qf_axial: jnp.ndarray
    uc_axial: jnp.ndarray        # |P|/Pa
    uc_bending: jnp.ndarray      # (2/pi) asin sqrt(sum of squares)
    uc: jnp.ndarray              # combined interaction (4.3-3)
    degenerate: np.ndarray       # bool: sin theta clamped
    frac_K: np.ndarray           # load-path action fractions ('auto':
    frac_X: np.ndarray           #   derived per API 4.2; fixed classes:
    frac_Y: np.ndarray           #   the 0/1 indicator of the class)


def _qbeta(beta):
    b = jnp.clip(beta, 1e-3, 1.0)
    q = 0.3 / (b * (1.0 - 0.833 * b))
    return jnp.where(beta > 0.6, q, 1.0)


def _qg(gap_over_T, gap_over_D, gamma):
    qg_lo = 1.8 - 0.1 * gap_over_T     # gamma <= 20 branch
    qg_hi = 1.8 - 4.0 * gap_over_D     # gamma >  20 branch
    return jnp.maximum(jnp.where(gamma <= 20.0, qg_lo, qg_hi), 1.0)


def qu_all(beta, gamma, tension, gap_over_T, gap_over_D):
    """All Table 4.3-1 Qu values: (qu_ty, qu_k, qu_x, qu_ipb, qu_opb)."""
    base = 3.4 + 19.0 * beta
    qb = _qbeta(beta)
    qg = _qg(gap_over_T, gap_over_D, gamma)
    qu_ty = base
    qu_k = base * qg
    qu_x = jnp.where(tension, base, base * qb)
    qu_ipb = base
    qu_opb = (3.4 + 7.0 * beta) * qb
    return qu_ty, qu_k, qu_x, qu_ipb, qu_opb


def qu_factors(beta, gamma, class_code, tension, gap_over_T, gap_over_D):
    """(Qu_axial, Qu_ipb, Qu_opb) per API Table 4.3-1.

    ``class_code``: int array, 0 = T/Y, 1 = K, 2 = X; ``tension``: bool
    array, sense of the brace axial load.
    """
    qu_ty, qu_k, qu_x, qu_ipb, qu_opb = qu_all(beta, gamma, tension,
                                               gap_over_T, gap_over_D)
    qu_ax = jnp.where(class_code == 1, qu_k,
                      jnp.where(class_code == 2, qu_x, qu_ty))
    return qu_ax, qu_ipb, qu_opb


def joint_capacities(beta, gamma, sin_theta, T_mm, d_mm, Fyc,
                     class_code, tension,
                     Qf_ax=1.0, Qf_ipb=1.0, Qf_opb=1.0,
                     gap_over_T=0.0, gap_over_D=0.0, fractions=None):
    """Allowable (Pa [N], Ma_ipb [N*mm], Ma_opb [N*mm]) per 4.3-1/2.

    ``fractions``: optional (f_Y, f_K, f_X) action fractions (API 4.2a
    interpolated classification) — overrides ``class_code`` for the
    axial Qu.
    """
    if fractions is None:
        qu_ax, qu_ipb, qu_opb = qu_factors(beta, gamma, class_code, tension,
                                           gap_over_T, gap_over_D)
    else:
        qu_ty, qu_k, qu_x, qu_ipb, qu_opb = qu_all(beta, gamma, tension,
                                                   gap_over_T, gap_over_D)
        fY, fK, fX = fractions
        qu_ax = fY * qu_ty + fK * qu_k + fX * qu_x
    s = jnp.maximum(sin_theta, _SIN_MIN)
    base = Fyc * T_mm**2 / (_FS * s)
    Pa = qu_ax * Qf_ax * base
    Ma_i = qu_ipb * Qf_ipb * base * 0.8 * d_mm
    Ma_o = qu_opb * Qf_opb * base * 0.8 * d_mm
    return Pa, Ma_i, Ma_o


def _find_joints(model):
    """Host-side brace-end -> chord pairing.

    Returns int arrays (brace_idx, brace_end, chord_idx, chord_end, node)
    for every non-leg member end landing on a node that also hosts at
    least one leg member.  When several leg segments meet (a continuous
    chord), the largest-D (then largest-t) one is the chord.
    """
    conn = np.asarray(model.conn)
    types = model.member_types or ("brace",) * conn.shape[0]
    D = np.asarray(model.sections.D_outer)[np.asarray(model.sect_id)]
    t = np.asarray(model.sections.t)[np.asarray(model.sect_id)]

    legs_at = {}
    for m, ty in enumerate(types):
        if ty == "leg":
            for e in (0, 1):
                legs_at.setdefault(int(conn[m, e]), []).append((m, e))

    rows = []
    for m, ty in enumerate(types):
        if ty == "leg":
            continue
        for e in (0, 1):
            n = int(conn[m, e])
            cands = legs_at.get(n)
            if not cands:
                continue
            cm, ce = max(cands, key=lambda p: (D[p[0]], t[p[0]]))
            rows.append((m, e, cm, ce, n))
    if not rows:
        z = np.zeros(0, dtype=np.int32)
        return z, z, z, z, z
    arr = np.asarray(rows, dtype=np.int32)
    return arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4]


_COPLANAR_COS = 0.866  # ~30 deg side-vector tolerance for plane membership


def classify_load_path(coords, conn, bi, be, ci, nodes, P):
    """API 4.2 load-path action fractions (f_K, f_X, f_Y) per joint row.

    ``P``: brace axial per row, +compression.  Host-side numpy — the
    joint count is O(members), never large.  For each subject brace the
    perpendicular-to-chord component of its axial load is balanced
    greedily: first by opposing perpendicular loads of coplanar
    SAME-side braces (K action), then by same-sense loads of coplanar
    OPPOSITE-side braces (X action); the remainder is Y action.
    Unloaded or chord-parallel braces default to pure Y.
    """
    coords = np.asarray(coords, dtype=np.float64)
    conn = np.asarray(conn)
    P = np.asarray(P, dtype=np.float64)
    J = bi.shape[0]

    # unit vector from the joint node into each brace, and the chord axis
    other = np.where(be == 0, conn[bi, 1], conn[bi, 0])
    e = coords[other] - coords[nodes]
    e /= np.linalg.norm(e, axis=-1, keepdims=True)
    dc = coords[conn[ci, 1]] - coords[conn[ci, 0]]
    uc = dc / np.linalg.norm(dc, axis=-1, keepdims=True)

    # perpendicular (punching) direction and signed perpendicular load:
    # q < 0 pushes the chord wall from the brace's side (compression)
    w_raw = e - np.sum(e * uc, axis=-1, keepdims=True) * uc
    s = np.linalg.norm(w_raw, axis=-1)
    w = w_raw / np.where(s < 1e-9, 1.0, s)[:, None]
    q = -P * s

    fK = np.zeros(J)
    fX = np.zeros(J)
    by_node = {}
    for r in range(J):
        by_node.setdefault(int(nodes[r]), []).append(r)
    for rows in by_node.values():
        for i in rows:
            qi = q[i]
            if abs(qi) < 1e-9 or s[i] < 1e-6:
                continue
            k_avail = x_avail = 0.0
            for j in rows:
                if j == i:
                    continue
                c = float(np.dot(w[j], w[i]))
                proj = q[j] * c                # perp load of j along w_i
                if c > _COPLANAR_COS and proj * qi < 0.0:
                    k_avail += abs(proj)       # same side, opposing
                elif c < -_COPLANAR_COS and proj * qi > 0.0:
                    x_avail += abs(proj)       # through the chord
            fK[i] = min(k_avail, abs(qi)) / abs(qi)
            fX[i] = min(x_avail, abs(qi) * (1.0 - fK[i])) / abs(qi)
    fY = 1.0 - fK - fX
    return fK, fX, fY


def joint_code_check(model, results, Fy=None, joint_class="Y",
                     gap_mm: float = 50.0) -> JointCheck:
    """API RP 2A-WSD simple-joint checks from an analysis result.

    ``results``: any :class:`..api.AnalysisResults` (run at the governing
    phase).  ``Fy``: chord yield (MPa, default 355).  ``joint_class``:
    'Y' (default), 'K', 'X', 'auto' (API 4.2 load-path fractions,
    interpolated Qu), or a length-J array of Y/T/K/X strings in the
    order this function reports joints.  ``gap_mm``: K-joint gap.
    """
    bi, be, ci, ce, nodes = _find_joints(model)
    J = bi.shape[0]
    if J == 0:
        raise ValueError("no brace-to-leg joints found (are member types "
                         "set? brace-to-brace connections are not checked)")
    Fy = jnp.asarray(355.0 if Fy is None else Fy)

    auto = isinstance(joint_class, str) and joint_class == "auto"
    if auto:
        classes = np.full(J, "auto")
    else:
        if isinstance(joint_class, str):
            classes = np.full(J, joint_class)
        else:
            classes = np.asarray(joint_class)
            if classes.shape != (J,):
                raise ValueError(
                    f"joint_class must be scalar or shape ({J},)")
        bad = [c for c in np.unique(classes) if c not in _CLASS_CODES]
        if bad:
            raise ValueError(f"unknown joint class(es) {bad}; "
                             "use Y/T/K/X or 'auto'")

    sec, sid = model.sections, np.asarray(model.sect_id)
    d = jnp.asarray(sec.D_outer)[sid[bi]]          # brace OD [mm]
    tb = jnp.asarray(sec.t)[sid[bi]]
    D = jnp.asarray(sec.D_outer)[sid[ci]]          # chord OD [mm]
    T = jnp.asarray(sec.t)[sid[ci]]
    Ac = jnp.asarray(sec.Ax)[sid[ci]]              # chord area [mm^2]
    Wc = jnp.asarray(sec.Wy)[sid[ci]]              # chord modulus [mm^3]
    beta = jnp.clip(d / D, 0.0, 1.0)
    gamma = D / (2.0 * T)
    tau = tb / T

    coords = jnp.asarray(model.coords)
    conn = np.asarray(model.conn)
    dLb = coords[conn[bi, 1]] - coords[conn[bi, 0]]
    dLc = coords[conn[ci, 1]] - coords[conn[ci, 0]]
    Lb = jnp.linalg.norm(dLb, axis=-1)
    Lc = jnp.linalg.norm(dLc, axis=-1)
    ub = dLb / Lb[:, None]
    uc_ax = dLc / Lc[:, None]
    cos_t = jnp.abs(jnp.sum(ub * uc_ax, axis=-1))
    sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t**2, 0.0, 1.0))
    degenerate = np.asarray(sin_t) < _SIN_MIN

    # brace end loads at the joint (reference sign conventions: node-1
    # recovery is negated, so +compression is -F1[0] / +F2[0])
    F1b = results.F1_local[bi]
    F2b = results.F2_local[bi]
    P = jnp.where(be == 0, -F1b[:, 0], F2b[:, 0])          # N, +compression
    My = jnp.where(be == 0, F1b[:, 4], F2b[:, 4])          # N*mm, local
    Mz = jnp.where(be == 0, F1b[:, 5], F2b[:, 5])

    # rotate the bending moment vector to global and split IPB/OPB about
    # the brace-chord plane normal
    Rb = local_axes(dLb, Lb)                               # rows (lx,ly,lz)
    M_glob = Rb[:, 1, :] * My[:, None] + Rb[:, 2, :] * Mz[:, None]
    n_raw = jnp.cross(ub, uc_ax)
    n_norm = jnp.linalg.norm(n_raw, axis=-1)
    n_hat = n_raw / jnp.where(n_norm < 1e-9, 1.0, n_norm)[:, None]
    M_ipb = jnp.abs(jnp.sum(M_glob * n_hat, axis=-1))
    M_tot2 = jnp.sum(M_glob**2, axis=-1)
    M_opb = jnp.sqrt(jnp.clip(M_tot2 - M_ipb**2, 0.0, None))
    # parallel members have no defined plane: treat all bending as OPB
    # (the lower capacity)
    par = n_norm < 1e-9
    M_opb = jnp.where(par, jnp.sqrt(M_tot2), M_opb)
    M_ipb = jnp.where(par, 0.0, M_ipb)

    # chord nominal stresses at the joint for Qf
    F1c = results.F1_local[ci]
    F2c = results.F2_local[ci]
    Nc = jnp.where(ce == 0, -F1c[:, 0], F2c[:, 0])         # +compression
    Mc = jnp.where(ce == 0,
                   jnp.sqrt(F1c[:, 4]**2 + F1c[:, 5]**2),
                   jnp.sqrt(F2c[:, 4]**2 + F2c[:, 5]**2))
    fax = Nc / Ac
    fbc = Mc / Wc
    A2 = (fax**2 + fbc**2) / (0.6 * Fy)**2
    chord_comp = Nc > 0.0

    def qf(lam):
        q = 1.0 - lam * gamma * A2
        return jnp.where(chord_comp, jnp.clip(q, 1e-3, 1.0), 1.0)

    Qf_ax, Qf_i, Qf_o = qf(0.030), qf(0.045), qf(0.021)

    if auto:
        fK, fX, fY = classify_load_path(model.coords, conn, bi, be, ci,
                                        nodes, np.asarray(P))
    else:
        code_np = np.array([_CLASS_CODES[c] for c in classes])
        fK = (code_np == 1).astype(np.float64)
        fX = (code_np == 2).astype(np.float64)
        fY = (code_np == 0).astype(np.float64)

    tension = P < 0.0
    Pa, Ma_i, Ma_o = joint_capacities(
        beta, gamma, sin_t, T, d, Fy, None, tension,
        Qf_ax=Qf_ax, Qf_ipb=Qf_i, Qf_opb=Qf_o,
        gap_over_T=gap_mm / T, gap_over_D=gap_mm / D,
        fractions=(jnp.asarray(fY), jnp.asarray(fK), jnp.asarray(fX)))

    uc_ax2 = jnp.abs(P) / Pa
    arg = jnp.sqrt(jnp.clip((M_ipb / Ma_i)**2 + (M_opb / Ma_o)**2,
                            0.0, None))
    uc_b = 2.0 / jnp.pi * jnp.arcsin(jnp.clip(arg, 0.0, 1.0))
    # over-unity bending keeps growing linearly past the asin domain so
    # the report stays monotone in the load
    uc_b = jnp.where(arg > 1.0, 1.0 + (arg - 1.0), uc_b)
    uc = uc_ax2 + uc_b

    return JointCheck(
        node=np.asarray(nodes), brace=np.asarray(bi), chord=np.asarray(ci),
        joint_class=classes, beta=beta, gamma=gamma, tau=tau,
        sin_theta=sin_t,
        P_kN=P / 1e3, Pa_kN=Pa / 1e3,
        M_ipb_kNm=M_ipb / 1e6, M_opb_kNm=M_opb / 1e6,
        Ma_ipb_kNm=Ma_i / 1e6, Ma_opb_kNm=Ma_o / 1e6,
        Qf_axial=Qf_ax, uc_axial=uc_ax2, uc_bending=uc_b, uc=uc,
        degenerate=degenerate, frac_K=fK, frac_X=fX, frac_Y=fY)

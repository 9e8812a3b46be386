"""API RP 2A-WSD simple tubular-joint checks.

Verification: Qu/Qg/Qbeta factor anchors hand-computed from Table 4.3-1,
a statically determinate dry T-joint whose brace load (and hence the
axial unity check) is known exactly, IPB/OPB decomposition checked by
loading the same T-joint in and out of the brace-chord plane, and
behavioral checks (class ordering, finiteness) on the storm jacket.
"""
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.jointcheck import (joint_capacities,
                                                 joint_code_check,
                                                 qu_factors)


def test_qu_factor_hand_values():
    # T/Y axial: 3.4 + 19 beta
    qa, qi, qo = qu_factors(0.4, 13.0, np.int32(0), False, 0.0, 0.0)
    np.testing.assert_allclose(float(qa), 3.4 + 19 * 0.4, rtol=1e-12)
    np.testing.assert_allclose(float(qi), 3.4 + 19 * 0.4, rtol=1e-12)
    # OPB at beta <= 0.6: Qbeta = 1
    np.testing.assert_allclose(float(qo), 3.4 + 7 * 0.4, rtol=1e-12)

    # Qbeta branch at beta = 0.8: 0.3 / (0.8 (1 - 0.833*0.8)) = 1.12410...
    qb = 0.3 / (0.8 * (1 - 0.833 * 0.8))
    qa_xc, _, qo8 = qu_factors(0.8, 13.0, np.int32(2), False, 0.0, 0.0)
    np.testing.assert_allclose(float(qa_xc), (3.4 + 19 * 0.8) * qb,
                               rtol=1e-12)
    np.testing.assert_allclose(float(qo8), (3.4 + 7 * 0.8) * qb, rtol=1e-12)
    # X tension keeps the base value
    qa_xt, _, _ = qu_factors(0.8, 13.0, np.int32(2), True, 0.0, 0.0)
    np.testing.assert_allclose(float(qa_xt), 3.4 + 19 * 0.8, rtol=1e-12)

    # K gap factor: gamma <= 20 branch 1.8 - 0.1 g/T, floored at 1
    qa_k, _, _ = qu_factors(0.4, 13.0, np.int32(1), False, 0.667, 0.025)
    np.testing.assert_allclose(float(qa_k), (3.4 + 19 * 0.4) * (1.8 - 0.0667),
                               rtol=1e-3)
    qa_k2, _, _ = qu_factors(0.4, 25.0, np.int32(1), False, 0.667, 0.05)
    np.testing.assert_allclose(float(qa_k2), (3.4 + 19 * 0.4) * 1.6,
                               rtol=1e-12)
    qa_k3, _, _ = qu_factors(0.4, 13.0, np.int32(1), False, 10.0, 0.4)
    np.testing.assert_allclose(float(qa_k3), 3.4 + 19 * 0.4, rtol=1e-12)


def test_capacity_hand_value():
    # Y joint, beta=0.5, T=40, d=400, Fy=355, sin=1, no chord load:
    # Pa = 12.9 * 355 * 1600 / 1.7 = 4.3101e6 N
    Pa, Ma_i, Ma_o = joint_capacities(0.5, 10.0, 1.0, 40.0, 400.0, 355.0,
                                      np.int32(0), False)
    np.testing.assert_allclose(float(Pa), 12.9 * 355 * 1600 / 1.7, rtol=1e-12)
    np.testing.assert_allclose(float(Ma_i),
                               12.9 * 355 * 1600 / 1.7 * 0.8 * 400,
                               rtol=1e-12)
    np.testing.assert_allclose(float(Ma_o),
                               (3.4 + 3.5) * 355 * 1600 / 1.7 * 0.8 * 400,
                               rtol=1e-12)
    # 45-degree brace: capacities scale by 1/sin
    Pa45, _, _ = joint_capacities(0.5, 10.0, np.sin(np.pi / 4), 40.0, 400.0,
                                  355.0, np.int32(0), False)
    np.testing.assert_allclose(float(Pa45), float(Pa) / np.sin(np.pi / 4),
                               rtol=1e-12)


def _t_joint(load_kN, direction):
    """Dry T-joint: vertical 2-segment leg chord (fixed both ends), one
    horizontal +x brace to free node B where the load is applied.

    direction: 'axial' (+x pull = brace tension), 'ipb' (vertical at B,
    bends the brace in the xz brace-chord plane), 'opb' (+y at B).
    """
    from small_fem_solver_tpu.models.model import build_model
    nodes = {"C0": (0.0, 0.0, 60.0), "C1": (0.0, 0.0, 70.0),
             "C2": (0.0, 0.0, 80.0), "B": (10.0, 0.0, 70.0)}
    members = [
        {"name": "LEG_LO", "node1": "C0", "node2": "C1", "type": "leg"},
        {"name": "LEG_HI", "node1": "C1", "node2": "C2", "type": "leg"},
        {"name": "BR", "node1": "C1", "node2": "B", "type": "brace"},
    ]
    model = build_model(nodes, members, ["C0", "C2"], ["B"],
                        leg_section=(800.0, 40.0),
                        brace_section=(400.0, 20.0))
    wave = sf.airy_wave(0.5, 9.4, 50.0)   # structure entirely dry (z>=60)
    if direction == "axial":
        case = sf.LoadCase(F_shear_kN=load_kN, wave_dir_deg=90.0,
                           sw_mode="none")
    elif direction == "ipb":
        case = sf.LoadCase(F_axial_kN=load_kN, sw_mode="none")
    else:  # opb: theta = 90 - 0 -> +y
        case = sf.LoadCase(F_shear_kN=load_kN, wave_dir_deg=0.0,
                           sw_mode="none")
    res = sf.analyze(model, wave, case, solver="chol", accel="analytic")
    return model, res


def test_t_joint_axial_anchor():
    """+x pull at the free brace end is pure brace tension of exactly the
    applied load; UC reduces to |P|/Pa with hand-computable Pa."""
    model, res = _t_joint(50.0, "axial")
    chk = joint_code_check(model, res)
    assert chk.node.shape == (1,)
    assert model.member_names[int(chk.brace[0])] == "BR"
    np.testing.assert_allclose(float(chk.beta[0]), 0.5, rtol=1e-12)
    np.testing.assert_allclose(float(chk.gamma[0]), 10.0, rtol=1e-12)
    np.testing.assert_allclose(float(chk.sin_theta[0]), 1.0, atol=1e-12)
    # brace tension = applied pull (statics at the free node)
    np.testing.assert_allclose(float(chk.P_kN[0]), -50.0, rtol=1e-9)
    # Pa: Qu = 12.9 (Y, tension), Qf from the reported chord stresses
    Pa_hand = 12.9 * float(chk.Qf_axial[0]) * 355.0 * 40.0**2 / 1.7 / 1e3
    np.testing.assert_allclose(float(chk.Pa_kN[0]), Pa_hand, rtol=1e-9)
    # the chord is lightly loaded, so Qf ~ 1 and the clean hand value holds
    np.testing.assert_allclose(float(chk.Pa_kN[0]),
                               12.9 * 355 * 1600 / 1.7 / 1e3, rtol=5e-3)
    np.testing.assert_allclose(float(chk.uc_axial[0]),
                               50.0 / float(chk.Pa_kN[0]), rtol=1e-9)
    # no bending at a free-end axial pull
    assert float(chk.uc_bending[0]) < 1e-6
    np.testing.assert_allclose(float(chk.uc[0]), float(chk.uc_axial[0]),
                               atol=1e-6)


def test_t_joint_bending_plane_split():
    """Vertical tip load bends the brace in the xz brace-chord plane (pure
    IPB); +y tip load bends it out of plane (pure OPB)."""
    model, res = _t_joint(30.0, "ipb")
    chk = joint_code_check(model, res)
    assert float(chk.M_ipb_kNm[0]) > 100.0        # ~ F * L = 300 kNm scale
    assert float(chk.M_opb_kNm[0]) < 1e-6
    # self-consistent arcsine interaction
    expect = 2 / np.pi * np.arcsin(float(chk.M_ipb_kNm[0])
                                   / float(chk.Ma_ipb_kNm[0]))
    np.testing.assert_allclose(float(chk.uc_bending[0]), expect, rtol=1e-9)

    model, res = _t_joint(30.0, "opb")
    chk = joint_code_check(model, res)
    assert float(chk.M_opb_kNm[0]) > 100.0
    assert float(chk.M_ipb_kNm[0]) < 1e-6
    expect = 2 / np.pi * np.arcsin(float(chk.M_opb_kNm[0])
                                   / float(chk.Ma_opb_kNm[0]))
    np.testing.assert_allclose(float(chk.uc_bending[0]), expect, rtol=1e-9)


def test_jacket_joint_check_storm():
    """Storm jacket: every brace-to-leg connection is checked, finite and
    positive; K classification (Qg >= 1) never lowers the axial capacity
    vs Y; per-joint class arrays work."""
    model = sf.default_3leg_jacket()
    wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="stokes", N=5)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom",
                       t_analysis=0.34)
    res = sf.analyze(model, wave, case, solver="chol")
    chk = joint_code_check(model, res)
    J = chk.node.shape[0]
    # every brace end that lands on a leg node: 6 h-braces have both ends
    # on legs, X-brace leg-side ends, minus hinge-node ends
    assert J >= 40
    uc = np.asarray(chk.uc)
    assert np.isfinite(uc).all() and (uc >= 0).all()
    assert (np.asarray(chk.Qf_axial) <= 1.0 + 1e-12).all()
    assert not chk.degenerate.any()
    # default storm: joints must not be wildly over unity but some load
    assert uc.max() > 0.01

    chk_k = joint_code_check(model, res, joint_class="K", gap_mm=50.0)
    assert (np.asarray(chk_k.Pa_kN) >= np.asarray(chk.Pa_kN) - 1e-9).all()

    # per-joint classes: mixed array matches the scalar calls entrywise
    classes = np.where(np.arange(J) % 2 == 0, "K", "Y")
    chk_mix = joint_code_check(model, res, joint_class=classes)
    np.testing.assert_allclose(
        np.asarray(chk_mix.Pa_kN),
        np.where(np.arange(J) % 2 == 0, np.asarray(chk_k.Pa_kN),
                 np.asarray(chk.Pa_kN)), rtol=1e-12)

    with pytest.raises(ValueError):
        joint_code_check(model, res, joint_class="Q")


def test_no_joints_raises():
    from small_fem_solver_tpu.models.model import build_model
    nodes = {"B": (0.0, 0.0, 60.0), "T": (0.0, 0.0, 80.0)}
    members = [{"name": "COL", "node1": "B", "node2": "T", "type": "leg"}]
    model = build_model(nodes, members, ["B"], ["T"],
                        leg_section=(800.0, 30.0))
    wave = sf.airy_wave(0.5, 9.4, 50.0)
    res = sf.analyze(model, wave, sf.LoadCase(sw_mode="none"),
                     solver="chol", accel="analytic")
    with pytest.raises(ValueError):
        joint_code_check(model, res)


def _frame(nodes, members, supports, tops, load_kN, direction,
           leg=(800.0, 40.0), brace=(400.0, 20.0)):
    """Dry frame + point load at the top nodes ('x' shear or 'z' axial)."""
    from small_fem_solver_tpu.models.model import build_model
    model = build_model(nodes, members, supports, tops,
                        leg_section=leg, brace_section=brace)
    wave = sf.airy_wave(0.5, 9.4, 50.0)
    if direction == "x":
        case = sf.LoadCase(F_shear_kN=load_kN, wave_dir_deg=90.0,
                           sw_mode="none")
    else:
        case = sf.LoadCase(F_axial_kN=load_kN, sw_mode="none")
    res = sf.analyze(model, wave, case, solver="chol", accel="analytic")
    return model, res


def test_auto_classification_t_joint_is_pure_y():
    """A single brace has no balancing partners: auto == scalar 'Y'."""
    model, res = _t_joint(50.0, "axial")
    chk_auto = joint_code_check(model, res, joint_class="auto")
    chk_y = joint_code_check(model, res, joint_class="Y")
    np.testing.assert_allclose(chk_auto.frac_Y, 1.0, atol=1e-12)
    np.testing.assert_allclose(chk_auto.frac_K, 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(chk_auto.Pa_kN),
                               np.asarray(chk_y.Pa_kN), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(chk_auto.uc),
                               np.asarray(chk_y.uc), rtol=1e-12)


def test_auto_classification_x_joint():
    """Braces on opposite chord sides carrying the load straight through
    classify as X; the compression-side capacity then picks up Qbeta."""
    nodes = {"C0": (0.0, 0.0, 60.0), "C1": (0.0, 0.0, 70.0),
             "C2": (0.0, 0.0, 80.0),
             "B1": (10.0, 0.0, 70.0), "B2": (-10.0, 0.0, 70.0)}
    members = [
        {"name": "LEG_LO", "node1": "C0", "node2": "C1", "type": "leg"},
        {"name": "LEG_HI", "node1": "C1", "node2": "C2", "type": "leg"},
        {"name": "BR_P", "node1": "C1", "node2": "B1", "type": "brace"},
        {"name": "BR_M", "node1": "C1", "node2": "B2", "type": "brace"},
    ]
    # beta = 600/800 = 0.75 > 0.6 so X-compression differs from Y
    model, res = _frame(nodes, members, ["C0", "C2"], ["B1", "B2"],
                        60.0, "x", brace=(600.0, 25.0))
    chk = joint_code_check(model, res, joint_class="auto")
    assert chk.node.shape == (2,)
    # +x load at both tips: BR_P in tension, BR_M in compression, equal
    # magnitude -> both fully balanced through the chord
    P = np.asarray(chk.P_kN)
    assert P.min() < -25.0 and P.max() > 25.0
    np.testing.assert_allclose(chk.frac_X, 1.0, atol=1e-6)
    np.testing.assert_allclose(chk.frac_K, 0.0, atol=1e-6)
    # capacities match the fixed-X classification exactly
    chk_x = joint_code_check(model, res, joint_class="X")
    np.testing.assert_allclose(np.asarray(chk.Pa_kN),
                               np.asarray(chk_x.Pa_kN), rtol=1e-9)
    # and the compression side is derated by Qbeta vs a Y classification
    chk_y = joint_code_check(model, res, joint_class="Y")
    comp = int(np.argmax(P))
    tens = int(np.argmin(P))
    qb = 0.3 / (0.75 * (1 - 0.833 * 0.75))
    np.testing.assert_allclose(
        float(chk.Pa_kN[comp]) / float(chk_y.Pa_kN[comp]), qb, rtol=1e-9)
    np.testing.assert_allclose(float(chk.Pa_kN[tens]),
                               float(chk_y.Pa_kN[tens]), rtol=1e-9)


def test_auto_classification_k_joint():
    """A V pair on the same chord side with opposing perpendicular loads
    classifies dominantly K, and the blended Pa sits between Y and K."""
    nodes = {"C0": (0.0, 0.0, 60.0), "C1": (0.0, 0.0, 70.0),
             "C2": (0.0, 0.0, 80.0),
             "D1": (10.0, 0.0, 62.0), "D2": (10.0, 0.0, 78.0)}
    members = [
        {"name": "LEG_LO", "node1": "C0", "node2": "C1", "type": "leg"},
        {"name": "LEG_HI", "node1": "C1", "node2": "C2", "type": "leg"},
        {"name": "DIAG_DN", "node1": "C1", "node2": "D1", "type": "brace"},
        {"name": "DIAG_UP", "node1": "C1", "node2": "D2", "type": "brace"},
        {"name": "COL", "node1": "D1", "node2": "D2", "type": "brace"},
    ]
    model, res = _frame(nodes, members, ["C0", "C2"], ["D2"], 200.0, "z")
    chk = joint_code_check(model, res, joint_class="auto")
    assert chk.node.shape == (2,)  # both diagonals at C1 (COL hits no leg)
    # opposing diagonal pair -> dominantly K action on both
    assert (chk.frac_K > 0.6).all()
    assert np.allclose(chk.frac_X, 0.0)
    frac = np.asarray(chk.frac_K)
    chk_y = joint_code_check(model, res, joint_class="Y")
    chk_k = joint_code_check(model, res, joint_class="K")
    Pa_blend = (frac * np.asarray(chk_k.Pa_kN)
                + (1 - frac) * np.asarray(chk_y.Pa_kN))
    np.testing.assert_allclose(np.asarray(chk.Pa_kN), Pa_blend, rtol=1e-9)


def test_auto_classification_storm_jacket():
    """Storm jacket: fractions are valid simplex weights and every blended
    capacity lies within the fixed-class envelope."""
    model = sf.default_3leg_jacket()
    wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="stokes", N=5)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom",
                       t_analysis=0.34)
    res = sf.analyze(model, wave, case, solver="chol")
    chk = joint_code_check(model, res, joint_class="auto")
    fK, fX, fY = (np.asarray(chk.frac_K), np.asarray(chk.frac_X),
                  np.asarray(chk.frac_Y))
    assert (fK >= -1e-12).all() and (fX >= -1e-12).all() \
        and (fY >= -1e-12).all()
    np.testing.assert_allclose(fK + fX + fY, 1.0, atol=1e-12)
    # X-braced jacket under combined load: some real K action somewhere
    assert fK.max() > 0.5
    Pa = np.asarray(chk.Pa_kN)
    lo = np.minimum.reduce([np.asarray(joint_code_check(
        model, res, joint_class=c).Pa_kN) for c in ("Y", "K", "X")])
    hi = np.maximum.reduce([np.asarray(joint_code_check(
        model, res, joint_class=c).Pa_kN) for c in ("Y", "K", "X")])
    assert (Pa >= lo - 1e-9).all() and (Pa <= hi + 1e-9).all()
    assert np.isfinite(np.asarray(chk.uc)).all()


def test_render_code_checks_report():
    """The shared GUI/CLI code-check renderer covers members and joints."""
    from small_fem_solver_tpu.utils.report import render_code_checks
    model = sf.default_3leg_jacket()
    wave = sf.airy_wave(17.038, 9.4, 50.0, 1.7)
    case = sf.LoadCase(wave_dir_deg=38.0, F_axial_kN=25100.0,
                       F_shear_kN=2900.0, custom_sw_tonnes=1100.0,
                       sw_mode="custom")
    res = sf.analyze(model, wave, case, solver="chol")
    txt = render_code_checks(model, res, Fy=355.0)
    assert "MEMBER STRENGTH" in txt
    assert "SIMPLE JOINTS (auto)" in txt
    assert "All members pass" in txt or "WARNING: member UC" in txt
    assert "All joints pass" in txt or "WARNING: joint UC" in txt

    # a model with no brace-to-leg joints degrades gracefully
    from small_fem_solver_tpu.models.model import build_model
    nodes = {"B": (0.0, 0.0, 60.0), "T": (0.0, 0.0, 80.0)}
    members = [{"name": "COL", "node1": "B", "node2": "T", "type": "leg"}]
    m2 = build_model(nodes, members, ["B"], ["T"], leg_section=(800.0, 30.0))
    r2 = sf.analyze(m2, sf.airy_wave(0.5, 9.4, 50.0),
                    sf.LoadCase(sw_mode="none"), solver="chol",
                    accel="analytic")
    txt2 = render_code_checks(m2, r2)
    assert "[JOINTS] skipped" in txt2

"""Soil-structure interaction (foundation springs): limit and theory checks.

SSI is on the reference's exclusion list (`JacketAnalysisGUI_v2.py:1544-1799`);
analyze_ssi replaces the rigid support clamp with 6-DOF linear springs.
"""
import numpy as np

import small_fem_solver_tpu as sf


def _storm():
    model = sf.default_3leg_jacket()
    wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="fenton", N=12)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom",
                       t_analysis=0.34)
    return model, wave, case


def test_stiff_springs_recover_clamped_solution():
    model, wave, case = _storm()
    clamped = sf.analyze(model, wave, case, solver="chol")
    # ~6 orders stiffer than the structure: translations ~1e6 N/mm scale
    k = [1e13, 1e13, 1e13, 1e19, 1e19, 1e19]
    ssi = sf.analyze_ssi(model, wave, case, k)
    U0, U1 = np.asarray(clamped.U), np.asarray(ssi.U)
    assert np.abs(U1 - U0).max() / np.abs(U0).max() < 1e-5
    np.testing.assert_allclose(np.asarray(ssi.reactions),
                               np.asarray(clamped.reactions), rtol=1e-5,
                               atol=1e-5 * np.abs(np.asarray(clamped.reactions)).max())


def test_soft_springs_grow_displacement_and_keep_equilibrium():
    model, wave, case = _storm()
    clamped = sf.analyze(model, wave, case, solver="chol")
    ssi = sf.analyze_ssi(model, wave, case,
                         [1e6, 1e6, 1e6, 1e12, 1e12, 1e12])
    assert float(ssi.max_displacement_mm) > float(clamped.max_displacement_mm)
    applied = np.asarray(ssi.F_applied).reshape(-1, 6)[:, :3].sum(axis=0)
    np.testing.assert_allclose(np.asarray(ssi.total_reaction[:3]), -applied,
                               rtol=1e-9)
    # reactions ARE the spring forces: R = -k u at each support node
    fixed = np.where(np.asarray(model.fixed_mask))[0]
    u_sup = np.asarray(ssi.U).reshape(-1, 6)[fixed]
    k = np.array([1e6, 1e6, 1e6, 1e12, 1e12, 1e12])
    np.testing.assert_allclose(np.asarray(ssi.reactions), -k * u_sup,
                               rtol=1e-8)


def test_spring_validation():
    import pytest

    model, wave, case = _storm()
    with pytest.raises(ValueError, match=">= 0"):
        sf.analyze_ssi(model, wave, case, [-1e6, 1e6, 1e6, 1e12, 1e12, 1e12])
    with pytest.raises(ValueError, match="float"):
        sf.analyze_ssi(model, wave, case, [0.0] * 6)
    with pytest.raises(ValueError, match="finite"):
        sf.analyze_ssi(model, wave, case,
                       [np.nan, 1e7, 1e7, 1e12, 1e12, 1e12])
    # a SINGLE pinned support leaves a rigid rotation -> rejected
    col = sf.build_model({"BASE": (0.0, 0.0, 0.0), "TIP": (0.0, 0.0, 20.0)},
                         [{"name": "COL", "node1": "BASE", "node2": "TIP",
                           "type": "leg"}],
                         fixed_nodes=["BASE"], top_nodes=["TIP"],
                         leg_section=(1000.0, 20.0))
    with pytest.raises(ValueError, match="SINGLE support"):
        sf.analyze_ssi(col, wave, case, [1e7, 1e7, 1e7, 0.0, 0.0, 0.0])
    # pinned pile heads (zero ROTATIONAL springs) are legitimate
    res = sf.analyze_ssi(model, wave, case, [1e7, 1e7, 1e7, 0.0, 0.0, 0.0])
    assert np.isfinite(np.asarray(res.U)).all()


def test_condensed_ssi_matches_dense_on_refined_mesh():
    """analyze_condensed(support_stiffness=...) at n_seg=4 must agree with
    the dense analyze_ssi on the same refined mesh (both direct, f64)."""
    model, wave, case = _storm()
    n_seg = 4
    refined = sf.refine_model(model, n_seg)
    k = [1e6, 1e6, 1e6, 1e12, 1e12, 1e12]
    # same analytic acceleration on both paths (identical load vectors)
    dense = sf.analyze_ssi(refined, wave, case, k, accel="analytic")
    cond = sf.analyze_condensed(model, refined, n_seg, wave, case,
                                support_stiffness=k)
    U0, U1 = np.asarray(dense.U), np.asarray(cond.U)
    assert np.abs(U1 - U0).max() / np.abs(U0).max() < 1e-8
    np.testing.assert_allclose(np.asarray(cond.reactions),
                               np.asarray(dense.reactions), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(cond.utilization),
                               np.asarray(dense.utilization), rtol=1e-6)
    # reactions are the spring forces at the support nodes
    fixed = np.where(np.asarray(model.fixed_mask))[0]
    u_sup = np.asarray(cond.U).reshape(-1, 6)[fixed]
    np.testing.assert_allclose(np.asarray(cond.reactions),
                               -np.asarray(k) * u_sup, rtol=1e-8)


def test_scan_with_springs_matches_single_phase():
    """phase_scan_condensed(support_stiffness=...) phase i == the
    single-phase condensed SSI solve at t_i (same pointwise loads)."""
    import dataclasses

    model, wave, case = _storm()
    n_seg = 3
    refined = sf.refine_model(model, n_seg)
    k = [1e6, 1e6, 1e6, 1e12, 1e12, 1e12]
    scan = sf.phase_scan_condensed(model, refined, n_seg, wave, case,
                                   n_steps=6, kinematics="pointwise",
                                   accel="analytic", support_stiffness=k)
    i = 2
    one = sf.analyze_condensed(
        model, refined, n_seg, wave,
        dataclasses.replace(case, t_analysis=float(scan.ts[i])),
        support_stiffness=k)
    np.testing.assert_allclose(np.asarray(scan.U[i]), np.asarray(one.U),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(scan.reactions[i]),
                               np.asarray(one.reactions), rtol=1e-9)


def test_envelope_with_stiff_springs_matches_clamped():
    from small_fem_solver_tpu.parallel.sweep import (make_case_batch,
                                                     make_wave_batch)

    model, _, case = _storm()
    n_seg = 3
    refined = sf.refine_model(model, n_seg)
    waves = make_wave_batch(np.array([8.0, 15.0]), 9.4, 50.0, U_c=1.7,
                            model="stokes", N=5, n_modes=8)
    cases = make_case_batch(case, t_analysis=np.zeros(2))
    clamped = sf.design_envelope_condensed(model, refined, n_seg, waves,
                                           cases, n_steps=6,
                                           solve_dtype=np.float64)
    sprung = sf.design_envelope_condensed(
        model, refined, n_seg, waves, cases, n_steps=6,
        solve_dtype=np.float64,
        support_stiffness=[1e13, 1e13, 1e13, 1e19, 1e19, 1e19])
    np.testing.assert_allclose(np.asarray(sprung.max_util_per_case),
                               np.asarray(clamped.max_util_per_case),
                               rtol=1e-5)
    soft = sf.design_envelope_condensed(
        model, refined, n_seg, waves, cases, n_steps=6,
        solve_dtype=np.float64,
        support_stiffness=[1e5, 1e5, 1e5, 1e11, 1e11, 1e11])
    # softer foundation must change the governing utilization
    assert not np.allclose(np.asarray(soft.max_util_per_case),
                           np.asarray(clamped.max_util_per_case), rtol=1e-3)


def test_dense_envelope_with_springs_matches_per_case():
    """design_envelope(support_stiffness=...): phase j of case i equals
    the one-shot sprung analysis with the same wave and load time."""
    import dataclasses

    import jax

    from small_fem_solver_tpu.parallel.sweep import (make_case_batch,
                                                     make_wave_batch)

    model, _, case = _storm()
    k = [1e6, 1e6, 1e6, 1e12, 1e12, 1e12]
    waves = make_wave_batch(np.array([8.0, 15.0]), 9.4, 50.0, U_c=1.7,
                            model="stokes", N=5, n_modes=8)
    cases = make_case_batch(case, t_analysis=np.zeros(2))
    env = sf.design_envelope(model, waves, cases, n_steps=6,
                             support_stiffness=k)
    i, j = 1, 2
    wave_i = jax.tree.map(lambda x: x[i], waves)
    one = sf.analyze_ssi(
        model, wave_i,
        dataclasses.replace(case, t_analysis=float(env.ts[i, j])),
        k, accel="analytic")
    np.testing.assert_allclose(np.asarray(env.utilization[i, j]),
                               np.asarray(one.utilization), rtol=1e-7)
    # and the current profile changes the envelope
    env_a = sf.design_envelope(model, waves, cases, n_steps=6,
                               support_stiffness=k, current_alpha=1 / 7)
    assert not np.allclose(np.asarray(env_a.max_util_per_case),
                           np.asarray(env.max_util_per_case), rtol=1e-4)


def test_modal_with_springs():
    """Stiff springs recover the clamped frequencies; soft springs
    lengthen the first natural period (the first-order SSI effect)."""
    from small_fem_solver_tpu.ops.dynamics import modal_analysis

    model = sf.default_3leg_jacket()
    clamped = modal_analysis(model, n_modes=5, topside_mass_t=1100.0)
    stiff = modal_analysis(model, n_modes=5, topside_mass_t=1100.0,
                           support_stiffness=[1e14, 1e14, 1e14,
                                              1e20, 1e20, 1e20])
    np.testing.assert_allclose(np.asarray(stiff.frequencies_hz),
                               np.asarray(clamped.frequencies_hz),
                               rtol=1e-5)
    soft = modal_analysis(model, n_modes=5, topside_mass_t=1100.0,
                          support_stiffness=[1e6, 1e6, 1e6,
                                             1e12, 1e12, 1e12])
    assert float(soft.frequencies_hz[0]) < float(clamped.frequencies_hz[0])


def test_pdelta_and_buckling_with_springs():
    """Stiff springs recover clamped P-delta and buckling results; soft
    springs LOWER the global buckling factor (foundation flexibility)."""
    from small_fem_solver_tpu.ops.buckling import buckling_analysis

    model, wave, case = _storm()
    k_stiff = [1e13, 1e13, 1e13, 1e19, 1e19, 1e19]
    clamped = sf.analyze_pdelta(model, wave, case)
    stiff = sf.analyze_pdelta(model, wave, case, support_stiffness=k_stiff)
    np.testing.assert_allclose(float(stiff.pdelta_amplification),
                               float(clamped.pdelta_amplification),
                               rtol=1e-5)
    # atol covers the support DOFs: clamped U is exactly 0 there while the
    # 1e13 N/mm springs still comply ~1e-7 mm (displacements of interest
    # are ~60 mm)
    np.testing.assert_allclose(np.asarray(stiff.U), np.asarray(clamped.U),
                               rtol=1e-4, atol=1e-5)

    lin = sf.analyze(model, wave, case)
    b0 = buckling_analysis(model, lin)
    b1 = buckling_analysis(model, lin, support_stiffness=k_stiff)
    np.testing.assert_allclose(np.asarray(b1.load_factor),
                               np.asarray(b0.load_factor), rtol=1e-4)
    soft = buckling_analysis(model, lin,
                             support_stiffness=[1e5, 1e5, 1e5,
                                                1e11, 1e11, 1e11])
    assert float(soft.load_factor[0]) < float(b0.load_factor[0])


def test_dynamic_response_with_springs():
    """Stiff-spring harmonic response recovers the clamped DAF; the
    condensed (Craig-Bampton) variant agrees with the dense one."""
    from small_fem_solver_tpu.ops.dynamics import (dynamic_response,
                                                   dynamic_response_condensed)

    model, wave, case = _storm()
    k_stiff = [1e13, 1e13, 1e13, 1e19, 1e19, 1e19]
    clamped = dynamic_response(model, wave, case, n_harmonics=3, n_steps=24)
    stiff = dynamic_response(model, wave, case, n_harmonics=3, n_steps=24,
                             support_stiffness=k_stiff)
    np.testing.assert_allclose(float(stiff.daf), float(clamped.daf),
                               rtol=1e-4)
    k = [1e6, 1e6, 1e6, 1e12, 1e12, 1e12]
    dense = dynamic_response(model, wave, case, n_harmonics=3, n_steps=24,
                             support_stiffness=k)
    n_seg = 2
    refined = sf.refine_model(model, n_seg)
    red = dynamic_response_condensed(model, refined, n_seg, wave, case,
                                     n_harmonics=3, n_steps=24,
                                     n_chain_modes=12, support_stiffness=k)
    # same sprung physics on the refined reduced basis: DAF agrees to ~1%
    np.testing.assert_allclose(float(red.daf), float(dense.daf), rtol=2e-2)


def test_cb_modal_with_springs_matches_dense():
    """Craig-Bampton reduced modal analysis on foundation springs matches
    the dense spring-supported eigensolve on the same refined mesh."""
    from small_fem_solver_tpu.ops.dynamics import (modal_analysis,
                                                   modal_analysis_condensed)

    model = sf.default_3leg_jacket()
    n_seg = 4
    refined = sf.refine_model(model, n_seg)
    k = [1e6, 1e6, 1e6, 1e12, 1e12, 1e12]
    dense = modal_analysis(refined, n_modes=6, topside_mass_t=1100.0,
                           support_stiffness=k)
    red = modal_analysis_condensed(model, refined, n_seg, n_modes=6,
                                   topside_mass_t=1100.0, n_chain_modes=16,
                                   support_stiffness=k)
    np.testing.assert_allclose(np.asarray(red.frequencies_hz),
                               np.asarray(dense.frequencies_hz), rtol=1e-6)


def test_column_on_lateral_spring_matches_theory():
    """Tip-loaded column on a lateral base spring: the extra tip deflection
    is exactly F/k (series flexibility), rotations clamped stiff."""
    L, D, t = 20.0, 1000.0, 20.0
    nodes = {"BASE": (0.0, 0.0, 0.0), "TIP": (0.0, 0.0, L)}
    members = [{"name": "COL", "node1": "BASE", "node2": "TIP",
                "type": "leg"}]
    col = sf.build_model(nodes, members, fixed_nodes=["BASE"],
                         top_nodes=["TIP"], leg_section=(D, t))
    col = sf.refine_model(col, 4)
    wave = sf.airy_wave(1e-9, 9.4, 50.0)
    case = sf.LoadCase(F_shear_kN=100.0, sw_mode="none")
    clamped = sf.analyze(col, wave, case, solver="chol")
    k_lat = 1e5  # N/mm
    ssi = sf.analyze_ssi(col, wave, case, [k_lat, k_lat, 1e13,
                                           1e19, 1e19, 1e19])
    # tip lateral displacement (x) grows by F/k = 1e5 N / 1e5 N/mm = 1 mm
    # (the shear is applied along x for wave_dir 0: theta = 90deg -> y...)
    Uc = np.asarray(clamped.U).reshape(-1, 6)
    Us = np.asarray(ssi.U).reshape(-1, 6)
    tip = 1  # node order: BASE, TIP, then interior chain nodes
    F_N = 100.0 * 1e3
    d_extra = np.linalg.norm(Us[tip, :2] - Uc[tip, :2])
    # 1e-5 admits the finite stiffness of the "rigid" z/rotation springs
    np.testing.assert_allclose(d_extra, F_N / k_lat, rtol=1e-5)

"""Buckling checks: Euler-column validation and jacket screening."""
import jax.numpy as jnp
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.buckling import (buckling_analysis,
                                               euler_member_screen,
                                               member_axial_forces)


def _column(L=20.0, D=1000.0, t=20.0):
    nodes = {"BASE": (0.0, 0.0, 0.0), "TIP": (0.0, 0.0, L)}
    members = [{"name": "COL", "node1": "BASE", "node2": "TIP",
                "type": "leg"}]
    return sf.build_model(nodes, members, fixed_nodes=["BASE"],
                          top_nodes=["TIP"], leg_section=(D, t))


def test_cantilever_euler_load():
    """Linearized buckling of a tip-loaded cantilever column reproduces
    P_cr = pi^2 E I / (2L)^2 with the Timoshenko shear reduction
    1 / (1 + P_E / (G A_s)) — the classic geometric-stiffness validation."""
    L = 20.0
    col = _column(L)
    ref = sf.refine_model(col, 8)
    wave = sf.airy_wave(1e-9, 9.4, 50.0)
    P_kN = 1000.0
    res = sf.analyze(ref, wave, sf.LoadCase(F_axial_kN=P_kN, sw_mode="none"),
                     solver="chol")
    # axial force: positive in compression, equal to the applied load
    N = np.asarray(member_axial_forces(res))
    np.testing.assert_allclose(N, P_kN * 1e3, rtol=1e-8)

    lam = float(buckling_analysis(ref, res).load_factor[0])
    E, G = 210000.0, 210000.0 / 2.6
    I = float(col.sections.Iy[0])
    As = float(col.sections.Ay[0])
    P_E = np.pi**2 * E * I / (2 * L * 1000.0) ** 2
    P_timo = P_E / (1.0 + P_E / (G * As))
    np.testing.assert_allclose(lam * P_kN * 1e3, P_timo, rtol=2e-3)


def test_buckling_factor_scales_inversely_with_load():
    """Doubling the applied load halves the linearized buckling factor."""
    col = _column()
    ref = sf.refine_model(col, 4)
    wave = sf.airy_wave(1e-9, 9.4, 50.0)
    r1 = sf.analyze(ref, wave, sf.LoadCase(F_axial_kN=500.0, sw_mode="none"),
                    solver="chol")
    r2 = sf.analyze(ref, wave, sf.LoadCase(F_axial_kN=1000.0, sw_mode="none"),
                    solver="chol")
    l1 = float(buckling_analysis(ref, r1).load_factor[0])
    l2 = float(buckling_analysis(ref, r2).load_factor[0])
    np.testing.assert_allclose(l1 / l2, 2.0, rtol=1e-9)


def test_jacket_storm_screen():
    """Default storm case: the jacket is far from elastic buckling, legs
    carry the compression, and tension members screen to zero."""
    model = sf.default_3leg_jacket()
    wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="fenton", N=18)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom",
                       t_analysis=0.34)
    res = sf.analyze(model, wave, case, solver="chol")
    b = buckling_analysis(model, res)
    lam = np.asarray(b.load_factor)
    assert lam[0] > 5.0 and np.all(np.diff(lam) >= -1e-9)
    scr = euler_member_screen(model, res, k_factor=0.8)
    util = np.asarray(scr.utilization)
    assert 0.0 < util.max() < 0.5
    N = np.asarray(scr.axial_N)
    assert np.all(util[N <= 0] == 0.0)   # tension members excluded


def test_euler_screen_refined_aggregates_physical_members():
    """On a refined mesh the screen must use the PHYSICAL member length
    (segment lengths would inflate P_euler by n_seg^2 and hide failures)."""
    model = sf.default_3leg_jacket()
    wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="fenton", N=12)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom",
                       t_analysis=0.34)
    res_c = sf.analyze(model, wave, case, solver="chol")
    scr_c = sf.euler_member_screen(model, res_c, k_factor=0.8)
    n_seg = 4
    refined = sf.refine_model(model, n_seg)
    res_r = sf.analyze_condensed(model, refined, n_seg, wave, case)
    scr_r = sf.euler_member_screen(refined, res_r, k_factor=0.8,
                                   n_seg=n_seg)
    # one row per PHYSICAL member, Euler capacities identical (same lengths)
    assert scr_r.utilization.shape[0] == model.n_members
    np.testing.assert_allclose(np.asarray(scr_r.P_euler_N),
                               np.asarray(scr_c.P_euler_N), rtol=1e-9)
    # governing utilizations agree to load-discretization accuracy
    np.testing.assert_allclose(float(scr_r.utilization.max()),
                               float(scr_c.utilization.max()), rtol=0.05)


def test_condensed_buckling_matches_dense():
    """Craig-Bampton reduced buckling: with ALL interior modes retained the
    basis is complete and the factors equal the dense refined solution;
    truncation stays within 1% on the lowest (global) mode."""
    import small_fem_solver_tpu as sf
    from small_fem_solver_tpu.ops.buckling import (buckling_analysis,
                                                   buckling_analysis_condensed)

    model = sf.default_3leg_jacket()
    n_seg = 3
    refined = sf.refine_model(model, n_seg)
    wave = sf.airy_wave(17.038, 9.4, 50.0, 1.7)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    res = sf.analyze_condensed(model, refined, n_seg, wave, case)
    dense = buckling_analysis(refined, res, n_modes=3)
    exact = buckling_analysis_condensed(model, refined, n_seg, res,
                                        n_modes=3,
                                        n_chain_modes=6 * (n_seg - 1))
    np.testing.assert_allclose(np.asarray(exact.load_factor),
                               np.asarray(dense.load_factor), rtol=1e-8)
    trunc = buckling_analysis_condensed(model, refined, n_seg, res,
                                        n_modes=3, n_chain_modes=6)
    np.testing.assert_allclose(np.asarray(trunc.load_factor[0]),
                               np.asarray(dense.load_factor[0]), rtol=0.01)
    # mode shapes live on the full refined mesh
    assert exact.mode_shapes.shape == (3, refined.n_dof)
    # wrong-mesh results raise a clear error
    res_coarse = sf.analyze(model, wave, case)
    with pytest.raises(ValueError, match="refined"):
        buckling_analysis_condensed(model, refined, n_seg, res_coarse)


def test_condensed_buckling_scales():
    """The reduced eigenproblem size is refinement-independent: the same
    factors (discretization-converged) at n_seg=8 (~2.6k DOF) in seconds."""
    import small_fem_solver_tpu as sf
    from small_fem_solver_tpu.ops.buckling import buckling_analysis_condensed

    model = sf.default_3leg_jacket()
    wave = sf.airy_wave(17.038, 9.4, 50.0, 1.7)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    lams = []
    for n_seg in (3, 8):
        refined = sf.refine_model(model, n_seg)
        res = sf.analyze_condensed(model, refined, n_seg, wave, case)
        b = buckling_analysis_condensed(model, refined, n_seg, res,
                                        n_modes=2, n_chain_modes=10)
        lams.append(float(b.load_factor[0]))
    assert lams[1] == pytest.approx(lams[0], rel=0.03)

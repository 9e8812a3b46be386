"""Second-order (P-delta) analysis: amplification theory validation.

The reference excludes P-delta entirely (Info-tab exclusion list,
`JacketAnalysisGUI_v2.py:1544-1799`); this is the beyond-reference
capability test suite for analyze_pdelta.
"""
import numpy as np

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.buckling import buckling_analysis


def _column(L=20.0, D=1000.0, t=20.0):
    nodes = {"BASE": (0.0, 0.0, 0.0), "TIP": (0.0, 0.0, L)}
    members = [{"name": "COL", "node1": "BASE", "node2": "TIP",
                "type": "leg"}]
    return sf.build_model(nodes, members, fixed_nodes=["BASE"],
                          top_nodes=["TIP"], leg_section=(D, t))


def test_pdelta_matches_linear_without_axial_load():
    """No axial force -> K_G = 0 -> second order == first order."""
    col = sf.refine_model(_column(), 4)
    wave = sf.airy_wave(1e-9, 9.4, 50.0)
    case = sf.LoadCase(F_shear_kN=100.0, sw_mode="none")
    lin = sf.analyze(col, wave, case, solver="chol")
    pd = sf.analyze_pdelta(col, wave, case)
    # shear produces bending, hence tiny second-order axial coupling only
    U1, U2 = np.asarray(lin.U), np.asarray(pd.U)
    assert np.abs(U2 - U1).max() / np.abs(U1).max() < 1e-6
    np.testing.assert_allclose(float(pd.pdelta_amplification), 1.0,
                               rtol=1e-6)


def test_pdelta_cantilever_amplification():
    """Tip-loaded cantilever: lateral response amplifies by the classic
    ~1/(1 - P/P_cr) factor (exact for the amplified-sway idealization;
    the consistent-matrix result lands within a few % of it)."""
    col = sf.refine_model(_column(), 8)
    wave = sf.airy_wave(1e-9, 9.4, 50.0)
    res = sf.analyze(col, wave, sf.LoadCase(F_axial_kN=1000.0,
                                            F_shear_kN=50.0,
                                            sw_mode="none"), solver="chol")
    lam = float(buckling_analysis(col, res).load_factor[0])
    pd = sf.analyze_pdelta(col, wave, sf.LoadCase(F_axial_kN=1000.0,
                                                  F_shear_kN=50.0,
                                                  sw_mode="none"))
    amp = float(pd.pdelta_amplification)
    amp_theory = 1.0 / (1.0 - 1.0 / lam)
    assert amp > 1.001  # amplification is real at P/P_cr ~ 4%
    np.testing.assert_allclose(amp, amp_theory, rtol=0.03)


def test_pdelta_jacket_storm_small_amplification():
    """Default storm case: lambda_cr ~ 23, so P-delta amplification is a
    few percent at most and displacements grow, never shrink."""
    model = sf.default_3leg_jacket()
    wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="fenton", N=12)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom",
                       t_analysis=0.34)
    lin = sf.analyze(model, wave, case, solver="chol")
    pd = sf.analyze_pdelta(model, wave, case)
    amp = float(pd.pdelta_amplification)
    assert 1.0 < amp < 1.15
    assert float(pd.max_displacement_mm) >= float(lin.max_displacement_mm)
    # equilibrium still holds exactly in the second-order state
    applied = np.asarray(pd.F_applied).reshape(-1, 6)[:, :3].sum(axis=0)
    np.testing.assert_allclose(np.asarray(pd.total_reaction[:3]), -applied,
                               rtol=1e-9)


def test_pdelta_condensed_matches_dense():
    """The condensed P-delta iterates the identical linearized system
    through the chain solver: results match the dense path on the same
    refined mesh (same fixed-point count) to solver precision."""
    import small_fem_solver_tpu as sf

    model = sf.default_3leg_jacket()
    n_seg = 3
    refined = sf.refine_model(model, n_seg)
    wave = sf.airy_wave(17.038, 9.4, 50.0, 1.7)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    dense = sf.analyze_pdelta(refined, wave, case, n_iter=3,
                              accel="analytic")
    cond = sf.analyze_pdelta_condensed(model, refined, n_seg, wave, case,
                                       n_iter=3)
    np.testing.assert_allclose(np.asarray(cond.U), np.asarray(dense.U),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(float(cond.pdelta_amplification),
                               float(dense.pdelta_amplification), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(cond.utilization),
                               np.asarray(dense.utilization),
                               rtol=1e-8, atol=1e-12)
    assert float(cond.pdelta_amplification) > 1.0

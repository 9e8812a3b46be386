"""Pile-soil interaction: API p-y/t-z/Q-z curves and pile-head springs.

Verification: published anchors for the sand wedge coefficients, hand
checks of the Matlock clay profile and curve shapes, the full lateral and
axial Winkler solvers against the closed-form beam/rod-on-elastic-
foundation solutions (a 'linear' layer kind exists exactly for this), and
the end-to-end workflow clamped analyze -> soil springs -> analyze_ssi.
"""
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.soil import (Pile, SoilLayer, _lateral_params,
                                           _overburden, _sand_C123,
                                           axial_solve, lateral_solve,
                                           pile_head_stiffness,
                                           py_resistance,
                                           soil_support_stiffness,
                                           tz_resistance)

PILE = Pile(D_mm=2134.0, t_mm=50.0, L_m=60.0, n_elem=48)
D_M = PILE.D_mm / 1000.0
EI = 210e9 * np.pi / 64 * (D_M**4 - (D_M - 0.1) ** 4)
EA = 210e9 * np.pi / 4 * (D_M**2 - (D_M - 0.1) ** 2)


def test_sand_wedge_coefficients_published_anchors():
    """Reese-Cox-Koop C1/C2/C3 at phi = 30 deg: ~1.9 / 2.7 / 28 (API RP 2A
    commentary chart values)."""
    C1, C2, C3 = _sand_C123(30.0)
    assert abs(C1 - 1.9) < 0.15
    assert abs(C2 - 2.7) < 0.15
    assert abs(C3 - 28.0) < 2.0
    # monotone in phi
    assert _sand_C123(35.0)[0] > C1
    assert _sand_C123(35.0)[2] > C3


def test_overburden_layered():
    soil = [SoilLayer("clay", 0.0, 10.0, su_kPa=30.0, gamma_kN_m3=8.0),
            SoilLayer("sand", 10.0, 40.0, phi_deg=30.0, gamma_kN_m3=10.0)]
    sig = _overburden(soil, np.array([0.0, 5.0, 10.0, 20.0, 50.0]))
    np.testing.assert_allclose(sig[0], 0.0)
    np.testing.assert_allclose(sig[1], 8e3 * 5)
    np.testing.assert_allclose(sig[2], 8e3 * 10)
    np.testing.assert_allclose(sig[3], 8e3 * 10 + 10e3 * 10)
    # beyond the last layer the deepest layer extends
    np.testing.assert_allclose(sig[4], 8e3 * 10 + 10e3 * 30 + 10e3 * 10)


def test_clay_py_curve_shape():
    """Matlock: pu transitions from the wedge 3 + gam z/su + J z/D to the
    flow limit 9 su D; p(y) follows 0.5 (y/y50)^(1/3) capped at pu."""
    su, gam, D = 50e3, 8e3, D_M
    soil = [SoilLayer("clay", 0.0, 100.0, su_kPa=50.0, gamma_kN_m3=8.0,
                      eps50=0.02)]
    z = np.array([2.0, 80.0])
    par = _lateral_params(PILE, soil, z)
    Np_shallow = 3.0 + gam * 2.0 / su + 0.5 * 2.0 / D
    np.testing.assert_allclose(float(par.pu[0]), Np_shallow * su * D,
                               rtol=1e-12)
    np.testing.assert_allclose(float(par.pu[1]), 9.0 * su * D, rtol=1e-12)
    y50 = 2.5 * 0.02 * D
    np.testing.assert_allclose(float(par.c1[0]), y50, rtol=1e-12)
    # curve: at y = y50, p = 0.5 pu; at y = 8 y50 (and beyond), p = pu
    import jax.numpy as jnp
    p = py_resistance(par, jnp.asarray([y50, 100.0]))
    np.testing.assert_allclose(float(p[0]), 0.5 * float(par.pu[0]),
                               rtol=1e-9)
    np.testing.assert_allclose(float(p[1]), float(par.pu[1]), rtol=1e-9)
    # odd
    p_neg = py_resistance(par, jnp.asarray([-y50, -100.0]))
    np.testing.assert_allclose(np.asarray(p_neg), -np.asarray(p), rtol=1e-12)


def test_sand_py_tanh_initial_slope():
    soil = [SoilLayer("sand", 0.0, 100.0, phi_deg=30.0, gamma_kN_m3=10.0)]
    z = np.array([10.0])
    par = _lateral_params(PILE, soil, z)
    import jax.numpy as jnp
    # API chart: k(30 deg) = 11 MN/m^3 -> initial slope k z
    y = 1e-6
    p = float(py_resistance(par, jnp.asarray([y]))[0])
    np.testing.assert_allclose(p / y, 11e6 * 10.0, rtol=1e-3)
    # saturates at A pu
    p_big = float(py_resistance(par, jnp.asarray([10.0]))[0])
    np.testing.assert_allclose(p_big, float(par.pu[0]), rtol=1e-6)


def test_lateral_linear_soil_matches_closed_form():
    """Semi-infinite beam on elastic foundation under head shear H:
    y0 = 2 H lambda / Es, theta0 = -2 H lambda^2 / Es."""
    Es = 50e6
    soil = [SoilLayer("linear", 0.0, 100.0, Es_MPa=50.0)]
    H = 1e6
    sol = lateral_solve(PILE, soil, H)
    lam = (Es / (4 * EI)) ** 0.25
    assert lam * PILE.L_m > 4.0      # effectively semi-infinite
    np.testing.assert_allclose(float(sol.u[0]), 2 * H * lam / Es, rtol=0.02)
    np.testing.assert_allclose(float(sol.u[1]), -2 * H * lam**2 / Es,
                               rtol=0.02)
    assert float(sol.residual) < 1e-10
    # head moment M: y0 = -2 M lam^2 / Es... (sign: +M rotates +theta)
    M = 5e6
    solM = lateral_solve(PILE, soil, 0.0, M)
    np.testing.assert_allclose(float(solM.u[1]), 4 * M * lam**3 / Es,
                               rtol=0.02)


def test_axial_linear_soil_matches_closed_form():
    """Rod with distributed skin springs: K = sqrt(EA ks) tanh(mu L)."""
    ks = 20e6
    soil = [SoilLayer("linear", 0.0, 100.0, Es_MPa=50.0, ks_MPa=20.0)]
    V = 5e6
    sol = axial_solve(PILE, soil, V)
    mu = np.sqrt(ks / EA)
    K_cf = np.sqrt(EA * ks) * np.tanh(mu * PILE.L_m)
    np.testing.assert_allclose(V / float(sol.u[0]), K_cf, rtol=1e-3)
    assert float(sol.residual) < 1e-10


def test_nonlinear_softening_and_layering():
    soil = [SoilLayer("clay", 0.0, 8.0, su_kPa=40.0, gamma_kN_m3=8.0,
                      eps50=0.02),
            SoilLayer("sand", 8.0, 100.0, phi_deg=32.0, gamma_kN_m3=10.0)]
    s1 = lateral_solve(PILE, soil, 1e6)
    s2 = lateral_solve(PILE, soil, 2e6)
    # secant softens with load level
    assert float(s2.u[0]) > 2.0 * float(s1.u[0])
    assert float(s1.residual) < 1e-8 and float(s2.residual) < 1e-8
    # stiffer clay -> stiffer response
    stiff = [SoilLayer("clay", 0.0, 8.0, su_kPa=200.0, gamma_kN_m3=8.0,
                       eps50=0.005),
             SoilLayer("sand", 8.0, 100.0, phi_deg=38.0, gamma_kN_m3=11.0)]
    s3 = lateral_solve(PILE, stiff, 1e6)
    assert abs(float(s3.u[0])) < abs(float(s1.u[0]))


def test_tz_curves():
    import jax.numpy as jnp
    soil = [SoilLayer("clay", 0.0, 20.0, su_kPa=60.0, gamma_kN_m3=8.0),
            SoilLayer("sand", 20.0, 100.0, phi_deg=35.0, gamma_kN_m3=10.0)]
    from small_fem_solver_tpu.ops.soil import _axial_params
    z = np.array([10.0, 50.0])
    par, Q_max, D = _axial_params(PILE, soil, z)
    # clay: alpha method, psi = su / sig'_v = 60/80 < 1 -> alpha = 0.5 psi^-0.5
    sig = 8e3 * 10.0
    psi = 60e3 / sig
    alpha = min(0.5 * psi**-0.5, 1.0)
    np.testing.assert_allclose(float(par.tmax[0]),
                               alpha * 60e3 * np.pi * D, rtol=1e-9)
    # sand: 0.8 sig tan(30 deg) pi D
    sig50 = 8e3 * 20 + 10e3 * 30
    np.testing.assert_allclose(
        float(par.tmax[1]), 0.8 * sig50 * np.tan(np.deg2rad(30.0)) * np.pi * D,
        rtol=1e-9)
    # clay mobilization peaks at z/D = 0.01 and residual 0.9 beyond 0.02 D
    t = tz_resistance(par, jnp.asarray([0.01 * D, 0.05 * D]))
    np.testing.assert_allclose(float(t[0]), float(par.tmax[0]), rtol=1e-9)
    t_res = tz_resistance(par, jnp.asarray([0.05 * D, 0.0]))
    np.testing.assert_allclose(float(t_res[0]), 0.9 * float(par.tmax[0]),
                               rtol=1e-9)
    # sand tip in sand: Nq(35) = 50, overburden at the passed tip depth
    # (z = 50 m here — _axial_params takes the tip from the last z entry)
    np.testing.assert_allclose(Q_max,
                               50.0 * (8e3 * 20 + 10e3 * 30)
                               * np.pi / 4 * D**2, rtol=1e-9)


def test_pile_head_stiffness_and_ssi_workflow():
    soil = [SoilLayer("clay", 0.0, 8.0, su_kPa=40.0, gamma_kN_m3=8.0,
                      eps50=0.02),
            SoilLayer("sand", 8.0, 100.0, phi_deg=35.0, gamma_kN_m3=10.0)]
    head = pile_head_stiffness(PILE, soil, H_kN=2000.0, V_kN=15000.0)
    ks = head.support_stiffness
    assert ks.shape == (6,)
    assert np.all(ks > 0) and np.all(np.isfinite(ks))
    assert np.all(head.residuals < 1e-8)
    # axial piles are much stiffer than lateral (tip + shaft vs bending)
    assert ks[2] > 5.0 * ks[0]

    # end-to-end: clamped analyze -> per-support springs -> analyze_ssi
    model = sf.default_3leg_jacket()
    wave = sf.airy_wave(17.038, 9.4, 50.0, 1.7)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom",
                       t_analysis=0.34)
    clamped = sf.analyze(model, wave, case, solver="chol")
    springs = soil_support_stiffness(model, soil, PILE,
                                     reactions=clamped.reactions)
    assert springs.shape == (3, 6)
    assert np.all(springs > 0)
    ssi = sf.analyze_ssi(model, wave, case, springs)
    # springs soften the structure: displacements grow, equilibrium holds
    assert float(ssi.max_displacement_mm) > float(clamped.max_displacement_mm)
    np.testing.assert_allclose(np.asarray(ssi.total_reaction[:3]),
                               np.asarray(clamped.total_reaction[:3]),
                               rtol=1e-6, atol=5.0)


def test_layered_overburden_in_sand_pu():
    """Sand p_u must use the TRUE integrated overburden, not the local
    layer's gamma*z: clay (8 kN/m3) over sand — at z = 12 m the sand pu
    uses sigma'_v = 8*10 + 10*2 = 100 kPa, not 10*12 = 120."""
    soil = [SoilLayer("clay", 0.0, 10.0, su_kPa=40.0, gamma_kN_m3=8.0),
            SoilLayer("sand", 10.0, 100.0, phi_deg=30.0, gamma_kN_m3=10.0)]
    z = np.array([12.0])
    par = _lateral_params(PILE, soil, z)
    C1, C2, C3 = _sand_C123(30.0)
    sig = 8e3 * 10 + 10e3 * 2
    pu_hand = min((C1 * 12.0 + C2 * D_M) * sig, C3 * D_M * sig)
    A = max(3.0 - 0.8 * 12.0 / D_M, 0.9)
    np.testing.assert_allclose(float(par.pu[0]), A * pu_hand, rtol=1e-12)


def test_scour():
    """General scour: no soil in the hole, reduced overburden below, and
    a monotonically softer pile head."""
    soil = [SoilLayer("sand", 0.0, 100.0, phi_deg=32.0, gamma_kN_m3=10.0)]
    S = 5.0
    z = np.array([2.0, 12.0])
    par = _lateral_params(PILE, soil, z, scour_m=S)
    assert float(par.pu[0]) == 0.0 and float(par.c2[0]) == 0.0
    # below the hole: depth and overburden measured from the scoured line
    C1, C2, C3 = _sand_C123(32.0)
    z_eff = 12.0 - S
    sig = 10e3 * z_eff
    pu_hand = min((C1 * z_eff + C2 * D_M) * sig, C3 * D_M * sig)
    A = max(3.0 - 0.8 * z_eff / D_M, 0.9)
    np.testing.assert_allclose(float(par.pu[1]), A * pu_hand, rtol=1e-12)

    y_no = abs(float(lateral_solve(PILE, soil, 2e6).u[0]))
    y_s2 = abs(float(lateral_solve(PILE, soil, 2e6, scour_m=2.0).u[0]))
    y_s5 = abs(float(lateral_solve(PILE, soil, 2e6, scour_m=5.0).u[0]))
    assert y_no < y_s2 < y_s5
    # axial capacity also drops
    u_no = abs(float(axial_solve(PILE, soil, 1e7).u[0]))
    u_s5 = abs(float(axial_solve(PILE, soil, 1e7, scour_m=5.0).u[0]))
    assert u_no < u_s5
    # head springs soften
    k0 = pile_head_stiffness(PILE, soil, H_kN=2000.0,
                             V_kN=10000.0).support_stiffness
    k5 = pile_head_stiffness(PILE, soil, H_kN=2000.0, V_kN=10000.0,
                             scour_m=5.0).support_stiffness
    assert np.all(k5 < k0)


def test_cli_pile(capsys):
    from small_fem_solver_tpu.cli import main
    main(["pile", "--pile-H", "1500", "--pile-V", "12000"])
    out = capsys.readouterr().out
    assert "secant pile-head springs" in out
    assert "kx=ky=" in out


def test_validation():
    with pytest.raises(ValueError, match="kind"):
        SoilLayer("rock", 0.0, 10.0)
    with pytest.raises(ValueError, match="z_bot"):
        SoilLayer("sand", 10.0, 5.0)
    with pytest.raises(ValueError, match="Es_MPa"):
        SoilLayer("linear", 0.0, 10.0)
    with pytest.raises(ValueError, match="positive"):
        Pile(D_mm=2000.0, t_mm=50.0, L_m=-1.0)
    with pytest.raises(ValueError, match="n_elem"):
        Pile(D_mm=2000.0, t_mm=50.0, L_m=30.0, n_elem=2)
    soil = [SoilLayer("sand", 0.0, 100.0)]
    with pytest.raises(ValueError, match="working"):
        pile_head_stiffness(PILE, soil, H_kN=0.0)

"""Wind loading: API profile, member drag, topside block.

Verification: the power-law profile by hand, a single dry horizontal
member's force against the closed-form integral, perpendicular
decomposition on an inclined member, submerged members loading zero,
equilibrium through analyze(), parity of the dense and condensed load
paths, and the exact off switch.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.models.model import build_model
from small_fem_solver_tpu.ops.wind import (RHO_AIR, wind_member_forces,
                                           wind_profile, wind_topside_force)

STORM = dict(wave_dir_deg=38.0, current_dir_deg=38.0, F_axial_kN=25100.0,
             F_shear_kN=2900.0, custom_sw_tonnes=1100.0, sw_mode="custom")


def _member(z1, z2, length=10.0, D=800.0):
    nodes = {"A": (0.0, 0.0, z1), "B": (length, 0.0, z2)}
    members = [{"name": "M", "node1": "A", "node2": "B", "type": "leg"}]
    return build_model(nodes, members, ["A"], ["B"], leg_section=(D, 40.0),
                       brace_section=(400.0, 20.0))


def test_profile_hand_values():
    np.testing.assert_allclose(float(wind_profile(40.0, 10.0)), 40.0)
    np.testing.assert_allclose(float(wind_profile(40.0, 80.0)),
                               40.0 * 8.0**0.125, rtol=1e-12)
    # clamped at 0.1 m
    np.testing.assert_allclose(float(wind_profile(40.0, -5.0)),
                               40.0 * (0.1 / 10.0) ** 0.125, rtol=1e-12)


def test_horizontal_member_closed_form():
    """Dry horizontal member at z = 20 m, wind perpendicular to the axis:
    F = 0.5 rho_air Cs D L u(20)^2 along the wind heading."""
    model = _member(20.0, 20.0, length=10.0, D=800.0)
    # member runs along +x; wind from North (dir=0) blows along -y?  The
    # compass convention: theta = 90 - dir, so dir=0 -> theta=90 -> +y.
    nodal, total = wind_member_forces(model.coords, model.conn,
                                      jnp.asarray([0.8]), 30.0, 0.0, Cs=0.5)
    u20 = 30.0 * 2.0**0.125
    F_hand = 0.5 * RHO_AIR * 0.5 * 0.8 * 10.0 * u20**2
    np.testing.assert_allclose(float(total[1]), F_hand, rtol=1e-10)
    assert abs(float(total[0])) < 1e-9 * F_hand
    assert abs(float(total[2])) < 1e-9 * F_hand
    # lever rule: symmetric member -> equal split
    np.testing.assert_allclose(float(nodal[0, 1]), F_hand / 2, rtol=1e-10)


def test_parallel_wind_loads_nothing():
    """Wind along the member axis has no perpendicular component."""
    model = _member(20.0, 20.0, length=10.0)
    # member along +x; wind dir 90 (East) -> theta = 0 -> +x: parallel
    _, total = wind_member_forces(model.coords, model.conn,
                                  jnp.asarray([0.8]), 30.0, 90.0)
    np.testing.assert_allclose(np.asarray(total), 0.0, atol=1e-8)


def test_submerged_member_loads_zero():
    model = _member(-20.0, -5.0)
    _, total = wind_member_forces(model.coords, model.conn,
                                  jnp.asarray([0.8]), 40.0, 0.0)
    np.testing.assert_allclose(np.asarray(total), 0.0, atol=1e-12)


def test_topside_force():
    F = float(wind_topside_force(40.0, 500.0, 80.0, Cs=1.1))
    u = 40.0 * 8.0**0.125
    np.testing.assert_allclose(F, 0.5 * RHO_AIR * 1.1 * 500.0 * u**2,
                               rtol=1e-12)


def test_analyze_with_wind_equilibrium_and_off_switch():
    model = sf.default_3leg_jacket()
    wave = sf.airy_wave(9.5, 9.4, 50.0, 1.2)
    base = sf.LoadCase(t_analysis=1.3, **STORM)
    windy = dataclasses.replace(base, wind_speed_ms=40.0, wind_dir_deg=38.0,
                                wind_topside_area_m2=800.0)
    r0 = sf.analyze(model, wave, base, solver="chol")
    r1 = sf.analyze(model, wave, windy, solver="chol")
    # off switch: exact parity
    r0b = sf.analyze(model, wave,
                     dataclasses.replace(base, wind_speed_ms=0.0),
                     solver="chol")
    np.testing.assert_array_equal(np.asarray(r0.U), np.asarray(r0b.U))
    # wind adds horizontal load; equilibrium holds
    dF = np.asarray(r1.F_applied - r0.F_applied).reshape(-1, 6)
    dH = dF[:, :2].sum(axis=0)
    assert np.linalg.norm(dH) > 1e5          # > 100 kN of wind
    # the normal-drag decomposition on inclined members leaves a SMALL
    # vertical component (real physics, not spurious): << the horizontal
    dV = dF[:, 2].sum()
    assert abs(dV) < 0.01 * np.linalg.norm(dH)
    d_reac = np.asarray(r1.total_reaction - r0.total_reaction)[:3]
    np.testing.assert_allclose(d_reac[:2], -dH, rtol=1e-8, atol=1e-4)
    # wind along 38 deg compass: components along (sin38, cos38)... theta
    # = 90 - 38: direction (cos52, sin52)
    th = np.deg2rad(90.0 - 38.0)
    dir_hand = np.array([np.cos(th), np.sin(th)])
    # member-axis decompositions leave ~1e-4 cross components on this
    # near-symmetric jacket
    np.testing.assert_allclose(dH / np.linalg.norm(dH), dir_hand, atol=1e-3)


def test_condensed_path_matches_dense_with_wind():
    coarse = sf.default_3leg_jacket()
    n_seg = 3
    refined = sf.refine_model(coarse, n_seg)
    wave = sf.airy_wave(9.5, 9.4, 50.0, 1.2)
    case = sf.LoadCase(sw_mode="calculated", wind_speed_ms=35.0,
                       wind_dir_deg=120.0, wind_topside_area_m2=600.0,
                       **{k: v for k, v in STORM.items()
                          if k not in ("sw_mode", "custom_sw_tonnes")})
    from small_fem_solver_tpu.api import phase_scan_condensed
    scan = phase_scan_condensed(coarse, refined, n_seg, wave, case,
                                n_steps=2, accel="fd",
                                kinematics="pointwise")
    ref = sf.analyze(refined, wave,
                     dataclasses.replace(case, t_analysis=0.0),
                     solver="chol")
    U_ref = np.asarray(ref.U)
    np.testing.assert_allclose(np.asarray(scan.U[0]), U_ref, rtol=1e-8,
                               atol=1e-8 * np.abs(U_ref).max())
    # separable kinematics carries the same static wind offset
    s = phase_scan_condensed(coarse, refined, n_seg, wave, case,
                             n_steps=2, kinematics="separable")
    np.testing.assert_allclose(np.asarray(s.utilization),
                               np.asarray(scan.utilization), rtol=5e-4,
                               atol=5e-6)


def test_cli_wind(capsys):
    from small_fem_solver_tpu.cli import main
    main(["run", "--wind-speed", "38", "--wind-area", "700", "--f32"])
    out = capsys.readouterr().out
    assert "Wind: 38.0 m/s" in out

"""Wave slamming (quasi-static splash-zone impact; DNV-RP-C205 8.6 form).

The reference excludes slamming (its Info tab). Verification: a
hand-computed slam load on a short horizontal member being crossed by a
rising Airy surface, zero on vertical/dry/deep members, exact off-switch
parity, and global equilibrium through analyze().
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.morison import hydro_diameter_m, morison_loads
from small_fem_solver_tpu.ops.waves import surface_elevation, surface_velocity


def _member(z1, z2, x0=0.0, length=0.4, D=800.0):
    from small_fem_solver_tpu.models.model import build_model
    nodes = {"A": (x0, 0.0, z1), "B": (x0 + length, 0.0, z2)}
    members = [{"name": "M", "node1": "A", "node2": "B", "type": "leg"}]
    return build_model(nodes, members, ["A"], ["B"], leg_section=(D, 40.0),
                       brace_section=(400.0, 20.0))


def _slam_only(model, wave, t, cs=np.pi):
    """Slam contribution = (drag with Cd=0, Cm=0, slam on)."""
    D_m = hydro_diameter_m(model.sections, model.sect_id)
    return morison_loads(wave, model.coords, model.conn, D_m, 0.0, 0.0,
                        0.0, 0.0, 1025.0, t, slam_cs=cs)


def test_hand_computed_horizontal_member():
    """Short horizontal member at z=0: at the phase where the surface
    crosses zero RISING at the member, slam per unit length is
    0.5 rho Cs D eta_dot^2 with eta_dot = (H/2) omega (Airy)."""
    wave = sf.airy_wave(6.0, 10.0, 60.0, 0.0)
    # eta = (H/2) cos(kx - wt): at x=0, t=T*3/4, theta = -3pi/2 -> eta=0,
    # eta_dot = (H/2) w sin(-3pi/2) = +(H/2) w (rising)
    t = 7.5
    model = _member(0.0, 0.0, x0=0.0)
    eta = float(surface_elevation(wave, 0.0, t))
    eta_dot = float(surface_velocity(wave, 0.0, t))
    assert abs(eta) < 1e-6 and eta_dot > 0.0
    H_half_w = 3.0 * float(wave.omega)
    np.testing.assert_allclose(eta_dot, H_half_w, rtol=1e-10)

    r = _slam_only(model, wave, t)
    L = 0.4
    hand = 0.5 * 1025.0 * np.pi * 0.8 * eta_dot**2 * L
    # the short member sees a nearly uniform eta_dot; kx variation ~ 1e-4
    np.testing.assert_allclose(float(r.member_drag[0, 2]), hand, rtol=1e-3)
    # slam is vertical: x/y components vanish for this geometry
    assert abs(float(r.member_drag[0, 0])) < 1e-6 * hand
    assert float(r.total_inertia[2]) == 0.0


def test_vertical_member_sees_no_slam():
    wave = sf.airy_wave(6.0, 10.0, 60.0, 0.0)
    model = _member(-5.0, 5.0, length=0.0)  # vertical: same x/y, z1 != z2
    r = _slam_only(model, wave, 7.5)
    np.testing.assert_allclose(np.asarray(r.member_drag[0]), 0.0, atol=1e-10)


def test_deep_and_dry_members_see_no_slam():
    wave = sf.airy_wave(6.0, 10.0, 60.0, 0.0)
    for z in (-30.0, 20.0):
        r = _slam_only(_member(z, z), wave, 7.5)
        np.testing.assert_allclose(np.asarray(r.member_drag[0]), 0.0,
                                   atol=1e-12)


def test_falling_surface_no_slam():
    wave = sf.airy_wave(6.0, 10.0, 60.0, 0.0)
    t = 2.5  # theta = -pi/2: eta = 0 but eta_dot < 0 (falling)
    assert float(surface_velocity(wave, 0.0, t)) < 0.0
    r = _slam_only(_member(0.0, 0.0), wave, t)
    np.testing.assert_allclose(np.asarray(r.member_drag[0]), 0.0, atol=1e-12)


def test_off_switch_exact_parity():
    model = sf.default_3leg_jacket()
    wave = sf.airy_wave(9.5, 9.4, 50.0, 1.2)
    D_m = hydro_diameter_m(model.sections, model.sect_id)
    a = morison_loads(wave, model.coords, model.conn, D_m, 38.0, 38.0,
                      0.7, 2.0, 1025.0, 1.3)
    b = morison_loads(wave, model.coords, model.conn, D_m, 38.0, 38.0,
                      0.7, 2.0, 1025.0, 1.3, slam_cs=0.0)
    np.testing.assert_array_equal(np.asarray(a.nodal_forces),
                                  np.asarray(b.nodal_forces))


def test_analyze_equilibrium_and_fast_path_guard():
    model = sf.default_3leg_jacket()
    wave = sf.airy_wave(17.038, 9.4, 50.0, 1.7)
    base = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       sw_mode="none", t_analysis=7.0)
    slam = dataclasses.replace(base, slam_cs=float(np.pi))
    r0 = sf.analyze(model, wave, base, solver="chol")
    r1 = sf.analyze(model, wave, slam, solver="chol")
    # equilibrium holds with slam on: reactions = -(applied morison)
    tm = np.asarray(r1.morison.total_morison)
    np.testing.assert_allclose(np.asarray(r1.total_reaction[:3]), -tm,
                               rtol=1e-8, atol=1.0)
    # at SOME phase of the period the slam changes the loads
    changed = False
    for t in np.linspace(0.0, 9.4, 12):
        ca = dataclasses.replace(base, t_analysis=float(t))
        cb = dataclasses.replace(slam, t_analysis=float(t))
        fa = sf.analyze(model, wave, ca, solver="chol")
        fb = sf.analyze(model, wave, cb, solver="chol")
        if not np.allclose(np.asarray(fa.morison.total_morison),
                           np.asarray(fb.morison.total_morison)):
            changed = True
            break
    assert changed, "slam never activated over a full period"
    # separable/spectral paths refuse slam with a clear error
    refined = sf.refine_model(model, 2)
    from small_fem_solver_tpu.api import phase_scan_condensed
    with pytest.raises(ValueError, match="pointwise"):
        phase_scan_condensed(model, refined, 2, wave, slam, n_steps=2,
                             kinematics="separable")
    from small_fem_solver_tpu.parallel.sweep import (make_case_batch,
                                                     make_wave_batch)
    with pytest.raises(ValueError, match="pointwise"):
        sf.design_envelope_condensed(
            model, refined, 2,
            make_wave_batch([2.0, 3.0], 9.4, 50.0),
            make_case_batch(slam, t_analysis=jnp.zeros(2)), n_steps=2)
    # ...but the pointwise condensed scan accepts it and matches dense
    scan = phase_scan_condensed(model, refined, 2, wave, slam, n_steps=2,
                                accel="fd", kinematics="pointwise")
    ref = sf.analyze(refined, wave,
                     dataclasses.replace(slam, t_analysis=0.0),
                     solver="chol")
    U_ref = np.asarray(ref.U)
    np.testing.assert_allclose(np.asarray(scan.U[0]), U_ref, rtol=1e-8,
                               atol=1e-8 * np.abs(U_ref).max())

"""Appurtenances: hydro-only members (risers/conductors) + per-member Cd/Cm.

The reference excludes appurtenances outright (its Info tab). Verification:
per-member coefficient vectors reduce to the scalar path; an appurtenance
attracts exactly the Morison load of an identical structural member while
adding no stiffness/weight; multipliers scale drag/inertia independently;
loads flow through the dense, phase-batch, separable, condensed-scan and
JSON round-trip paths consistently.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.morison import (hydro_diameter_m,
                                              hydro_members, morison_loads,
                                              morison_phase_batch)

STORM = dict(wave_dir_deg=38.0, current_dir_deg=38.0, F_axial_kN=25100.0,
             F_shear_kN=2900.0, custom_sw_tonnes=1100.0, sw_mode="custom")


def _wave(dtype=jnp.float64):
    return sf.airy_wave(9.5, 9.4, 50.0, 1.2, dtype=dtype)


def test_vector_cd_cm_match_scalar_pointwise_and_batch():
    model = sf.default_3leg_jacket()
    wave = _wave()
    D_m = hydro_diameter_m(model.sections, model.sect_id)
    M = model.n_members
    args = (wave, model.coords, model.conn, D_m, 38.0, 38.0)
    r_s = morison_loads(*args, 0.7, 2.0, 1025.0, 1.3)
    r_v = morison_loads(*args, jnp.full(M, 0.7), jnp.full(M, 2.0),
                        1025.0, 1.3)
    np.testing.assert_allclose(np.asarray(r_v.nodal_forces),
                               np.asarray(r_s.nodal_forces), rtol=1e-12)
    ts = jnp.linspace(0.0, 9.4, 7)
    b_s = morison_phase_batch(*args, 0.7, 2.0, 1025.0, ts)
    b_v = morison_phase_batch(*args, jnp.full(M, 0.7), jnp.full(M, 2.0),
                              1025.0, ts)
    np.testing.assert_allclose(np.asarray(b_v.nodal_forces),
                               np.asarray(b_s.nodal_forces), rtol=1e-10,
                               atol=1e-6)


def test_appurtenance_load_equals_member_of_same_diameter():
    """A riser between two jacket nodes attracts the same Morison load as
    the structural member that spans them (same D, mult 1)."""
    model = sf.default_3leg_jacket()
    conn = np.asarray(model.conn)
    # pick a fully submerged member and hang a same-D appurtenance on it
    e = 0
    n1, n2 = model.node_names[conn[e, 0]], model.node_names[conn[e, 1]]
    D_mm = float(model.sections.D_outer[int(model.sect_id[e])])
    app = sf.add_appurtenances(model, [
        {"name": "R1", "node1": n1, "node2": n2, "D_mm": D_mm}])
    wave = _wave()
    conn_h, D_h, Cd_h, Cm_h = hydro_members(app, 0.0, 0.7, 2.0)
    assert conn_h.shape[0] == model.n_members + 1
    r = morison_loads(wave, app.coords, conn_h, D_h, 38.0, 38.0,
                      Cd_h, Cm_h, 1025.0, 1.3)
    # the appended row duplicates member e's drag+inertia exactly
    np.testing.assert_allclose(np.asarray(r.member_drag[-1]),
                               np.asarray(r.member_drag[e]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r.member_inertia[-1]),
                               np.asarray(r.member_inertia[e]), rtol=1e-12)


def test_multipliers_scale_drag_and_inertia_independently():
    model = sf.default_3leg_jacket()
    conn = np.asarray(model.conn)
    n1, n2 = model.node_names[conn[0, 0]], model.node_names[conn[0, 1]]
    wave = _wave()

    def one(cd_mult, cm_mult):
        app = sf.add_appurtenances(model, [
            {"name": "R", "node1": n1, "node2": n2, "D_mm": 600.0,
             "cd_mult": cd_mult, "cm_mult": cm_mult}])
        conn_h, D_h, Cd_h, Cm_h = hydro_members(app, 0.0, 0.7, 2.0)
        r = morison_loads(wave, app.coords, conn_h, D_h, 38.0, 38.0,
                          Cd_h, Cm_h, 1025.0, 1.3)
        return np.asarray(r.member_drag[-1]), np.asarray(r.member_inertia[-1])

    d1, i1 = one(1.0, 1.0)
    d2, i2 = one(0.5, 2.0)
    np.testing.assert_allclose(d2, 0.5 * d1, rtol=1e-12)
    np.testing.assert_allclose(i2, 2.0 * i1, rtol=1e-12)
    d0, i0 = one(0.0, 1.0)
    assert np.all(d0 == 0.0)
    np.testing.assert_allclose(i0, i1, rtol=1e-12)


def test_no_stiffness_reaction_delta_equals_app_load():
    """analyze() with an appurtenance: K is unchanged (same free-vibration
    stiffness) and the reaction delta equals exactly the appurtenance's
    Morison force (global equilibrium)."""
    model = sf.default_3leg_jacket()
    conn = np.asarray(model.conn)
    z = np.asarray(model.coords)[:, 2]
    e = int(np.argmax((z[conn[:, 0]] < -5.0) & (z[conn[:, 1]] < -5.0)))
    n1, n2 = model.node_names[conn[e, 0]], model.node_names[conn[e, 1]]
    app = sf.add_appurtenances(model, [
        {"name": "R1", "node1": n1, "node2": n2, "D_mm": 900.0,
         "cd_mult": 1.0, "cm_mult": 1.0}])
    wave = _wave()
    case = sf.LoadCase(t_analysis=1.3, **STORM)
    r0 = sf.analyze(model, wave, case, solver="chol")
    r1 = sf.analyze(app, wave, case, solver="chol")
    # the appended hydro row is the LAST entry of the member arrays
    dF = (np.asarray(r1.morison.member_drag[-1])
          + np.asarray(r1.morison.member_inertia[-1]))
    assert np.linalg.norm(dF) > 1e3  # the riser attracts real load
    d_reac = np.asarray(r1.total_reaction[:3] - r0.total_reaction[:3])
    np.testing.assert_allclose(d_reac, -dF, rtol=1e-8, atol=1e-6)
    # displacements CHANGE (more load) but the stiffness does not: a
    # zero-wave case gives identical answers with and without the riser
    calm = sf.LoadCase(**STORM)
    w0 = sf.airy_wave(1e-6, 9.4, 50.0, 0.0)
    c0 = sf.analyze(model, w0, calm, solver="chol")
    c1 = sf.analyze(app, w0, calm, solver="chol")
    np.testing.assert_allclose(np.asarray(c1.U), np.asarray(c0.U),
                               rtol=1e-9, atol=1e-12)


def test_condensed_scan_matches_dense_with_appurtenance():
    coarse = sf.default_3leg_jacket()
    conn = np.asarray(coarse.conn)
    n1, n2 = coarse.node_names[conn[1, 0]], coarse.node_names[conn[1, 1]]
    coarse = sf.add_appurtenances(coarse, [
        {"name": "C1", "node1": n1, "node2": n2, "D_mm": 700.0,
         "cd_mult": 0.8, "cm_mult": 1.1}])
    n_seg = 3
    refined = sf.refine_model(coarse, n_seg)
    assert refined.n_appurtenances == 1
    wave = _wave()
    case = sf.LoadCase(sw_mode="calculated")
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


def test_separable_kinematics_close_to_pointwise_with_appurtenance():
    coarse = sf.default_3leg_jacket()
    conn = np.asarray(coarse.conn)
    n1, n2 = coarse.node_names[conn[1, 0]], coarse.node_names[conn[1, 1]]
    coarse = sf.add_appurtenances(coarse, [
        {"name": "C1", "node1": n1, "node2": n2, "D_mm": 700.0}])
    n_seg = 2
    refined = sf.refine_model(coarse, n_seg)
    wave = _wave()
    case = sf.LoadCase(**STORM)
    from small_fem_solver_tpu.api import phase_scan_condensed
    p = phase_scan_condensed(coarse, refined, n_seg, wave, case,
                             n_steps=4, kinematics="pointwise", accel="analytic")
    s = phase_scan_condensed(coarse, refined, n_seg, wave, case,
                             n_steps=4, kinematics="separable")
    np.testing.assert_allclose(np.asarray(s.utilization),
                               np.asarray(p.utilization), rtol=5e-4,
                               atol=5e-6)


def test_json_round_trip():
    import json
    model = sf.default_3leg_jacket()
    conn = np.asarray(model.conn)
    n1, n2 = model.node_names[conn[0, 0]], model.node_names[conn[0, 1]]
    model = sf.add_appurtenances(model, [
        {"name": "RISER-A", "node1": n1, "node2": n2, "D_mm": 610.0,
         "cd_mult": 1.05, "cm_mult": 0.95}])
    from small_fem_solver_tpu.utils.io import model_from_dict, model_to_dict
    d = json.loads(json.dumps(model_to_dict(model)))
    back, _ = model_from_dict(d)
    assert back.n_appurtenances == 1
    assert back.app_names == ("RISER-A",)
    np.testing.assert_array_equal(np.asarray(back.app_conn),
                                  np.asarray(model.app_conn))
    np.testing.assert_allclose(float(back.app_D_mm[0]), 610.0)
    np.testing.assert_allclose(float(back.app_cd_mult[0]), 1.05)
    np.testing.assert_allclose(float(back.app_cm_mult[0]), 0.95)


def test_validation():
    model = sf.default_3leg_jacket()
    conn = np.asarray(model.conn)
    n1, n2 = model.node_names[conn[0, 0]], model.node_names[conn[0, 1]]
    with pytest.raises(ValueError):
        sf.add_appurtenances(model, [
            {"name": "X", "node1": n1, "node2": n2, "D_mm": -5.0}])
    with pytest.raises(ValueError):
        sf.add_appurtenances(model, [
            {"name": "X", "node1": n1, "node2": n2, "D_mm": 500.0,
             "cd_mult": -1.0}])
    with pytest.raises(KeyError):
        sf.add_appurtenances(model, [
            {"name": "X", "node1": "NOSUCH", "node2": n2, "D_mm": 500.0}])
    assert sf.add_appurtenances(model, []) is model

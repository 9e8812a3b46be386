"""Morison loading parity vs reference goldens (1e-8 relative) and
physics/shape sanity checks."""
import jax.numpy as jnp
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.morison import morison_loads, phase_scan


def _setup(golden):
    p = golden["params"]
    model = sf.default_3leg_jacket(leg_section=(p["D_leg"], p["t_leg"]),
                                   brace_section=(p["D_brace"], p["t_brace"]),
                                   rho_steel=p["rho_steel"])
    wave = sf.airy_wave(p["H"], p["T"], p["d"], p["U_c"])
    D_m = model.sections.D_outer[model.sect_id] / 1000.0
    return p, model, wave, D_m


@pytest.mark.parametrize("which", ["golden_default", "golden_variant"])
def test_morison_totals_match_reference(which, request):
    g = request.getfixturevalue(which)
    p, model, wave, D_m = _setup(g)
    r = morison_loads(wave, model.coords, model.conn, D_m,
                      p["wave_dir"], p["current_dir"], p["Cd"], p["Cm"],
                      p["rho_water"], p["t_analysis"])
    np.testing.assert_allclose(np.asarray(r.total_drag), g["morison"]["total_drag"],
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(r.total_inertia), g["morison"]["total_inertia"],
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(r.total_morison), g["morison"]["total_morison"],
                               rtol=1e-8)


@pytest.mark.parametrize("which", ["golden_default", "golden_variant"])
def test_morison_nodal_forces_match_reference(which, request):
    g = request.getfixturevalue(which)
    p, model, wave, D_m = _setup(g)
    r = morison_loads(wave, model.coords, model.conn, D_m,
                      p["wave_dir"], p["current_dir"], p["Cd"], p["Cm"],
                      p["rho_water"], p["t_analysis"])
    ref = np.array([g["morison"]["nodal_forces"][n] for n in model.node_names])
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(r.nodal_forces), ref,
                               rtol=1e-8, atol=1e-8 * scale)


@pytest.mark.parametrize("which", ["golden_default", "golden_variant"])
def test_morison_member_details_match_reference(which, request):
    g = request.getfixturevalue(which)
    p, model, wave, D_m = _setup(g)
    r = morison_loads(wave, model.coords, model.conn, D_m,
                      p["wave_dir"], p["current_dir"], p["Cd"], p["Cm"],
                      p["rho_water"], p["t_analysis"])
    det = g["morison"]["member_details"]
    assert [d["member"] for d in det] == list(model.member_names)
    drag_kN = np.linalg.norm(np.asarray(r.member_drag), axis=-1) / 1000
    inertia_kN = np.linalg.norm(np.asarray(r.member_inertia), axis=-1) / 1000
    sub_len = np.asarray(r.member_submerged_length)
    np.testing.assert_allclose(drag_kN, [d["drag_kN"] for d in det], rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(inertia_kN, [d["inertia_kN"] for d in det], rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(sub_len, [d["submerged_length"] for d in det],
                               rtol=1e-8, atol=1e-10)


def test_phase_scan_matches_reference(golden_default):
    g = golden_default
    p, model, wave, D_m = _setup(g)
    scan = phase_scan(wave, model.coords, model.conn, D_m,
                      p["wave_dir"], p["current_dir"], p["Cd"], p["Cm"],
                      p["rho_water"], n_steps=36)
    np.testing.assert_allclose(np.asarray(scan.t), g["phase_scan"]["t"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(scan.total_kN), g["phase_scan"]["total_kN"],
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(scan.drag_kN), g["phase_scan"]["drag_kN"],
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(scan.inertia_kN), g["phase_scan"]["inertia_kN"],
                               rtol=1e-8)
    crit_t = float(scan.t[int(scan.critical_index)])
    np.testing.assert_allclose(crit_t, g["phase_scan"]["critical_t"], rtol=1e-12)
    np.testing.assert_allclose(float(scan.total_kN[int(scan.critical_index)]),
                               g["phase_scan"]["critical_total_kN"], rtol=1e-8)


def test_fully_dry_structure_no_force():
    """A structure entirely above water sees zero Morison load."""
    model = sf.default_3leg_jacket()
    wave = sf.airy_wave(10.0, 9.0, 50.0)
    coords = model.coords + jnp.array([0.0, 0.0, 200.0])
    D_m = model.sections.D_outer[model.sect_id] / 1000.0
    r = morison_loads(wave, coords, model.conn, D_m, 0.0, 0.0, 0.7, 2.0, 1025.0, 0.0)
    assert float(jnp.abs(r.nodal_forces).max()) == 0.0
    assert float(jnp.abs(r.member_submerged_length).max()) == 0.0

"""Load combinations: linearity identities and the combo envelope."""
import numpy as np
import pytest

import small_fem_solver_tpu as sf

FY = 355.0


def _setup():
    model = sf.default_3leg_jacket()
    storm = sf.airy_wave(17.038, 9.4, 50.0, 1.7)
    calm = sf.airy_wave(1e-9, 9.4, 50.0)
    full = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    env_only = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                           sw_mode="none")
    grav_only = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                            F_axial_kN=25100.0, F_shear_kN=2900.0,
                            custom_sw_tonnes=1100.0, sw_mode="custom")
    return model, storm, calm, full, env_only, grav_only


def test_identity_and_scaling():
    model, storm, _, full, _, _ = _setup()
    r = sf.analyze(model, storm, full)
    one = sf.combine_results(model, [r], [1.0], fy=FY)
    np.testing.assert_allclose(np.asarray(one.U), np.asarray(r.U), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(one.von_mises),
                               np.asarray(r.von_mises), rtol=1e-9)
    two = sf.combine_results(model, [r], [2.0], fy=FY)
    # von Mises is a NORM of the member forces: scales linearly with one
    # factored state even though it is nonlinear across states
    np.testing.assert_allclose(np.asarray(two.von_mises),
                               2 * np.asarray(r.von_mises), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(two.U), 2 * np.asarray(r.U),
                               rtol=1e-12)


def test_superposition_matches_single_analysis():
    """environment-only + gravity-only at 1.0/1.0 == the full load state
    (FEM linearity; the calm-water wave contributes ~nothing)."""
    model, storm, calm, full, env_only, grav_only = _setup()
    r_full = sf.analyze(model, storm, full)
    r_env = sf.analyze(model, storm, env_only)
    r_grav = sf.analyze(model, calm, grav_only)
    comb = sf.combine_results(model, [r_env, r_grav], [1.0, 1.0], fy=FY)
    np.testing.assert_allclose(np.asarray(comb.U), np.asarray(r_full.U),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(comb.utilization),
                               np.asarray(r_full.utilization),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(comb.reactions),
                               np.asarray(r_full.reactions),
                               rtol=1e-8, atol=1e-4)


def test_combo_envelope():
    model, storm, calm, _, env_only, grav_only = _setup()
    actions = {"E": sf.analyze(model, storm, env_only),
               "G": sf.analyze(model, calm, grav_only)}
    combos = {"extreme_lrfd": {"G": 1.1, "E": 1.35},
              "operating": {"G": 1.3, "E": 0.9},
              "wsd": {"G": 1.0, "E": 1.0}}
    results, env = sf.combo_envelope(model, actions, combos, fy=FY)
    assert set(results) == set(combos)
    U = np.stack([np.asarray(results[c].utilization) for c in combos])
    np.testing.assert_allclose(np.asarray(env["member_envelope"]),
                               U.max(axis=0), rtol=1e-12)
    assert env["governing"] in combos
    gi = np.asarray(env["governing_combo"])
    np.testing.assert_allclose(U[gi, np.arange(U.shape[1])],
                               U.max(axis=0), rtol=1e-12)
    with pytest.raises(ValueError, match="unknown action"):
        sf.combo_envelope(model, actions, {"bad": {"X": 1.0}})
    with pytest.raises(ValueError, match="factors"):
        sf.combine_results(model, [actions["E"]], [1.0, 2.0])

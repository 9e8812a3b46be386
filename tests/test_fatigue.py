"""Deterministic fatigue screening: Miner-rule structure and scaling laws."""
import jax.numpy as jnp
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.fatigue import SN_CURVES, fatigue_screen


def test_scaling_laws():
    """Damage is linear in exposure/occurrence and scales with range^m."""
    vm = jnp.asarray(np.array([[10.0, 50.0], [30.0, 150.0]]))  # [S=2, M=2]
    f1 = fatigue_screen(vm, T_wave=10.0, exposure_years=1.0)
    f2 = fatigue_screen(vm, T_wave=10.0, exposure_years=2.0)
    np.testing.assert_allclose(np.asarray(f2.damage),
                               2 * np.asarray(f1.damage), rtol=1e-12)
    # member 2's range is 5x member 1's -> damage ratio 5^m (m = 3)
    d = np.asarray(f1.damage)
    np.testing.assert_allclose(d[1] / d[0], 5.0 ** 3, rtol=1e-9)
    # SCF enters the range directly
    f3 = fatigue_screen(vm, T_wave=10.0, exposure_years=1.0, scf=2.0)
    np.testing.assert_allclose(np.asarray(f3.damage), d * 8.0, rtol=1e-9)
    # zero range -> zero damage, infinite life
    f0 = fatigue_screen(jnp.zeros((4, 3)), T_wave=10.0, exposure_years=1.0)
    assert np.all(np.asarray(f0.damage) == 0.0)
    assert np.all(np.isinf(np.asarray(f0.life_years)))
    with pytest.raises(ValueError):
        fatigue_screen(vm, 10.0, 1.0, curve="nope")


def test_jacket_storm_screen():
    """Full-FEM phase scan -> per-member damage for the default storm: the
    governing members carry finite life; sheltered members effectively
    infinite."""
    coarse = sf.default_3leg_jacket()
    refined = sf.refine_model(coarse, 2)
    wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="fenton", N=12)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    scan = sf.phase_scan_condensed(coarse, refined, 2, wave, case, n_steps=24)
    scr = fatigue_screen(scan.von_mises, T_wave=9.4, exposure_years=25.0,
                         curve="D-sea-cp", scf=1.5)
    dmg = np.asarray(scr.damage)
    assert np.isfinite(dmg).all() and dmg.max() > 0
    # sanity: the largest stress RANGE governs, not the largest static stress
    S = np.asarray(scr.stress_range_mpa)
    assert np.argmax(dmg) == np.argmax(S)
    assert scr.n_cycles == pytest.approx(25.0 * 365.25 * 24 * 3600 / 9.4)


def test_per_member_scf_vector():
    """scf accepts a per-member vector (hot-spot workflow): damage scales
    by scf^m member-wise."""
    import jax.numpy as jnp

    from small_fem_solver_tpu.ops.fatigue import SN_CURVES, fatigue_screen

    S = jnp.array([[100.0, 50.0], [60.0, 20.0], [80.0, 35.0]])  # [S, M=2]
    base = fatigue_screen(S, 9.4, 25.0, curve="D", scf=1.0)
    scf = jnp.array([2.0, 3.0])
    hot = fatigue_screen(S, 9.4, 25.0, curve="D", scf=scf)
    m, _ = SN_CURVES["D"]
    np.testing.assert_allclose(np.asarray(hot.damage),
                               np.asarray(base.damage)
                               * np.array([2.0, 3.0]) ** m, rtol=1e-9)

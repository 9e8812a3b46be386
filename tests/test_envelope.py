"""Design-envelope tests: per-case critical phases, governing case,
consistency with individual phase batches, and mesh sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.api import analyze_phase_batch, design_envelope
from small_fem_solver_tpu.parallel.sweep import make_case_batch, make_wave_batch


def _cases(B):
    base = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    return make_case_batch(base, t_analysis=jnp.zeros(B))


def test_envelope_matches_individual_phase_batches():
    model = sf.default_3leg_jacket()
    Hs = [4.0, 9.0, 14.0]
    Ts = [8.0, 9.4, 11.0]
    waves = make_wave_batch(Hs, Ts, 50.0, U_c=1.7, model="stokes", N=5,
                            n_modes=8, dtype=jnp.float64)
    env = design_envelope(model, waves, _cases(3), n_steps=8)
    assert env.utilization.shape == (3, 8, 51)

    base = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    for c, (H, T) in enumerate(zip(Hs, Ts)):
        w = sf.stokes_wave(H, T, 50.0, 1.7, order=5, n_modes=8)
        ts, batch = analyze_phase_batch(model, w, base, n_steps=8,
                                        accel="analytic")
        # phase-batch path uses pointwise kinematics with clamp; envelope
        # uses separable (no clamp): equal to ~1e-6
        np.testing.assert_allclose(np.asarray(env.utilization[c]),
                                   np.asarray(batch.utilization),
                                   rtol=2e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(env.ts[c]), np.asarray(ts),
                                   rtol=1e-12)

    # governing case is the steepest wave
    assert int(env.governing_case) == int(np.argmax(env.max_util_per_case))
    np.testing.assert_allclose(np.asarray(env.member_envelope),
                               np.asarray(env.utilization).max((0, 1)),
                               rtol=1e-12)


def test_envelope_sharded_matches_unsharded():
    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("cases",))
    model = sf.default_3leg_jacket()
    B = 16
    Hs = np.linspace(3.0, 15.0, B)
    waves = make_wave_batch(Hs, 9.4, 50.0, U_c=1.7, model="stokes", N=5,
                            n_modes=8, dtype=jnp.float64)
    cases = _cases(B)
    env0 = design_envelope(model, waves, cases, n_steps=6)
    env1 = design_envelope(model, waves, cases, n_steps=6, mesh=mesh)
    np.testing.assert_allclose(np.asarray(env1.max_util_per_case),
                               np.asarray(env0.max_util_per_case), rtol=1e-10)
    assert int(env1.governing_case) == int(env0.governing_case)


def test_thousand_case_envelope_sharded():
    """The BASELINE.md 'design envelope' target: 1k (H, T, heading) cases
    as ONE vmapped + device-sharded batch, full FEM at every phase."""
    import dataclasses

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("cases",))
    model = sf.default_3leg_jacket()
    B = 1000
    Hs = np.linspace(2.0, 17.0, B)
    Ts = np.linspace(7.5, 11.0, B)
    dirs = np.linspace(0.0, 355.0, B)
    waves = make_wave_batch(Hs, Ts, 50.0, U_c=1.7, model="airy",
                            n_modes=4, dtype=jnp.float64)
    base = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    cases = make_case_batch(base, t_analysis=jnp.zeros(B),
                            wave_dir_deg=jnp.asarray(dirs),
                            current_dir_deg=jnp.asarray(dirs))
    env = design_envelope(model, waves, cases, n_steps=6, mesh=mesh)
    assert env.max_util_per_case.shape == (B,)
    util = np.asarray(env.max_util_per_case)
    assert np.isfinite(util).all() and (util > 0).all()
    # spot-check the governing case against a solo phase batch
    g = int(env.governing_case)
    wave_g = jax.tree.map(lambda x: x[g], waves)
    case_g = dataclasses.replace(base, wave_dir_deg=float(dirs[g]),
                                 current_dir_deg=float(dirs[g]))
    ts, batch = analyze_phase_batch(model, wave_g, case_g, n_steps=6,
                                    accel="analytic")
    # phase-batch is pointwise-with-clamp; envelope is separable: ~1e-6
    np.testing.assert_allclose(util[g],
                               float(np.asarray(batch.utilization).max()),
                               rtol=2e-5)
    # the envelope max must dominate every case
    assert np.all(util <= util[g] + 1e-12)


def test_condensed_envelope_matches_per_case_scans():
    from small_fem_solver_tpu.api import design_envelope_condensed, phase_scan_condensed
    coarse = sf.default_3leg_jacket()
    refined = sf.refine_model(coarse, 2)
    Hs = [4.0, 9.0, 14.0]
    waves = make_wave_batch(Hs, 9.4, 50.0, U_c=1.7, model="stokes", N=5,
                            n_modes=8, dtype=jnp.float64)
    base = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    cases = _cases(3)
    env = design_envelope_condensed(coarse, refined, 2, waves, cases,
                                    n_steps=6, solve_dtype=jnp.float64,
                                    case_batch=2)
    for c, H in enumerate(Hs):
        w = sf.stokes_wave(H, 9.4, 50.0, 1.7, order=5, n_modes=8)
        scan = phase_scan_condensed(coarse, refined, 2, w, base, n_steps=6)
        np.testing.assert_allclose(float(env.max_util_per_case[c]),
                                   float(scan.utilization.max()), rtol=1e-9)
    assert int(env.governing_case) == 2  # largest wave governs


def test_condensed_envelope_sharded_matches_unsharded():
    """design_envelope_condensed(mesh=...): the case axis partitions over
    the device mesh with bitwise-equal reductions."""
    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("cases",))
    coarse = sf.default_3leg_jacket()
    n_seg = 2
    refined = sf.refine_model(coarse, n_seg)
    B = 16
    Hs = np.linspace(3.0, 15.0, B)
    waves = make_wave_batch(Hs, 9.4, 50.0, U_c=1.7, model="stokes", N=5,
                            n_modes=8, dtype=jnp.float64)
    cases = _cases(B)
    env0 = sf.design_envelope_condensed(coarse, refined, n_seg, waves, cases,
                                        n_steps=6, solve_dtype=jnp.float64)
    env1 = sf.design_envelope_condensed(coarse, refined, n_seg, waves, cases,
                                        n_steps=6, solve_dtype=jnp.float64,
                                        mesh=mesh)
    np.testing.assert_allclose(np.asarray(env1.max_util_per_case),
                               np.asarray(env0.max_util_per_case),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(env1.member_envelope),
                               np.asarray(env0.member_envelope), rtol=1e-12)
    assert int(env1.governing_case) == int(env0.governing_case)


def test_envelope_rejects_varying_material():
    from small_fem_solver_tpu.api import design_envelope
    model = sf.default_3leg_jacket()
    waves = make_wave_batch([4.0, 8.0], 9.4, 50.0, model="stokes", N=5,
                            n_modes=8, dtype=jnp.float64)
    base = sf.LoadCase(custom_sw_tonnes=1100.0, sw_mode="custom")
    cases = make_case_batch(base, E=jnp.array([210000.0, 200000.0]),
                            t_analysis=jnp.zeros(2))
    with pytest.raises(ValueError):
        design_envelope(model, waves, cases, n_steps=2)


def test_condensed_scan_rejects_wrong_layout():
    from small_fem_solver_tpu.api import phase_scan_condensed
    coarse = sf.default_3leg_jacket()
    refined = sf.refine_model(coarse, 4)
    wave = sf.airy_wave(5.0, 9.4, 50.0)
    base = sf.LoadCase(custom_sw_tonnes=1100.0, sw_mode="custom")
    with pytest.raises(ValueError):
        phase_scan_condensed(coarse, refined, 3, wave, base, n_steps=2)


def test_thousand_case_fenton_envelope_sharded():
    """1k fully NONLINEAR stream-function cases: the wave setup is one
    vmapped float64 continuation-Newton (fenton_wave_batch), the envelope
    one sharded program — the reference solves raschii per case, serially
    (`JacketAnalysisGUI_v2.py:234-242`)."""
    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("cases",))
    model = sf.default_3leg_jacket()
    B = 1000
    Hs = np.linspace(2.0, 16.0, B)
    Ts = np.linspace(8.0, 11.0, B)
    waves = make_wave_batch(Hs, Ts, 50.0, U_c=1.7, model="fenton", N=8,
                            n_modes=8, dtype=jnp.float64)
    assert waves.E.shape == (B, 8)
    cases = _cases(B)
    env = design_envelope(model, waves, cases, n_steps=6, mesh=mesh)
    util = np.asarray(env.max_util_per_case)
    assert util.shape == (B,) and np.isfinite(util).all() and (util > 0).all()
    # spot-check one mid-batch case against its solo per-case wave + scan
    i = 617
    w = sf.make_wave(float(Hs[i]), float(Ts[i]), 50.0, U_c=1.7,
                     model="fenton", N=8, n_modes=8)
    base = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    ts, batch = analyze_phase_batch(model, w, base, n_steps=6,
                                    accel="analytic")
    np.testing.assert_allclose(util[i],
                               float(np.asarray(batch.utilization).max()),
                               rtol=2e-5)

"""Stokes 5th-order and Fenton stream-function validation.

No raschii oracle exists in this environment, so correctness is established
through physics invariants every irrotational steady wave must satisfy:

- kinematic free-surface BC:  w = d(eta)/dt + u d(eta)/dx  at z = eta
- dynamic free-surface BC:    (u-c)^2/2 + w^2/2 + g eta = const on z = eta
- order convergence: Stokes residuals shrink ~ steepness^order
- cross-model agreement: Fenton == Stokes-5 == Airy in their shared
  validity ranges
"""
import jax.numpy as jnp
import numpy as np
import pytest

from small_fem_solver_tpu.constants import G_GRAV
from small_fem_solver_tpu.ops.fenton import fenton_wave
from small_fem_solver_tpu.ops.stokes import stokes_wave
from small_fem_solver_tpu.ops.wave_models import make_wave, validate_wave
from small_fem_solver_tpu.ops.waves import _uw_raw, airy_wave, surface_elevation


def bc_residuals(wave, n=512):
    """(kinematic, dynamic) free-surface residuals, normalized."""
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    x = th / float(wave.k)
    eta = np.asarray(surface_elevation(wave, x, 0.0))
    u, w = _uw_raw(wave, jnp.asarray(x), jnp.asarray(eta), 0.0)
    u, w = np.asarray(u), np.asarray(w)
    j = np.arange(1, wave.E.shape[-1] + 1)
    E = np.asarray(wave.E)
    detadx = -(E * j * float(wave.k)) @ np.sin(np.outer(th, j).T)
    detadt = (E * j * float(wave.omega)) @ np.sin(np.outer(th, j).T)
    kin = np.abs(w - (detadt + u * detadx)).max() / max(np.abs(w).max(), 1e-12)
    c = float(wave.c)
    dyn = 0.5 * ((u - c) ** 2 + w**2) + G_GRAV * eta
    return kin, (dyn.max() - dyn.min()) / (0.5 * c * c)


def test_stokes_order1_equals_airy():
    w1 = stokes_wave(2.0, 9.0, 50.0, order=1)
    wa = airy_wave(2.0, 9.0, 50.0)
    np.testing.assert_allclose(float(w1.k), float(wa.k), rtol=1e-12)
    np.testing.assert_allclose(float(w1.E[0]), float(wa.E[0]), rtol=1e-12)
    np.testing.assert_allclose(float(w1.U[0]), float(wa.U[0]), rtol=1e-12)


def test_stokes_order_convergence():
    """Free-surface residual must drop monotonically with order."""
    kins = []
    for order in (1, 2, 3, 4, 5):
        kin, _ = bc_residuals(stokes_wave(4.0, 9.0, 50.0, order=order))
        kins.append(kin)
    assert all(kins[i + 1] < kins[i] * 0.5 for i in range(4)), kins
    assert kins[-1] < 1e-4


def test_stokes5_bc_residuals_moderate_wave():
    kin, dyn = bc_residuals(stokes_wave(8.0, 9.4, 50.0, order=5))
    assert kin < 2e-3
    assert dyn < 3e-4


def test_stokes_dispersion_amplitude_effect():
    """Nonlinear waves travel faster: k(stokes5) < k(airy) for same T."""
    ka = float(airy_wave(10.0, 9.4, 50.0).k)
    ks = float(stokes_wave(10.0, 9.4, 50.0, order=5).k)
    assert ks < ka


def test_fenton_machine_precision_mild_wave():
    kin, dyn = bc_residuals(fenton_wave(2.0, 9.0, 50.0, N=10))
    assert kin < 1e-9
    assert dyn < 1e-10


def test_fenton_agrees_with_stokes5_moderate():
    wf = fenton_wave(8.0, 9.4, 50.0, N=12)
    ws = stokes_wave(8.0, 9.4, 50.0, order=5)
    np.testing.assert_allclose(float(wf.k), float(ws.k), rtol=1e-4)
    np.testing.assert_allclose(float(wf.E[0]), float(ws.E[0]), rtol=1e-3)
    np.testing.assert_allclose(float(wf.U[0]), float(ws.U[0]), rtol=1e-3)


def test_fenton_steep_storm_wave():
    """The reference's default storm (steepness 0.11+) — Fenton territory."""
    wf = fenton_wave(17.038, 9.4, 50.0, N=18)
    kin, dyn = bc_residuals(wf)
    assert kin < 1e-3
    assert dyn < 1e-4
    # crest higher than trough magnitude (nonlinear asymmetry)
    th = np.linspace(0, 2 * np.pi, 256)
    eta = np.asarray(surface_elevation(wf, th / float(wf.k), 0.0))
    assert eta.max() > -eta.min()
    # height is preserved
    np.testing.assert_allclose(eta.max() - eta.min(), 17.038, rtol=1e-3)


def test_fenton_above_breaking_raises():
    with pytest.raises(ValueError):
        fenton_wave(40.0, 9.4, 50.0, N=10)  # H/L way beyond breaking


def test_auto_selection_matches_reference_thresholds():
    """Thresholds of `JacketAnalysisGUI_v2.py:215-237`."""
    w = make_wave(0.5, 9.4, 50.0, model="auto")      # steepness ~0.004
    assert w.model == "airy"
    w = make_wave(3.0, 9.4, 50.0, model="auto")      # ~0.022
    assert w.model == "stokes" and w.order == 3
    w = make_wave(7.0, 9.4, 50.0, model="auto")      # ~0.052
    assert w.model == "stokes" and w.order == 5
    w = make_wave(17.038, 9.4, 50.0, model="auto")   # ~0.126 -> fenton N=20
    assert w.model == "fenton"
    assert w.order == min(max(int(0.12590340181710952 * 200), 10), 20)


def test_validate_wave_limits():
    assert validate_wave(2.0, 9.4, 50.0) == []
    msgs = validate_wave(25.0, 9.4, 50.0)
    assert any("0.142" in m for m in msgs)
    with pytest.raises(ValueError):
        validate_wave(45.0, 12.0, 50.0, strict=True)


def test_stacked_wave_batch_evaluates():
    """Models padded to a common mode count stack into one batched pytree."""
    import jax
    waves = [make_wave(H, 9.4, 50.0, model="stokes", N=5, n_modes=8)
             for H in (2.0, 5.0, 8.0)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *waves)
    from small_fem_solver_tpu.ops.waves import kinematics

    def eval_one(w):
        return kinematics(w, 0.0, -10.0, 1.0).u

    us = jax.vmap(eval_one)(batch)
    for i, w in enumerate(waves):
        np.testing.assert_allclose(float(us[i]), float(kinematics(w, 0.0, -10.0, 1.0).u),
                                   rtol=1e-12)


def test_fenton_surface_matches_collocation_heights():
    """Regression: the DCT-I lowering must reproduce the solved collocation
    surface heights exactly (the j=M Nyquist coefficient takes a 1/2 weight;
    without it the surface was off by ~5 mm for the default storm)."""
    from small_fem_solver_tpu.ops.fenton import _solve_fenton
    for H, T, d, N in [(17.038, 9.4, 50.0, 10), (8.0, 9.4, 50.0, 12)]:
        q = _solve_fenton(jnp.float64(H), jnp.float64(T), jnp.float64(d), N)
        eta_m = np.asarray(q[: N + 1]) - d
        w = fenton_wave(H, T, d, N=N)
        theta = np.pi * np.arange(N + 1) / N
        eta_rec = np.asarray(surface_elevation(w, theta / float(w.k), 0.0))
        assert np.abs(eta_rec - eta_m).max() < 1e-10


def test_fenton_batch_matches_per_case():
    """ONE vmapped continuation-Newton over (H, T) == per-case host solves.

    Same algorithm, same float64 host solve — coefficients must agree to
    solver precision; the batch is just one compiled program."""
    from small_fem_solver_tpu.ops.fenton import fenton_wave_batch
    Hs = [4.0, 10.0, 17.038]
    Ts = [8.0, 9.4, 11.0]
    batch = fenton_wave_batch(Hs, Ts, 50.0, U_c=1.7, N=10, n_modes=12,
                              dtype=jnp.float64)
    assert batch.E.shape == (3, 12)
    for i, (H, T) in enumerate(zip(Hs, Ts)):
        w = fenton_wave(H, T, 50.0, U_c=1.7, N=10, n_modes=12)
        np.testing.assert_allclose(np.asarray(batch.E[i]), np.asarray(w.E),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(batch.U[i]), np.asarray(w.U),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(float(batch.k[i]), float(w.k), rtol=1e-12)
        np.testing.assert_allclose(float(batch.c[i]), float(w.c), rtol=1e-12)


def test_fenton_batch_per_case_depth_and_current():
    """d and U_c may vary per case."""
    from small_fem_solver_tpu.ops.fenton import fenton_wave_batch
    batch = fenton_wave_batch([6.0, 6.0], 9.4, [30.0, 60.0],
                              U_c=[0.5, 1.5], N=8, dtype=jnp.float64)
    # shallower water -> shorter wave (larger k) at the same period
    assert float(batch.k[0]) > float(batch.k[1])
    np.testing.assert_allclose(np.asarray(batch.U_c), [0.5, 1.5], rtol=1e-12)
    for i, d in enumerate([30.0, 60.0]):
        w = fenton_wave(6.0, 9.4, d, N=8)
        np.testing.assert_allclose(float(batch.k[i]), float(w.k), rtol=1e-12)


def test_fenton_batch_reports_nonconverged_cases():
    from small_fem_solver_tpu.ops.fenton import fenton_wave_batch
    with pytest.raises(ValueError, match="did not converge.*indices"):
        fenton_wave_batch([4.0, 40.0], 9.4, 50.0, N=10)  # case 1 breaks

"""Wave kinematics tests: dispersion, Airy parity vs reference goldens,
textbook profiles, dry/submerged masking, FD vs analytic acceleration."""
import jax.numpy as jnp
import numpy as np
import pytest

from small_fem_solver_tpu.constants import G_GRAV
from small_fem_solver_tpu.ops.dispersion import solve_dispersion
from small_fem_solver_tpu.ops.waves import airy_wave, kinematics, surface_elevation, velocity


def test_dispersion_satisfies_relation():
    for T, d in [(9.4, 50.0), (6.0, 20.0), (14.0, 300.0), (4.0, 8.0)]:
        omega = 2 * np.pi / T
        k = float(solve_dispersion(omega, d))
        np.testing.assert_allclose(omega**2, G_GRAV * k * np.tanh(k * d), rtol=1e-12)


def test_dispersion_deep_and_shallow_limits():
    # deep water: k -> omega^2/g
    omega = 2 * np.pi / 5.0
    k = float(solve_dispersion(omega, 2000.0))
    np.testing.assert_allclose(k, omega**2 / G_GRAV, rtol=1e-9)
    # shallow water: c -> sqrt(g d)
    omega = 2 * np.pi / 200.0
    d = 5.0
    k = float(solve_dispersion(omega, d))
    np.testing.assert_allclose(omega / k, np.sqrt(G_GRAV * d), rtol=1e-3)


def test_airy_matches_reference_goldens(golden_default):
    g = golden_default
    p = g["params"]
    wave = airy_wave(p["H"], p["T"], p["d"], p["U_c"])
    # reference Newton stops at |dk| < 1e-10 (`:203`), leaving ~1.6e-10
    # relative residual; our fixed-50-iteration Newton converges to machine
    # precision, so compare at 1e-9
    np.testing.assert_allclose(float(wave.k), g["wave"]["k"], rtol=1e-9)
    np.testing.assert_allclose(float(wave.omega), g["wave"]["omega"], rtol=1e-12)
    np.testing.assert_allclose(float(wave.length), g["wave"]["L"], rtol=1e-9)
    np.testing.assert_allclose(float(wave.c), g["wave"]["c"], rtol=1e-9)

    for pr in g["wave_probes"]:
        kin = kinematics(wave, pr["x"], pr["z"], pr["t"], accel="fd")
        np.testing.assert_allclose(float(kin.eta), pr["eta"], rtol=1e-9, atol=1e-12)
        assert bool(kin.submerged) == bool(pr["submerged"])
        np.testing.assert_allclose(float(kin.u), pr["u"], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(float(kin.w), pr["w"], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(float(kin.du_dt), pr["du_dt"], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(float(kin.dw_dt), pr["dw_dt"], rtol=1e-9, atol=1e-12)


def test_airy_textbook_profile():
    """u = a w cosh(k(z+d))/sinh(kd) cos(kx - wt) at mid-depth."""
    H, T, d = 4.0, 8.0, 30.0
    wave = airy_wave(H, T, d)
    k, w = float(wave.k), float(wave.omega)
    a = H / 2
    x, z, t = 7.0, -12.0, 1.3
    u_exp = a * w * np.cosh(k * (z + d)) / np.sinh(k * d) * np.cos(k * x - w * t)
    w_exp = a * w * np.sinh(k * (z + d)) / np.sinh(k * d) * np.sin(k * x - w * t)
    u, wv = velocity(wave, x, z, t)
    np.testing.assert_allclose(float(u), u_exp, rtol=1e-10)
    np.testing.assert_allclose(float(wv), w_exp, rtol=1e-10)


def test_dry_points_zero():
    wave = airy_wave(4.0, 8.0, 30.0, U_c=1.0)
    # crest elevation is a=2; z=3 is always dry
    kin = kinematics(wave, 0.0, 3.0, 0.0)
    assert not bool(kin.submerged)
    assert float(kin.u) == 0.0 and float(kin.w) == 0.0
    assert float(kin.du_dt) == 0.0 and float(kin.dw_dt) == 0.0


def test_current_added_to_u_only_when_submerged():
    wave = airy_wave(4.0, 8.0, 30.0, U_c=1.5)
    u, w = velocity(wave, 0.0, -10.0, 0.0)
    wave0 = airy_wave(4.0, 8.0, 30.0, U_c=0.0)
    u0, _ = velocity(wave0, 0.0, -10.0, 0.0)
    np.testing.assert_allclose(float(u) - float(u0), 1.5, rtol=1e-12)


def test_fd_vs_analytic_acceleration():
    wave = airy_wave(6.0, 9.0, 40.0, U_c=0.8)
    x = jnp.linspace(-20, 20, 7)
    z = jnp.linspace(-35, -1, 7)
    t = jnp.linspace(0, 9, 7)
    kfd = kinematics(wave, x, z, t, accel="fd")
    kan = kinematics(wave, x, z, t, accel="analytic")
    # FD with dt=1e-3 agrees with the exact derivative to O(dt)
    np.testing.assert_allclose(np.asarray(kfd.du_dt), np.asarray(kan.du_dt),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(kfd.dw_dt), np.asarray(kan.dw_dt),
                               rtol=0, atol=5e-3)


def test_batch_shapes():
    wave = airy_wave(6.0, 9.0, 40.0)
    x = jnp.zeros((5, 4))
    kin = kinematics(wave, x, x - 10.0, x + 1.0)
    assert kin.u.shape == (5, 4)
    assert kin.submerged.shape == (5, 4)


def test_eta_periodicity():
    wave = airy_wave(6.0, 9.0, 40.0)
    e0 = surface_elevation(wave, 1.0, 0.5)
    e1 = surface_elevation(wave, 1.0, 0.5 + 9.0)
    np.testing.assert_allclose(float(e0), float(e1), rtol=1e-9)


def test_apparent_period_doppler():
    """Wave-current apparent period: the current-modified dispersion
    (omega_a - kU)^2 = gk tanh(kd) is satisfied; following current
    lengthens T_app, opposing shortens; earth-frame celerity identity
    C_a = C_i + U; U = 0 is the identity."""
    import numpy as np

    from small_fem_solver_tpu.constants import G_GRAV
    from small_fem_solver_tpu.ops.dispersion import (apparent_period,
                                                     solve_dispersion)

    T, d = 9.4, 50.0
    assert float(apparent_period(T, d, 0.0)) == pytest.approx(T, rel=1e-12)
    for U in (1.7, -1.5):
        T_app = float(apparent_period(T, d, U))
        if U > 0:
            assert T_app > T
        else:
            assert T_app < T
        # the intrinsic wave satisfies plain dispersion at T_app...
        k = float(solve_dispersion(2 * np.pi / T_app, d))
        wi = 2 * np.pi / T_app
        assert wi**2 == pytest.approx(G_GRAV * k * np.tanh(k * d), rel=1e-10)
        # ...and the earth-frame frequency is recovered: omega_a = wi + kU
        assert wi + k * U == pytest.approx(2 * np.pi / T, rel=1e-10)


def test_cli_doppler_flag(capsys):
    from small_fem_solver_tpu.cli import main
    main(["run", "--doppler", "--t", "0.0"])
    err_out = capsys.readouterr()
    assert "[doppler] apparent period" in err_out.err

"""IFORM environmental contours: fit recovery on synthetic data, the
pure-Hs extreme identity, contour-to-envelope integration."""
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.metocean import (_phi, _phi_inv, fit_joint_hs_tp,
                                               fit_weibull, iform_contour)


def test_phi_inverse_roundtrip():
    p = np.array([1e-9, 1e-4, 0.1, 0.5, 0.9, 1 - 1e-6])
    np.testing.assert_allclose(_phi(_phi_inv(p)), p, rtol=1e-10)
    assert float(_phi_inv(np.array(0.5))) == pytest.approx(0.0, abs=1e-12)


def test_weibull_mle_recovers_parameters():
    rng = np.random.default_rng(7)
    k_true, lam_true = 1.6, 2.8
    x = lam_true * rng.weibull(k_true, size=40_000)
    k, lam = fit_weibull(x)
    assert k == pytest.approx(k_true, rel=0.02)
    assert lam == pytest.approx(lam_true, rel=0.02)


def _synthetic_climate(n=60_000, seed=3):
    """Hs ~ Weibull(1.5, 2.5); ln Tp | Hs ~ N(mu(h), 0.12),
    mu(h) = ln(5.5 + 1.4 sqrt(h))."""
    rng = np.random.default_rng(seed)
    hs = 2.5 * rng.weibull(1.5, size=n)
    mu = np.log(5.5 + 1.4 * np.sqrt(hs))
    tp = np.exp(mu + 0.12 * rng.standard_normal(n))
    return hs, tp


def test_joint_fit_and_contour_identity():
    hs, tp = _synthetic_climate()
    model = fit_joint_hs_tp(hs, tp, n_bins=10, state_hours=3.0)
    assert model.weibull_k == pytest.approx(1.5, rel=0.03)
    assert model.weibull_lam == pytest.approx(2.5, rel=0.03)
    # conditional medians recovered across the grid
    np.testing.assert_allclose(np.exp(model.mu_lnTp),
                               5.5 + 1.4 * np.sqrt(model.hs_grid), rtol=0.05)
    np.testing.assert_allclose(model.sigma_lnTp, 0.12, rtol=0.25)

    # IFORM identity: the theta = 0 contour point is the inverse Weibull
    # at the beta quantile (the pure-Hs N-year extreme)
    ret = 100.0
    ch, ct = iform_contour(model, ret, n_points=64)
    n_states = ret * 8766.0 / 3.0
    beta = float(_phi_inv(np.array(1.0 - 1.0 / n_states)))
    hs_max_exact = model.weibull_lam * (
        -np.log1p(-float(_phi(np.array(beta))))) ** (1.0 / model.weibull_k)
    assert ch.max() == pytest.approx(hs_max_exact, rel=1e-10)
    # contour is finite and physically ordered: Tp grows with Hs medianly
    assert np.isfinite(ch).all() and np.isfinite(ct).all()
    assert (ct > 0).all()
    # longer return period pushes the contour out
    ch2, _ = iform_contour(model, 10.0, n_points=64)
    assert ch2.max() < ch.max()


def test_contour_feeds_envelope():
    """The N-year contour drives the existing sharded envelope machinery:
    the governing response comes from a contour sea state."""
    from small_fem_solver_tpu.parallel.sweep import (make_case_batch,
                                                     make_wave_batch)

    hs, tp = _synthetic_climate(n=20_000)
    # scale the synthetic site up to storm waves for a meaningful response
    model_jt = fit_joint_hs_tp(4.0 * hs, tp + 4.0, n_bins=8)
    ch, ct = sf.n_year_sea_states(model_jt, 100.0, n_points=8)
    jacket = sf.default_3leg_jacket()
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    waves = make_wave_batch(np.clip(ch, 0.05, 0.75 * 50.0), ct, 50.0,
                            U_c=1.7, model="airy")
    cases = make_case_batch(case, t_analysis=np.zeros(len(ch)))
    env = sf.design_envelope(jacket, waves, cases, n_steps=8)
    util = np.asarray(env.max_util_per_case)
    assert np.isfinite(util).all() and util.max() > 0
    # the governing state should be a high-Hs contour point
    assert float(ch[int(env.governing_case)]) > np.median(ch)


def test_cli_contour(capsys, tmp_path):
    import json

    from small_fem_solver_tpu.cli import main

    hs, tp = _synthetic_climate(n=500, seed=1)
    f = tmp_path / "scatter.json"
    f.write_text(json.dumps(np.stack([hs, tp], axis=1).tolist()))
    main(["contour", "--scatter", str(f), "--return-years", "50",
          "--points", "6"])
    out = capsys.readouterr().out
    assert "Weibull" in out and "IFORM contour" in out

"""FORM reliability: exact linear/parabolic design points, the FORM-IFORM
consistency identity, and a full-pipeline environmental reliability run."""
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.metocean import (_phi, fit_joint_hs_tp,
                                               return_period_beta)
from small_fem_solver_tpu.ops.reliability import form


def test_form_linear_limit_state_exact():
    """g(u) = b - a.u has beta = b/|a| and alpha = a/|a| exactly."""
    a = np.array([3.0, 4.0])
    b = 10.0
    res = form(lambda u: b - a @ u, 2)
    assert res.converged
    assert res.beta == pytest.approx(b / 5.0, rel=1e-8)
    np.testing.assert_allclose(res.alpha, a / 5.0, rtol=1e-8)
    np.testing.assert_allclose(res.u_star, res.beta * res.alpha, atol=1e-6)
    assert res.pf == pytest.approx(float(_phi(np.array(-2.0))), rel=1e-8)


def test_form_negative_beta_when_origin_fails():
    """Median point already failed -> beta < 0, pf > 0.5."""
    res = form(lambda u: -1.0 - u[0], 2)
    assert res.converged
    assert res.beta == pytest.approx(-1.0, abs=1e-6)
    assert res.pf > 0.5


def test_form_parabolic_limit_state():
    """Der Kiureghian's classic g = 0.1(u1-u2)^2 - (u1+u2)/sqrt(2) + 2.5:
    design point at u* = (2.5/sqrt(2))(1,1), beta = 2.5."""

    def g(u):
        return 0.1 * (u[0] - u[1]) ** 2 - (u[0] + u[1]) / np.sqrt(2.0) + 2.5

    res = form(g, 2, u0=np.array([1.0, 0.0]))
    assert res.converged
    assert res.beta == pytest.approx(2.5, rel=1e-5)
    np.testing.assert_allclose(res.u_star, 2.5 / np.sqrt(2.0) * np.ones(2),
                               rtol=1e-4)


def test_form_analytic_gradient_matches_fd():
    a = np.array([1.0, -2.0, 0.5])

    def g(u):
        return 4.0 - a @ u - 0.05 * float(u @ u)

    def grad(u):
        return -a - 0.1 * u

    r_fd = form(g, 3)
    r_an = form(g, 3, grad=grad)
    assert r_fd.converged and r_an.converged
    assert r_an.beta == pytest.approx(r_fd.beta, rel=1e-6)
    assert r_an.n_evals < r_fd.n_evals  # gradient closure saves the FD calls


def _parabola(u):
    """g = 0.2 w^2 + 2.5 - v in rotated coords; beta = 2.5, and the exact
    pf = E_w[Phi(-(2.5 + 0.2 w^2))] is a 1-D Gaussian integral."""
    return 0.1 * (u[0] - u[1]) ** 2 - (u[0] + u[1]) / np.sqrt(2.0) + 2.5


def _parabola_exact_pf():
    w = np.linspace(-8.0, 8.0, 4001)
    pdf = np.exp(-0.5 * w * w) / np.sqrt(2.0 * np.pi)
    return float(np.trapezoid(pdf * _phi(-(2.5 + 0.2 * w * w)), w))


def test_sorm_breitung_exact_on_parabola():
    """Principal curvature of the parabolic surface is 0.4 at the design
    point, so Breitung gives pf = Phi(-2.5)/sqrt(1 + 2.5 * 0.4) exactly."""
    res = form(_parabola, 2, u0=np.array([1.0, 0.0]), tol=1e-8)
    assert res.converged
    pf2 = sf.sorm_correction(_parabola, res, fd_step=1e-3)
    assert pf2 == pytest.approx(res.pf / np.sqrt(2.0), rel=1e-5)
    # Breitung (asymptotic) lands within ~5% of the exact integral here;
    # FORM is ~47% high
    exact = _parabola_exact_pf()
    assert pf2 == pytest.approx(exact, rel=0.05)
    assert abs(res.pf - exact) / exact > 0.3


def test_importance_sampling_validates_form():
    """Design-point-centered IS is unbiased for any surface shape: exact
    on the linear state, and on the parabola it reproduces the exact
    Gaussian integral (which plain FORM misses by ~40%)."""
    a = np.array([3.0, 4.0])
    lin = lambda u: 10.0 - a @ u  # noqa: E731
    res = form(lin, 2)
    pf, cov = sf.importance_sample(lin, res, n_samples=4000, seed=1)
    assert cov < 0.1
    assert pf == pytest.approx(res.pf, rel=3.5 * cov)

    resp = form(_parabola, 2, u0=np.array([1.0, 0.0]), tol=1e-8)
    pfp, covp = sf.importance_sample(_parabola, resp, n_samples=8000, seed=2)
    exact = _parabola_exact_pf()
    assert covp < 0.1
    assert pfp == pytest.approx(exact, rel=3.5 * covp)


def _climate_joint(seed=3, scale=2.0):
    rng = np.random.default_rng(seed)
    hs = 2.5 * rng.weibull(1.5, size=30_000)
    mu = np.log(5.5 + 1.4 * np.sqrt(hs))
    tp = np.exp(mu + 0.12 * rng.standard_normal(hs.size))
    return fit_joint_hs_tp(scale * hs, tp + scale, n_bins=8, state_hours=3.0)


def test_form_iform_consistency():
    """A monotone-in-Hs response with threshold at the N-year Hs quantile
    must give beta == the IFORM return-period beta and design point on the
    pure-Hs axis — FORM and IFORM share one Rosenblatt transform."""
    joint = _climate_joint()
    beta_n = return_period_beta(joint, 100.0)
    hs_n, _ = sf.rosenblatt_hs_tp(joint, beta_n, 0.0)

    rel = sf.environmental_reliability(lambda hs, tp: hs**2, joint,
                                       threshold=float(hs_n) ** 2)
    assert rel.form.converged
    assert rel.form.beta == pytest.approx(beta_n, rel=1e-4)
    assert rel.hs_star == pytest.approx(float(hs_n), rel=1e-4)
    assert abs(rel.form.alpha[0]) == pytest.approx(1.0, abs=1e-3)
    assert rel.return_years == pytest.approx(100.0, rel=1e-3)
    # annualized probability of the 100-year event ~ 1/100 per year
    assert rel.pf_annual == pytest.approx(1.0 / 100.0, rel=0.02)


def test_environmental_reliability_full_pipeline():
    """FORM through the real analysis: converges to a design storm whose
    response sits on the threshold, with Hs carrying most of the risk."""
    joint = _climate_joint()
    model = sf.default_3leg_jacket()
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    response = sf.utilization_response(model, case, d=50.0, U_c=1.7,
                                       wave_model="airy", n_steps=8)
    # threshold between the 1-year and 100-year response -> moderate beta
    b1 = return_period_beta(joint, 1.0)
    hs1, tp1 = sf.rosenblatt_hs_tp(joint, b1, 0.0)
    r1 = response(float(hs1), float(tp1))
    b100 = return_period_beta(joint, 100.0)
    hs100, tp100 = sf.rosenblatt_hs_tp(joint, b100, 0.0)
    r100 = response(float(hs100), float(tp100))
    assert r100 > r1  # bigger storms govern
    thr = 0.5 * (r1 + r100)

    rel = sf.environmental_reliability(response, joint, thr, max_iter=25)
    assert rel.form.converged
    assert b1 * 0.5 < rel.form.beta < b100 * 1.5
    assert 0.0 < rel.pf_state < 0.5
    # the design point reproduces the threshold (g* ~ 0 at the 5e-3
    # limit-state tolerance, absolute: the g scale is max(1, |g(0)|) = 1)
    assert response(rel.hs_star, rel.tp_star) == pytest.approx(thr, abs=7e-3)
    # wave height dominates the direction of failure
    assert abs(rel.form.alpha[0]) > abs(rel.form.alpha[1])
    # sane physical design point inside the climate's support
    assert 0.0 < rel.hs_star < 0.75 * 50.0
    assert rel.tp_star > 0.0

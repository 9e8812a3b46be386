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


def test_importance_sample_overflow_and_guards():
    """Samples far opposite u* carry log-weights that would overflow if
    exponentiated before the failure mask; the estimate must stay finite.
    n_samples < 2 is rejected (cov uses ddof=1)."""
    a = np.array([30.0, 40.0])        # steep state -> |u*| = 20, huge logw
    lin = lambda u: 1000.0 - a @ u  # noqa: E731
    res = form(lin, 2)
    with np.errstate(over="raise"):   # any overflow becomes an error
        pf, cov = sf.importance_sample(lin, res, n_samples=300, seed=11)
        pf_b, _ = sf.importance_sample_batch(lambda U: 1000.0 - U @ a, res,
                                             n_samples=300, seed=11)
    assert np.isfinite(pf) and np.isfinite(pf_b)
    assert pf_b == pytest.approx(pf, rel=1e-14)
    with pytest.raises(ValueError, match="n_samples"):
        sf.importance_sample(lin, res, n_samples=1)
    with pytest.raises(ValueError, match="n_samples"):
        sf.importance_sample_batch(lambda U: 1000.0 - U @ a, res, n_samples=1)


def test_importance_sample_batch_identity():
    """Batched IS draws the exact same samples as the scalar loop (same
    seed) and returns the identical estimate."""
    a = np.array([3.0, 4.0])
    lin = lambda u: 10.0 - a @ u  # noqa: E731
    res = form(lin, 2)
    pf_s, cov_s = sf.importance_sample(lin, res, n_samples=500, seed=7)
    g_batch = lambda U: 10.0 - U @ a  # noqa: E731
    pf_b, cov_b = sf.importance_sample_batch(g_batch, res, n_samples=500,
                                             seed=7)
    assert pf_b == pytest.approx(pf_s, rel=1e-14)
    assert cov_b == pytest.approx(cov_s, rel=1e-14)


def test_utilization_response_batch_matches_scalar():
    """The one-program envelope response equals the per-point phase-scan
    response, and the whole Monte-Carlo batch shards over a device mesh."""
    import jax
    from jax.sharding import Mesh

    model = sf.default_3leg_jacket()
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    scalar = sf.utilization_response(model, case, d=50.0, U_c=1.7,
                                     wave_model="airy", n_steps=8)
    batch = sf.utilization_response_batch(model, case, d=50.0, U_c=1.7,
                                          wave_model="airy", n_steps=8)
    hs = np.array([6.0, 12.0, 20.0])
    tp = np.array([9.0, 11.0, 13.0])
    got = batch(hs, tp)
    want = np.array([scalar(h, t) for h, t in zip(hs, tp)])
    np.testing.assert_allclose(got, want, rtol=1e-9)

    # sharded Monte-Carlo check: 16 samples over the 8-device cases mesh
    joint = _climate_joint()
    resp_sh = sf.utilization_response_batch(
        model, case, d=50.0, U_c=1.7, wave_model="airy", n_steps=8,
        mesh=Mesh(np.array(jax.devices()), ("cases",)))
    res = form(sf.hs_tp_limit_state(scalar, joint, 0.3)[0], 2,
               u0=np.array([1.0, 0.0]), tol=5e-3, fd_step=0.05)
    g_sh = sf.hs_tp_limit_state_batch(resp_sh, joint, 0.3)
    g_un = sf.hs_tp_limit_state_batch(
        sf.utilization_response_batch(model, case, d=50.0, U_c=1.7,
                                      wave_model="airy", n_steps=8),
        joint, 0.3)
    pf_sh, _ = sf.importance_sample_batch(g_sh, res, n_samples=16, seed=3)
    pf_un, _ = sf.importance_sample_batch(g_un, res, n_samples=16, seed=3)
    assert pf_sh == pytest.approx(pf_un, rel=1e-9)


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


def test_bivariate_normal_cdf_identities():
    from small_fem_solver_tpu.ops.reliability import bivariate_normal_cdf

    # independence, comonotonicity, antithetic limits
    assert bivariate_normal_cdf(-1.2, -0.8, 0.0) == pytest.approx(
        float(_phi(np.array(-1.2)) * _phi(np.array(-0.8))), abs=1e-8)
    assert bivariate_normal_cdf(-1.2, -0.8, 1.0) == pytest.approx(
        float(_phi(np.array(-1.2))), abs=1e-12)
    assert bivariate_normal_cdf(0.5, 0.7, -1.0) == pytest.approx(
        float(_phi(np.array(0.5)) + _phi(np.array(0.7)) - 1.0), abs=1e-12)
    # symmetry in (a, b)
    assert bivariate_normal_cdf(-1.0, -2.0, 0.6) == pytest.approx(
        bivariate_normal_cdf(-2.0, -1.0, 0.6), abs=1e-8)
    # Monte-Carlo cross-check
    rng = np.random.default_rng(5)
    x = rng.standard_normal(2_000_000)
    y = 0.5 * x + np.sqrt(1 - 0.25) * rng.standard_normal(2_000_000)
    mc = float(np.mean((x <= -1.2) & (y <= -0.8)))
    assert bivariate_normal_cdf(-1.2, -0.8, 0.5) == pytest.approx(mc,
                                                                  abs=4e-4)


def test_ditlevsen_bounds_exact_cases():
    # single component: both bounds equal its pf
    one = sf.ditlevsen_bounds([2.0], [[1.0, 0.0]])
    p2 = float(_phi(np.array(-2.0)))
    assert one.p_lower == pytest.approx(p2, rel=1e-12)
    assert one.p_upper == pytest.approx(p2, rel=1e-12)
    # two INDEPENDENT components: bounds are exact, p1 + p2 - p1 p2
    two = sf.ditlevsen_bounds([2.0, 2.5], [[1.0, 0.0], [0.0, 1.0]])
    p25 = float(_phi(np.array(-2.5)))
    exact = p2 + p25 - p2 * p25
    assert two.p_lower == pytest.approx(exact, rel=1e-5)
    assert two.p_upper == pytest.approx(exact, rel=1e-5)
    # two IDENTICAL components: the series system IS one component
    same = sf.ditlevsen_bounds([2.0, 2.0], [[1.0, 0.0], [1.0, 0.0]])
    assert same.p_lower == pytest.approx(p2, rel=1e-6)
    assert same.p_upper == pytest.approx(p2, rel=1e-6)
    # infinite-beta components are dropped
    drop = sf.ditlevsen_bounds([2.0, np.inf], [[1.0, 0.0], [0.0, 1.0]])
    assert drop.p_lower == pytest.approx(p2, rel=1e-12)


def test_member_reliability_pipeline():
    """All-member component FORM in a few envelope programs; the governing
    member agrees with the system-level (max-utilization) FORM, and the
    Ditlevsen bounds bracket sensibly."""
    joint = _climate_joint()
    model = sf.default_3leg_jacket()
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    thr = 0.3
    resp_m = sf.member_utilization_response_batch(model, case, d=50.0,
                                                  U_c=1.7,
                                                  wave_model="airy",
                                                  n_steps=8)
    mr = sf.member_reliability(resp_m, joint, thr)
    assert mr.reachable.any() and (~mr.reachable).any()
    assert mr.converged[mr.reachable].all()
    assert mr.n_envelopes < 45  # ~2 programs/iteration, not 51 searches

    # system-level FORM on the max-utilization response
    scalar = sf.utilization_response(model, case, d=50.0, U_c=1.7,
                                     wave_model="airy", n_steps=8)
    sys_form = form(sf.hs_tp_limit_state(scalar, joint, thr)[0], 2,
                    u0=np.array([1.0, 0.0]), tol=5e-3, fd_step=0.05)
    b_min = float(mr.beta.min())
    # the governing member IS the max-utilization limit state near the
    # design point: betas agree to a few percent
    assert sys_form.beta == pytest.approx(b_min, rel=0.05)
    # bounds: ordered, above the governing component, below the sum
    sysb = mr.system
    assert sysb.p_lower <= sysb.p_upper
    assert sysb.p_lower >= float(np.max(mr.pf)) * (1 - 1e-9)
    assert sysb.p_upper <= float(mr.pf.sum()) + 1e-12
    # per-member design storms are physical
    r = mr.reachable
    assert (mr.hs_star[r] > 0).all() and (mr.tp_star[r] > 0).all()


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

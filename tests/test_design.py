"""Differentiable design: end-to-end gradients and gradient-based sizing."""
import jax
import jax.numpy as jnp
import numpy as np

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.design import (optimize_sections,
                                             section_sensitivities)


def _setup():
    model = sf.default_3leg_jacket()
    wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="stokes", N=5)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom",
                       t_analysis=0.34)
    return model, wave, case


def test_section_gradients_match_finite_differences():
    """reverse-mode d(max utilization)/d(section params) through the WHOLE
    pipeline (wave kinematics -> Morison -> FEM -> von Mises) matches
    central finite differences."""
    model, wave, case = _setup()
    s = section_sensitivities(model, wave, case)
    assert np.isfinite(np.asarray(s.dutil)).all()
    assert np.isfinite(np.asarray(s.dmass_t)).all()

    def util(leg, brace):
        m2 = sf.default_3leg_jacket(leg_section=leg, brace_section=brace)
        r = sf.analyze(m2, wave, case, solver="chol", accel="analytic")
        return float(r.utilization.max())

    h = 1e-3
    fd_tl = (util((2000.0, 75.0 + h), (800.0, 30.0))
             - util((2000.0, 75.0 - h), (800.0, 30.0))) / (2 * h)
    fd_tb = (util((2000.0, 75.0), (800.0, 30.0 + h))
             - util((2000.0, 75.0), (800.0, 30.0 - h))) / (2 * h)
    np.testing.assert_allclose(float(s.dutil[1]), fd_tl, rtol=1e-6)
    np.testing.assert_allclose(float(s.dutil[3]), fd_tb, rtol=1e-6)
    # mass gradient: d(mass)/dt has a closed form for an annulus
    # dA/dt = pi (D - 2 t); members of that section sum over their lengths
    L = np.asarray(model.member_geometry()[3])
    sid = np.asarray(model.sect_id)
    for idx, (D, t, s_id) in ((1, (2000.0, 75.0, 0)), (3, (800.0, 30.0, 1))):
        dA_dt = np.pi * (D - 2 * t)                   # mm^2 per mm
        expect = dA_dt / 1e6 * 7850.0 * L[sid == s_id].sum() / 1000.0
        np.testing.assert_allclose(float(s.dmass_t[idx]), expect, rtol=1e-9)


def test_optimize_sections_hits_target():
    """Projected gradient sizing reaches the target utilization with a
    large mass saving from the (overdesigned) default sections."""
    model, wave, case = _setup()
    opt = optimize_sections(model, wave, case, target_util=0.5, n_iter=80)
    assert 0.40 < float(opt.util_max) < 0.60
    assert float(opt.mass_t) < 0.7 * 1261.0       # >30% mass saved
    # thin-wall validity maintained by the projection
    assert float(opt.t_leg) >= 10.0
    assert 2000.0 / float(opt.t_leg) > 10.0
    assert 800.0 / float(opt.t_brace) > 10.0


def _three_section_model():
    """Default jacket re-bound to THREE section groups: legs, horizontal
    braces, X-braces (the generalized layout the 2-section GUI default
    cannot express)."""
    import dataclasses

    model = sf.default_3leg_jacket()
    sid = np.array([{"leg": 0, "h_brace": 1}.get(t, 2)
                    for t in model.member_types], dtype=np.int32)
    sections = sf.tube_sections(jnp.asarray([2000.0, 800.0, 900.0]),
                                jnp.asarray([75.0, 30.0, 35.0]), 7850.0)
    return dataclasses.replace(model, sections=sections,
                               sect_id=jnp.asarray(sid))


def test_sensitivities_three_sections():
    """The interleaved (D_i, t_i) gradient vector scales to any section
    count; spot-check the t gradients against finite differences."""
    import dataclasses
    model = _three_section_model()
    _, wave, case = _setup()
    s = section_sensitivities(model, wave, case)
    assert s.dutil.shape == (6,)
    assert np.isfinite(np.asarray(s.dutil)).all()

    def util(ts):
        m2 = dataclasses.replace(
            model, sections=sf.tube_sections(model.sections.D_outer,
                                             jnp.asarray(ts), 7850.0))
        r = sf.analyze(m2, wave, case, solver="chol", accel="analytic")
        return float(r.utilization.max())

    h = 1e-3
    for i in range(3):
        tp = np.array([75.0, 30.0, 35.0]); tp[i] += h
        tm = np.array([75.0, 30.0, 35.0]); tm[i] -= h
        fd = (util(tp) - util(tm)) / (2 * h)
        np.testing.assert_allclose(float(s.dutil[2 * i + 1]), fd, rtol=1e-5,
                                   atol=1e-9)


def test_optimize_three_sections():
    """Gradient sizing over a >=3-group thickness vector reaches the target
    utilization and respects the D/t > 10 projection per group."""
    model = _three_section_model()
    _, wave, case = _setup()
    opt = optimize_sections(model, wave, case, target_util=0.5, n_iter=50)
    assert opt.t.shape == (3,)
    assert 0.40 < float(opt.util_max) < 0.60
    t = np.asarray(opt.t)
    D = np.asarray(model.sections.D_outer)
    assert (t >= 10.0).all() and (D / t > 10.0).all()
    assert opt.history.shape == (50, 5)

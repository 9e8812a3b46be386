"""VIV susceptibility screen: hand-checked frequency, onset gating, CLI.

The reference excludes VIV (its Info tab). Verification: the first-mode
frequency of a single tube span against the closed-form beam formula with
hand-assembled effective mass; reduced velocity and stability parameter by
hand; onset/suppression gates; dry members never flag; current profiles.
"""
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.models.model import build_model
from small_fem_solver_tpu.ops.viv import (KS_SUPPRESS_CROSSFLOW,
                                          KS_SUPPRESS_INLINE, viv_screen)


def _span(z=-20.0, L=30.0, D=800.0, t=30.0):
    nodes = {"A": (0.0, 0.0, z), "B": (L, 0.0, z)}
    members = [{"name": "M", "node1": "A", "node2": "B", "type": "brace"}]
    return build_model(nodes, members, ["A"], ["B"],
                       leg_section=(2000.0, 75.0), brace_section=(D, t))


def test_frequency_hand_check_fixed_and_pinned():
    L, D, t = 30.0, 0.8, 0.03
    model = _span(L=L, D=D * 1000, t=t * 1000)
    rho_w, Ca = 1025.0, 1.0
    scr = viv_screen(model, U_c=0.5, d=50.0, rho_water=rho_w, Ca=Ca)

    A = np.pi / 4 * (D**2 - (D - 2 * t) ** 2)          # m^2
    I = np.pi / 64 * (D**4 - (D - 2 * t) ** 4)         # m^4
    EI = 210e9 * I                                     # N m^2
    m_e = A * 7850.0 + Ca * rho_w * np.pi * D**2 / 4
    f_hand = 4.730040744862704**2 / (2 * np.pi * L**2) * np.sqrt(EI / m_e)
    np.testing.assert_allclose(float(scr.f_n_hz[0]), f_hand, rtol=1e-10)
    np.testing.assert_allclose(float(scr.m_e_kg_m[0]), m_e, rtol=1e-10)

    scr_p = viv_screen(model, U_c=0.5, d=50.0, end_fixity="pinned")
    np.testing.assert_allclose(float(scr_p.f_n_hz[0]) / float(scr.f_n_hz[0]),
                               np.pi**2 / 4.730040744862704**2, rtol=1e-10)


def test_reduced_velocity_and_ks_hand_check():
    model = _span(L=30.0)
    U, zeta = 1.2, 0.02
    scr = viv_screen(model, U_c=U, d=50.0, zeta=zeta)
    Vr_hand = U / (float(scr.f_n_hz[0]) * 0.8)
    np.testing.assert_allclose(float(scr.V_r[0]), Vr_hand, rtol=1e-12)
    Ks_hand = 2 * float(scr.m_e_kg_m[0]) * 2 * np.pi * zeta / (1025.0 * 0.8**2)
    np.testing.assert_allclose(float(scr.K_s[0]), Ks_hand, rtol=1e-12)
    np.testing.assert_allclose(float(scr.uc_inline[0]), Vr_hand, rtol=1e-12)
    np.testing.assert_allclose(float(scr.uc_crossflow[0]), Vr_hand / 3.5,
                               rtol=1e-12)


def test_onset_flags_and_suppression():
    # long slender span in strong current -> crossflow onset
    model = _span(L=45.0, D=500.0, t=20.0)
    hot = viv_screen(model, U_c=2.5, d=50.0, zeta=0.005)
    assert float(hot.V_r[0]) > 3.5
    assert hot.flags[0] == "both"
    # heavy damping suppresses in-line first, then cross-flow
    assert float(hot.K_s[0]) < KS_SUPPRESS_INLINE
    damped = viv_screen(model, U_c=2.5, d=50.0, zeta=0.2)
    assert float(damped.K_s[0]) > KS_SUPPRESS_INLINE
    assert float(damped.uc_inline[0]) == 0.0
    very_damped = viv_screen(model, U_c=2.5, d=50.0, zeta=2.0)
    assert float(very_damped.K_s[0]) > KS_SUPPRESS_CROSSFLOW
    assert very_damped.flags[0] == "ok"
    # calm current -> ok
    calm = viv_screen(model, U_c=0.1, d=50.0)
    assert calm.flags[0] == "ok"


def test_dry_member_never_flags():
    model = _span(z=+10.0, L=45.0, D=500.0, t=20.0)
    scr = viv_screen(model, U_c=3.0, d=50.0)
    assert not bool(scr.submerged[0])
    assert float(scr.U_ms[0]) == 0.0
    assert scr.flags[0] == "ok"
    # added mass absent when dry: f_n higher than the wet span
    wet = viv_screen(_span(z=-10.0, L=45.0, D=500.0, t=20.0), U_c=3.0, d=50.0)
    assert float(scr.f_n_hz[0]) > float(wet.f_n_hz[0])


def test_flooded_and_profile_and_growth():
    model = _span(z=-40.0)
    base = viv_screen(model, U_c=1.0, d=50.0)
    flooded = viv_screen(model, U_c=1.0, d=50.0, flooded="all")
    assert float(flooded.m_e_kg_m[0]) > float(base.m_e_kg_m[0])
    assert float(flooded.f_n_hz[0]) < float(base.f_n_hz[0])
    # legs-only flooding leaves this brace dry inside
    legs = viv_screen(model, U_c=1.0, d=50.0, flooded="legs")
    np.testing.assert_allclose(float(legs.m_e_kg_m[0]),
                               float(base.m_e_kg_m[0]), rtol=1e-12)
    # power-law profile reduces U at depth: z=-40, d=50 -> (10/50)^(1/7)
    prof = viv_screen(model, U_c=1.0, d=50.0, current_alpha=1.0 / 7.0)
    np.testing.assert_allclose(float(prof.U_ms[0]), (10.0 / 50.0) ** (1 / 7),
                               rtol=1e-12)
    # marine growth raises D (lower Vr denominator effect) and added mass
    grown = viv_screen(model, U_c=1.0, d=50.0, marine_growth_mm=100.0)
    assert float(grown.m_e_kg_m[0]) > float(base.m_e_kg_m[0])


def test_default_jacket_screen_and_validation():
    model = sf.default_3leg_jacket()
    scr = sf.viv_screen(model, U_c=1.7, d=50.0)
    assert scr.f_n_hz.shape[0] == model.n_members
    assert np.all(np.asarray(scr.f_n_hz) > 0)
    # the stocky default jacket members are far from onset
    assert np.all(np.maximum(np.asarray(scr.uc_inline),
                             np.asarray(scr.uc_crossflow)) < 1.0)
    with pytest.raises(ValueError, match="end_fixity"):
        viv_screen(model, U_c=1.0, d=50.0, end_fixity="welded")
    with pytest.raises(ValueError, match="flooded"):
        viv_screen(model, U_c=1.0, d=50.0, flooded="yes")


def test_cli_viv(capsys):
    from small_fem_solver_tpu.cli import main
    main(["viv", "--Uc", "1.7", "--zeta", "0.01"])
    out = capsys.readouterr().out
    assert "VIV screen" in out
    assert "f_n[Hz]" in out

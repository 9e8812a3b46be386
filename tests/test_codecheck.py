"""API RP 2A-WSD member strength checks.

Verification: allowable-stress formulas transcribed independently from the
standard's text (hand-computed anchor values in comments), a pure-axial
column whose unity check reduces to fa/Fa exactly, a tension member, and
behavioral checks on the storm-loaded jacket.
"""
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.codecheck import (allowable_bending,
                                                allowable_compression,
                                                allowable_tension,
                                                local_buckling_fxc,
                                                member_code_check)


def test_allowable_stresses_hand_values():
    Fy, E = 355.0, 210000.0
    # Ft = 0.6 Fy
    np.testing.assert_allclose(float(allowable_tension(Fy)), 213.0)

    # bending ranges (SI): limits 10340/355 = 29.13, 20680/355 = 58.25
    np.testing.assert_allclose(float(allowable_bending(Fy, E, 26.667)),
                               0.75 * 355.0)
    fb50 = (0.84 - 1.74 * 355.0 * 50.0 / E) * 355.0       # = 245.99...
    np.testing.assert_allclose(float(allowable_bending(Fy, E, 50.0)), fb50,
                               rtol=1e-12)
    fb80 = (0.72 - 0.58 * 355.0 * 80.0 / E) * 355.0
    np.testing.assert_allclose(float(allowable_bending(Fy, E, 80.0)), fb80,
                               rtol=1e-12)

    # column curve: Cc = sqrt(2 pi^2 E / Fy) = 108.06
    Cc = np.sqrt(2 * np.pi**2 * E / Fy)
    lam = 60.0
    r = lam / Cc
    fa_hand = (1 - 0.5 * r**2) * Fy / (5 / 3 + 3 * r / 8 - r**3 / 8)
    np.testing.assert_allclose(
        float(allowable_compression(Fy, E, lam, 26.7)), fa_hand, rtol=1e-12)
    # elastic branch
    lam = 150.0
    fa_el = 12 * np.pi**2 * E / (23 * lam**2)
    np.testing.assert_allclose(
        float(allowable_compression(Fy, E, lam, 26.7)), fa_el, rtol=1e-12)

    # local buckling kicks in above D/t = 60
    assert float(local_buckling_fxc(Fy, E, 40.0)) == 355.0
    fxc80 = 355.0 * (1.64 - 0.23 * 80.0**0.25)
    np.testing.assert_allclose(float(local_buckling_fxc(Fy, E, 80.0)),
                               min(fxc80, 2 * 0.3 * E / 80.0), rtol=1e-12)
    # Fxc never exceeds Fy
    assert float(local_buckling_fxc(Fy, E, 61.0)) <= 355.0


def _column_model(load_kN, L=20.0):
    from small_fem_solver_tpu.models.model import build_model
    nodes = {"B": (0.0, 0.0, 60.0), "T": (0.0, 0.0, 60.0 + L)}  # dry column
    members = [{"name": "COL", "node1": "B", "node2": "T", "type": "leg"}]
    model = build_model(nodes, members, ["B"], ["T"],
                        leg_section=(800.0, 30.0))
    wave = sf.airy_wave(2.0, 9.4, 50.0)
    case = sf.LoadCase(F_axial_kN=load_kN, sw_mode="none")
    res = sf.analyze(model, wave, case, solver="chol", accel="analytic")
    return model, res


def test_pure_axial_column_uc():
    """A dry, axially loaded column: fb = 0 so UC = fa/Fa exactly (the
    simple-sum branch; fa is well above 0.15 Fa here uses the pair)."""
    model, res = _column_model(load_kN=8000.0, L=20.0)
    chk = member_code_check(model, res)
    A = float(model.sections.Ax[0])
    fa = 8000e3 / A
    np.testing.assert_allclose(float(chk.fa_mpa[0]), fa, rtol=1e-9)
    assert float(chk.fb_mpa[0]) < 1e-9
    r_gyr = float(np.sqrt(model.sections.Iy[0] / model.sections.Ax[0]))
    lam = 1.0 * 20000.0 / r_gyr
    Fa = float(allowable_compression(355.0, 210000.0, lam, 800.0 / 30.0))
    np.testing.assert_allclose(float(chk.KL_over_r[0]), lam, rtol=1e-9)
    np.testing.assert_allclose(float(chk.uc[0]), fa / Fa, rtol=1e-9)
    assert chk.governing[0] in ("stability", "yield")

    # tension: pull UP -> UC = ft/Ft
    model, res = _column_model(load_kN=-8000.0, L=20.0)
    chk = member_code_check(model, res)
    np.testing.assert_allclose(float(chk.uc[0]), fa / 213.0, rtol=1e-9)
    assert chk.governing[0] == "tension"


def test_jacket_code_check_storm():
    """Storm-loaded jacket: finite positive unity checks everywhere; the
    code UC dominates the bare von Mises utilization (allowables carry
    safety factors); brace/leg K factors are respected."""
    model = sf.default_3leg_jacket()
    wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="stokes", N=5)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom",
                       t_analysis=0.34)
    res = sf.analyze(model, wave, case, solver="chol")
    chk = member_code_check(model, res)
    uc = np.asarray(chk.uc)
    assert np.isfinite(uc).all() and (uc >= 0).all()
    assert np.count_nonzero(uc > 1e-6) > 45      # (a member can idle at
    # a phase where its force passes through zero)
    # WSD allowables are ~0.6 Fy, so the governing code UC must exceed the
    # yield-normalized utilization for the governing member
    assert uc.max() > float(res.utilization.max())
    # member-type effective lengths: K L / r uses K=1.0 for legs, 0.8 braces
    types = np.asarray([1.0 if ty == "leg" else 0.8
                        for ty in model.member_types])
    r_gyr = np.sqrt(np.asarray(model.sections.Iy)[np.asarray(model.sect_id)]
                    / np.asarray(model.sections.Ax)[np.asarray(model.sect_id)])
    expect = types * np.asarray(res.length_m) * 1000.0 / r_gyr
    np.testing.assert_allclose(np.asarray(chk.KL_over_r), expect, rtol=1e-9)
    assert set(chk.governing) <= {"tension", "stability", "yield"}

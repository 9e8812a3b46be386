"""Relative-velocity Morison drag (hydrodynamic damping) in the transient
solver: quadratic-damping decay signature, stiff-limit equivalence,
resonant-response reduction."""
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.models.model import build_model
from small_fem_solver_tpu.ops.dynamics import (modal_analysis,
                                               transient_response_condensed)


def _submerged_column(L=40.0, D=1200.0, t=30.0):
    """Vertical cantilever fully under water: clamp at z=-45, tip at z=-5."""
    nodes = {"BOT": (0.0, 0.0, -45.0), "TOP": (0.0, 0.0, -45.0 + L)}
    members = [{"name": "col", "node1": "BOT", "node2": "TOP", "type": "leg"}]
    return build_model(nodes, members, ["BOT"], ["TOP"],
                       leg_section=(D, t), brace_section=(D, t))


def _peaks(x):
    """Successive positive peak amplitudes of a decaying oscillation."""
    x = np.asarray(x)
    idx = np.where((x[1:-1] > x[:-2]) & (x[1:-1] > x[2:]) & (x[1:-1] > 0))[0]
    return x[idx + 1]


def test_still_water_decay_is_quadratic():
    """Free decay in still water under relative drag shows the HYPERBOLIC
    amplitude decay of quadratic damping (1/X_n linear in cycle number),
    clearly distinguished from linear (Rayleigh) damping's exponential
    decay (ln X_n linear)."""
    model = _submerged_column()
    n_seg = 6
    refined = sf.refine_model(model, n_seg)
    case = sf.LoadCase(sw_mode="none", Cd=1.0, Cm=2.0, F_shear_kN=300.0,
                       t_analysis=0.0)
    calm = sf.airy_wave(1e-9, 8.0, 50.0)
    topside = 200.0
    static = sf.analyze_condensed(model, refined, n_seg, calm, case)
    modal = modal_analysis(model, n_modes=1, topside_mass_t=topside,
                           added_mass_Ca=1.0)
    T1 = float(modal.periods_s[0])
    dt = T1 / 64.0
    n_steps = int(10 * T1 / dt)
    res = transient_response_condensed(
        model, refined, n_seg, None, case, dt, n_steps,
        damping_ratio=0.0, topside_mass_t=topside, added_mass_Ca=1.0,
        zero_loads=True, u0=np.asarray(static.U), relative_drag=True)
    # default wave heading 0 deg -> theta = 90 - 0: the shear acts along +y
    tip_y = 6 * model.node_index("TOP") + 1
    hist = np.asarray(res.U_time[:, tip_y])
    peaks = _peaks(hist)
    assert len(peaks) >= 6
    peaks = peaks[:8]
    assert np.all(np.diff(peaks) < 0)                 # decays monotonically
    n = np.arange(len(peaks))

    def r2(y):
        c = np.polyfit(n, y, 1)
        resid = y - np.polyval(c, n)
        return 1.0 - np.sum(resid**2) / np.sum((y - y.mean())**2)

    r2_hyper = r2(1.0 / peaks)    # quadratic damping: 1/X linear
    r2_exp = r2(np.log(peaks))    # linear damping: ln X linear
    assert r2_hyper > 0.999
    assert r2_hyper > r2_exp
    # hyperbolic decay increments are amplitude-INDEPENDENT (constant)
    inc = np.diff(1.0 / peaks)
    assert inc.std() / inc.mean() < 0.15


def test_stiff_limit_matches_standard_drag():
    """When the structure barely moves (|v| << |U_wave|), the relative
    formulation reduces to the standard precomputed drag."""
    model = sf.default_3leg_jacket()
    n_seg = 2
    refined = sf.refine_model(model, n_seg)
    wave = sf.airy_wave(8.0, 9.4, 50.0, 1.0)
    case = sf.LoadCase(wave_dir_deg=0.0, current_dir_deg=0.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    kw = dict(dt=9.4 / 48, n_steps=3 * 48, damping_ratio=0.02,
              topside_mass_t=1100.0, ramp_periods=1.0)
    std = transient_response_condensed(model, refined, n_seg, wave, case,
                                       **kw)
    rel = transient_response_condensed(model, refined, n_seg, wave, case,
                                       relative_drag=True, **kw)
    a = np.asarray(std.tip_displacement_mm)
    b = np.asarray(rel.tip_displacement_mm)
    scale = np.abs(a).max()
    assert np.abs(a - b).max() / scale < 0.02
    # corrector pass refines, but stays near the lagged solution
    rel2 = transient_response_condensed(model, refined, n_seg, wave, case,
                                        relative_drag=True,
                                        drag_iterations=2, **kw)
    assert np.abs(np.asarray(rel2.tip_displacement_mm) - b).max() / scale \
        < 0.01


def test_resonant_response_reduced_by_drag_damping():
    """Driving a soft submerged column AT its natural period: relative
    drag caps the resonant growth that the Rayleigh-undamped standard
    formulation lets run (the physical mechanism compliant structures
    rely on)."""
    model = _submerged_column()
    n_seg = 4
    refined = sf.refine_model(model, n_seg)
    topside = 200.0
    modal = modal_analysis(model, n_modes=1, topside_mass_t=topside,
                           added_mass_Ca=1.0)
    T1 = float(modal.periods_s[0])
    wave = sf.airy_wave(4.0, T1, 50.0)
    case = sf.LoadCase(sw_mode="none", Cd=1.0, Cm=2.0)
    kw = dict(dt=T1 / 48, n_steps=12 * 48, damping_ratio=0.0,
              topside_mass_t=topside, added_mass_Ca=1.0, ramp_periods=2.0)
    std = transient_response_condensed(model, refined, n_seg, wave, case,
                                       **kw)
    rel = transient_response_condensed(model, refined, n_seg, wave, case,
                                       relative_drag=True, **kw)
    peak_std = float(np.abs(np.asarray(std.tip_displacement_mm)).max())
    peak_rel = float(np.abs(np.asarray(rel.tip_displacement_mm)).max())
    assert peak_rel < 0.8 * peak_std


def test_cli_transient(capsys):
    from small_fem_solver_tpu.cli import main
    main(["transient", "--refine", "2", "--periods", "2",
          "--relative-drag"])
    out = capsys.readouterr().out
    assert "relative-velocity drag" in out
    assert "peak utilization" in out
    main(["transient", "--refine", "2", "--periods", "2",
          "--spectrum", "jonswap", "--hs", "6", "--tp", "9",
          "--components", "24"])
    out = capsys.readouterr().out
    assert "irregular sea: JONSWAP" in out


def test_spread_sea_rejected():
    model = sf.default_3leg_jacket()
    refined = sf.refine_model(model, 2)
    sea = sf.make_random_sea(6.0, 9.0, 50.0, 32, seed=0, spreading_s=4.0)
    case = sf.LoadCase(sw_mode="none")
    with pytest.raises(ValueError, match="long-crested"):
        transient_response_condensed(model, refined, 2, sea, case,
                                     dt=0.2, n_steps=8, relative_drag=True)

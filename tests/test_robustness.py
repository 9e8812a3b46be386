"""Member-removal (ALS damage) screen: criticality on a near-determinate
frame, full-jacket redundancy, batched-vs-sequential equivalence."""
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.models.model import build_model
from small_fem_solver_tpu.ops.robustness import member_removal_screen


def _v_frame():
    """Pinned V bars + TWO keeper columns (one redundant)."""
    h, b = 6.0, 4.0
    nodes = {"L": (-b, 0.0, 0.0), "R": (b, 0.0, 0.0),
             "K1": (-0.5, 0.0, 0.0), "K2": (0.5, 0.0, 0.0),
             "TOP": (0.0, 0.0, h)}
    members = [
        {"name": "bl", "node1": "L", "node2": "TOP", "type": "brace",
         "release": "pinned"},
        {"name": "br", "node1": "R", "node2": "TOP", "type": "brace",
         "release": "pinned"},
        {"name": "k1", "node1": "K1", "node2": "TOP", "type": "leg"},
        {"name": "k2", "node1": "K2", "node2": "TOP", "type": "leg"},
    ]
    return build_model(nodes, members, ["L", "R", "K1", "K2"], ["TOP"],
                       leg_section=(60.0, 2.0), brace_section=(400.0, 20.0))


def test_v_frame_bar_is_critical():
    """Losing a V bar dumps the lateral load on the feather keepers: the
    damaged state yields (critical); losing ONE keeper is benign (the
    other still stabilizes the apex rotations)."""
    model = _v_frame()
    wave = sf.airy_wave(1e-9, 9.4, 50.0)
    case = sf.LoadCase(sw_mode="none", F_shear_kN=3000.0, wave_dir_deg=90.0,
                       current_dir_deg=90.0, t_analysis=0.0)
    scr = member_removal_screen(model, wave, case)
    crit = np.asarray(scr.critical)
    assert bool(crit[0]) and bool(crit[1])     # each V bar is critical
    assert not bool(crit[2]) and not bool(crit[3])   # keepers redundant
    assert np.asarray(scr.stable)[2:].all()
    # intact state is elastic
    assert float(scr.intact_util) < 1.0


def test_jacket_removal_screen():
    """Every single-member loss on the braced jacket stays stable at the
    design storm; the screen matches a sequential re-analysis."""
    model = sf.default_3leg_jacket()
    wave = sf.airy_wave(17.038, 9.4, 50.0, 1.7)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    scr = member_removal_screen(model, wave, case)
    stable = np.asarray(scr.stable)
    util = np.asarray(scr.max_util)
    crit = np.asarray(scr.critical)
    assert stable.all()
    assert np.isfinite(util).all()
    # the braced panels are damage-tolerant: losing any BRACE keeps the
    # jacket elastic; losing a LOWER LEG SEGMENT is catastrophic (util ~8,
    # the screen's whole point) and must be flagged critical
    braces = np.array([t != "leg" for t in model.member_types])
    assert util[braces].max() < 1.0
    assert not crit[braces].any()
    legs = ~braces
    assert crit[legs].any()
    assert util[legs].max() > 5.0
    # some member losses must RAISE the governing utilization
    assert util.max() > float(scr.intact_util)
    # governing member is never the removed one
    gov = np.asarray(scr.governing_member)
    assert np.all(gov != np.arange(model.n_members))

    # spot-check one damaged state against an explicit rebuilt model
    m_drop = int(np.argmax(util))
    conn = np.asarray(model.conn)
    members = [{"name": model.member_names[e],
                "node1": model.node_names[conn[e, 0]],
                "node2": model.node_names[conn[e, 1]],
                "type": model.member_types[e]}
               for e in range(model.n_members) if e != m_drop]
    nodes = {n: tuple(np.asarray(model.coords)[i])
             for i, n in enumerate(model.node_names)}
    damaged = build_model(nodes, members, model.fixed_node_names(),
                          model.top_node_names())
    res = sf.analyze(damaged, wave, case)
    # same loads except the dropped member's hydro share (screen keeps it,
    # documented conservative): compare within that wave-load difference
    np.testing.assert_allclose(util[m_drop],
                               float(res.utilization.max()),
                               rtol=0.05)

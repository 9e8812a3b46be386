"""Still-water buoyancy loading (beyond the reference's Morison+weight).

Verification: hand-computed uplift and centroid on canonical members
(fully submerged horizontal, surface-piercing vertical, dry), sealed vs
flooded displaced areas, global equilibrium through the reaction delta,
and dense-vs-condensed distribution parity on a refined mesh.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.api import _member_buoyancy, phase_scan_condensed
from small_fem_solver_tpu.constants import G_GRAV


def _two_node(z1, z2, D=800.0, t=40.0, typ="leg"):
    from small_fem_solver_tpu.models.model import build_model
    nodes = {"A": (0.0, 0.0, z1), "B": (10.0, 0.0, z2)}
    members = [{"name": "M", "node1": "A", "node2": "B", "type": typ}]
    return build_model(nodes, members, ["A"], ["B"], leg_section=(D, t),
                       brace_section=(400.0, 20.0))


def _helper(model, mode, rho=1025.0):
    c1 = model.coords[model.conn[:, 0]]
    c2 = model.coords[model.conn[:, 1]]
    L_m = jnp.linalg.norm(c2 - c1, axis=-1)
    return _member_buoyancy(model.coords, model.conn, model.sections,
                            model.sect_id, model.member_types, rho, mode,
                            L_m)


def test_fully_submerged_horizontal_sealed():
    model = _two_node(-10.0, -10.0)
    F_b, c = _helper(model, "sealed")
    L = 10.0
    hand = 1025.0 * G_GRAV * np.pi * 0.8**2 / 4.0 * L
    np.testing.assert_allclose(float(F_b[0]), hand, rtol=1e-6)
    np.testing.assert_allclose(float(c[0]), 0.5, atol=1e-12)


def test_dry_member_zero():
    model = _two_node(5.0, 15.0)
    F_b, _ = _helper(model, "sealed")
    assert float(F_b[0]) == 0.0


def test_surface_piercing_vertical():
    """Member from z=-30 (node A) to z=+10: wet fraction 0.75, centroid at
    0.375 from the submerged end."""
    from small_fem_solver_tpu.models.model import build_model
    nodes = {"A": (0.0, 0.0, -30.0), "B": (0.0, 0.0, 10.0)}
    members = [{"name": "M", "node1": "A", "node2": "B", "type": "leg"}]
    model = build_model(nodes, members, ["A"], ["B"],
                        leg_section=(800.0, 40.0))
    F_b, c = _helper(model, "sealed")
    hand = 1025.0 * G_GRAV * np.pi * 0.8**2 / 4.0 * 40.0 * 0.75
    np.testing.assert_allclose(float(F_b[0]), hand, rtol=1e-6)
    np.testing.assert_allclose(float(c[0]), 0.375, rtol=1e-6)
    # flipped orientation: same force, mirrored centroid
    members = [{"name": "M", "node1": "B", "node2": "A", "type": "leg"}]
    model2 = build_model(nodes, members, ["B"], ["A"],
                         leg_section=(800.0, 40.0))
    F_b2, c2 = _helper(model2, "sealed")
    np.testing.assert_allclose(float(F_b2[0]), hand, rtol=1e-6)
    np.testing.assert_allclose(float(c2[0]), 0.625, rtol=1e-6)


def test_flooded_vs_sealed_area():
    """Flooded members displace only the steel annulus."""
    model = _two_node(-10.0, -10.0, D=800.0, t=40.0)
    F_s, _ = _helper(model, "sealed")
    F_f, _ = _helper(model, "flooded")
    A_steel = np.pi / 4.0 * (0.8**2 - (0.8 - 2 * 0.04)**2)
    np.testing.assert_allclose(float(F_f[0]),
                               1025.0 * G_GRAV * A_steel * 10.0, rtol=1e-6)
    assert float(F_f[0]) < 0.5 * float(F_s[0])


def test_legs_flooded_mixes_by_type():
    from small_fem_solver_tpu.models.model import build_model
    nodes = {"A": (0.0, 0.0, -10.0), "B": (10.0, 0.0, -10.0),
             "C": (20.0, 0.0, -10.0)}
    members = [{"name": "L", "node1": "A", "node2": "B", "type": "leg"},
               {"name": "BR", "node1": "B", "node2": "C", "type": "brace"}]
    model = build_model(nodes, members, ["A"], ["C"],
                        leg_section=(800.0, 40.0),
                        brace_section=(400.0, 20.0))
    F_m, _ = _helper(model, "legs-flooded")
    F_s, _ = _helper(model, "sealed")
    F_f, _ = _helper(model, "flooded")
    np.testing.assert_allclose(float(F_m[0]), float(F_f[0]), rtol=1e-12)
    np.testing.assert_allclose(float(F_m[1]), float(F_s[1]), rtol=1e-12)


def test_invalid_mode_raises():
    model = _two_node(-10.0, -10.0)
    with pytest.raises(ValueError):
        _helper(model, "submarine")
    wave = sf.airy_wave(1.0, 9.4, 50.0)
    with pytest.raises(ValueError):
        sf.analyze(model, wave, sf.LoadCase(sw_mode="none",
                                            buoyancy="submarine"),
                   solver="chol", accel="analytic")


def test_equilibrium_reaction_delta():
    """Adding buoyancy changes the vertical reaction by exactly the total
    uplift (global equilibrium; Morison/topside loads cancel in the diff)."""
    model = sf.default_3leg_jacket()
    wave = sf.airy_wave(9.5, 9.4, 50.0)
    base = sf.LoadCase(wave_dir_deg=38.0, F_axial_kN=25100.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    res0 = sf.analyze(model, wave, base, solver="chol")
    for mode in ("sealed", "flooded", "legs-flooded"):
        res1 = sf.analyze(model, wave,
                          sf.LoadCase(wave_dir_deg=38.0, F_axial_kN=25100.0,
                                      custom_sw_tonnes=1100.0,
                                      sw_mode="custom", buoyancy=mode),
                          solver="chol")
        c1 = model.coords[model.conn[:, 0]]
        c2 = model.coords[model.conn[:, 1]]
        L_m = jnp.linalg.norm(c2 - c1, axis=-1)
        F_b, _ = _member_buoyancy(model.coords, model.conn, model.sections,
                                  model.sect_id, model.member_types,
                                  1025.0, mode, L_m)
        B = float(jnp.sum(F_b))
        assert B > 1e5  # several hundred kN of uplift on the wet jacket
        dz = float(res1.total_reaction[2] - res0.total_reaction[2])
        np.testing.assert_allclose(dz, -B, rtol=1e-6)
        # uplift reduces compressive support load and shifts utilization
        assert not np.allclose(np.asarray(res1.utilization),
                               np.asarray(res0.utilization))


def test_condensed_matches_dense_with_buoyancy():
    """The refined-mesh buoyancy distribution agrees between the dense and
    condensed paths to solver precision."""
    coarse = sf.default_3leg_jacket()
    n_seg = 3
    refined = sf.refine_model(coarse, n_seg)
    wave = sf.airy_wave(2.0, 9.4, 50.0)
    case = sf.LoadCase(sw_mode="calculated", buoyancy="legs-flooded")
    scan = phase_scan_condensed(coarse, refined, n_seg, wave, case,
                                n_steps=2, accel="fd",
                                kinematics="pointwise")
    ref = sf.analyze(refined, wave,
                     sf.LoadCase(sw_mode="calculated",
                                 buoyancy="legs-flooded", t_analysis=0.0),
                     solver="chol")
    U_ref = np.asarray(ref.U)
    np.testing.assert_allclose(np.asarray(scan.U[0]), U_ref, rtol=1e-8,
                               atol=1e-8 * np.abs(U_ref).max())
    np.testing.assert_allclose(np.asarray(scan.reactions[0]),
                               np.asarray(ref.reactions), rtol=1e-7,
                               atol=1e-7 * np.abs(np.asarray(
                                   ref.reactions)).max())

"""Member end releases (pinned connections): condensation exactness,
closed-form frame checks, refined-chain consistency, buckling projection."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.models.model import build_model
from small_fem_solver_tpu.ops.beams import (apply_releases, local_stiffness,
                                            release_transform)
from small_fem_solver_tpu.ops.sections import tube_sections

E, NU = 210000.0, 0.3
G = E / (2 * (1 + NU))


def _still_case(**kw):
    return sf.LoadCase(sw_mode="none", t_analysis=0.0, **kw)


def _tiny_wave():
    return sf.airy_wave(1e-9, 9.4, 50.0)


def test_condensation_matches_schur_complement():
    """apply_releases == the partitioned Schur complement, with exactly
    zero released rows/cols; pinned-both keeps only axial + torsion."""
    sec = tube_sections(800.0, 30.0)
    K = local_stiffness(jnp.array([12000.0]), sec, jnp.zeros(1, jnp.int32),
                        E, G)
    Kn = np.asarray(K[0])
    for code, rel in [(1, [4, 5]), (2, [10, 11]), (3, [4, 5, 10, 11])]:
        Kc = np.asarray(apply_releases(K, jnp.array([code]))[0])
        keep = [i for i in range(12) if i not in rel]
        exact = (Kn[np.ix_(keep, keep)]
                 - Kn[np.ix_(keep, rel)] @ np.linalg.solve(
                     Kn[np.ix_(rel, rel)], Kn[np.ix_(rel, keep)]))
        np.testing.assert_allclose(Kc[np.ix_(keep, keep)], exact,
                                   rtol=1e-12, atol=1e-6)
        assert np.abs(Kc[rel]).max() == 0.0
        assert np.abs(Kc[:, rel]).max() == 0.0
    K3 = np.asarray(apply_releases(K, jnp.array([3]))[0])
    nz = sorted(set(np.where(np.abs(K3) > 1e-6)[0]))
    assert nz == [0, 3, 6, 9]  # axial + torsion only
    # W reproduces K_c as a congruence and is idempotent on kept vectors
    W = np.asarray(release_transform(K, jnp.array([3]))[0])
    np.testing.assert_allclose(W @ W, W, atol=1e-9)


def _propped_cantilever(release_strut="pinned"):
    """Horizontal cantilever A->B with a vertical strut C->B under the tip."""
    L1, L2 = 10.0, 8.0
    nodes = {"A": (0.0, 0.0, 10.0), "B": (L1, 0.0, 10.0),
             "C": (L1, 0.0, 10.0 - L2)}
    members = [{"name": "cant", "node1": "A", "node2": "B", "type": "leg"},
               {"name": "strut", "node1": "C", "node2": "B",
                "type": "brace", "release": release_strut}]
    return build_model(nodes, members, ["A", "C"], ["B"],
                       leg_section=(900.0, 40.0), brace_section=(400.0, 12.0))


def test_propped_cantilever_closed_form():
    """Tip deflection = P / (k_cantilever + k_strut): the pinned-both strut
    acts as a pure axial spring EA/L."""
    model = _propped_cantilever()
    case = _still_case(F_axial_kN=1000.0)  # 1000 kN down at B
    res = sf.analyze(model, _tiny_wave(), case)
    sec = model.sections
    # cantilever (leg section): Timoshenko tip stiffness, N/mm
    L1, L2 = 10000.0, 8000.0
    I = float(sec.Iy[0]); A_s = float(sec.Az[0])
    k_c = 1.0 / (L1**3 / (3 * E * I) + L1 / (G * A_s))
    k_s = E * float(sec.Ax[1]) / L2
    expected = 1000e3 / (k_c + k_s)
    b = model.node_index("B")
    np.testing.assert_allclose(-float(res.U[6 * b + 2]), expected, rtol=1e-6)
    # the strut end moments vanish; its axial force = k_s/(k_c+k_s) share
    np.testing.assert_allclose(np.asarray(res.F1_local[1, 4:6]), 0.0,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.F2_local[1, 4:6]), 0.0,
                               atol=1e-4)
    np.testing.assert_allclose(float(res.F1_local[1, 0]),
                               -1000e3 * k_s / (k_c + k_s), rtol=1e-6)
    # equilibrium unaffected by releases
    np.testing.assert_allclose(float(res.total_reaction[2]), 1000e3,
                               rtol=1e-9)


def _pinned_jacket():
    """Default jacket with every horizontal brace pinned at both ends."""
    model = sf.default_3leg_jacket()
    members = [{"name": model.member_names[e],
                "node1": model.node_names[np.asarray(model.conn)[e, 0]],
                "node2": model.node_names[np.asarray(model.conn)[e, 1]],
                "type": model.member_types[e],
                "release": ("pinned" if model.member_types[e] == "h_brace"
                            else "none")}
               for e in range(model.n_members)]
    nodes = {n: tuple(np.asarray(model.coords)[i])
             for i, n in enumerate(model.node_names)}
    pinned = build_model(nodes, members, model.fixed_node_names(),
                         model.top_node_names())
    wave = sf.airy_wave(17.038, 9.4, 50.0, 1.7)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    return model, pinned, wave, case


def test_pinned_hbraces_on_default_jacket():
    """Pinning the horizontal braces frees their end moments and softens
    the structure; every load path stays consistent."""
    model, pinned, wave, case = _pinned_jacket()
    rigid = sf.analyze(model, wave, case)
    rel = sf.analyze(pinned, wave, case)
    hb = [e for e in range(model.n_members)
          if model.member_types[e] == "h_brace"]
    assert np.abs(np.asarray(rel.F1_local)[hb][:, 4:6]).max() < 1e-3
    assert np.abs(np.asarray(rel.F2_local)[hb][:, 4:6]).max() < 1e-3
    # rigid braces DO carry end moments in the same state
    assert np.abs(np.asarray(rigid.F1_local)[hb][:, 4:6]).max() > 1e3
    assert float(rel.max_displacement_mm) >= float(rigid.max_displacement_mm)
    # global force equilibrium is release-invariant (moment SUMS are not:
    # the reaction distribution among the supports shifts)
    np.testing.assert_allclose(np.asarray(rel.total_reaction)[:3],
                               np.asarray(rigid.total_reaction)[:3],
                               rtol=1e-9)
    # modal analysis with releases: well-posed, softer first mode
    mr = sf.modal_analysis(model, n_modes=3, topside_mass_t=1100.0)
    mp = sf.modal_analysis(pinned, n_modes=3, topside_mass_t=1100.0)
    assert float(mp.frequencies_hz[0]) <= float(mr.frequencies_hz[0]) + 1e-9
    assert float(mp.frequencies_hz[0]) > 0.1


def test_refined_condensed_matches_dense_with_releases():
    """refine_model propagates end releases to the end segments and the
    chain condensation reproduces the dense refined solution exactly."""
    _, pinned, wave, case = _pinned_jacket()
    n_seg = 4
    refined = sf.refine_model(pinned, n_seg)
    rel = np.asarray(refined.release).reshape(pinned.n_members, n_seg)
    rel0 = np.asarray(pinned.release)
    np.testing.assert_array_equal(rel[:, 0], rel0 & 1)
    np.testing.assert_array_equal(rel[:, -1], rel0 & 2)
    assert (rel[:, 1:-1] == 0).all()
    # accel="analytic" on both: analyze defaults to the reference's finite
    # difference while the condensed path defaults to the analytic fast path
    dense = sf.analyze(refined, wave, case, accel="analytic")
    cond = sf.analyze_condensed(pinned, refined, n_seg, wave, case)
    np.testing.assert_allclose(np.asarray(cond.U), np.asarray(dense.U),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(cond.utilization),
                               np.asarray(dense.utilization),
                               rtol=1e-7, atol=1e-12)


def test_validation_and_json_roundtrip(tmp_path):
    with pytest.raises(ValueError, match="ONLY pinned"):
        build_model({"A": (0, 0, 0), "B": (10, 0, 0)},
                    [{"name": "m", "node1": "A", "node2": "B",
                      "release": "pinned"}], ["A"], ["B"])
    with pytest.raises(ValueError, match="unknown member release"):
        build_model({"A": (0, 0, 0), "B": (10, 0, 0)},
                    [{"name": "m", "node1": "A", "node2": "B",
                      "release": "hinged"}], ["A"], ["B"])
    from small_fem_solver_tpu.utils.io import load_model, save_model
    model = _propped_cantilever()
    p = tmp_path / "m.json"
    save_model(p, model)
    back, _ = load_model(p)
    np.testing.assert_array_equal(np.asarray(back.release),
                                  np.asarray(model.release))


def test_pinned_strut_euler_buckling():
    """A two-element strut pinned at both physical ends buckles at the
    pinned-pinned (shear-corrected) Euler load; the geometric stiffness is
    projected onto the released subspace (without the projection the zeroed
    elastic rotation rows against live K_G rows give spurious factors)."""
    L1, L2 = 6.0, 12.0
    nodes = {"A": (0.0, 0.0, 10.0), "B": (L1, 0.0, 10.0),
             "C": (L1, 0.0, 10.0 - L2),
             "D": (L1, 0.0, 10.0 - L2 / 2)}
    members = [{"name": "cant", "node1": "A", "node2": "B", "type": "leg"},
               {"name": "s1", "node1": "C", "node2": "D", "type": "brace",
                "release": "pinned1"},
               {"name": "s2", "node1": "D", "node2": "B", "type": "brace",
                "release": "pinned2"}]
    model = build_model(nodes, members, ["A", "C"], ["B"],
                        leg_section=(1200.0, 50.0),
                        brace_section=(300.0, 10.0))
    case = _still_case(F_axial_kN=100.0)
    res = sf.analyze(model, _tiny_wave(), case)
    buck = sf.buckling_analysis(model, res, E=E, nu=NU, n_modes=3)
    sec = model.sections
    I = float(sec.Iy[1]); A_s = float(sec.Az[1])
    P_e = np.pi**2 * E * I / (L2 * 1000.0)**2
    P_cr = P_e / (1.0 + P_e / (G * A_s))        # shear-corrected Euler
    N_strut = float(buck.member_axial_N[1])
    lam = float(buck.load_factor[0])
    np.testing.assert_allclose(lam * N_strut, P_cr, rtol=0.02)


def test_pdelta_with_releases_runs():
    model = _propped_cantilever()
    case = _still_case(F_axial_kN=2000.0, F_shear_kN=50.0)
    res = sf.analyze_pdelta(model, _tiny_wave(), case)
    assert np.isfinite(float(res.pdelta_amplification))
    assert float(res.pdelta_amplification) >= 1.0

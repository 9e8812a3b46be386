"""Property tests on randomized structures (SURVEY.md §4: equilibrium,
symmetry, solver-path agreement must hold for ANY model, not just the
canonical jacket).

Each case perturbs the default jacket's geometry/sections/loads with a
seeded RNG, so the structures are irregular (no symmetry planes, unequal
member lengths, skewed waves) but still well-posed frames.
"""
import dataclasses

import numpy as np
import pytest

import small_fem_solver_tpu as sf


def _random_model_case(seed):
    from small_fem_solver_tpu.models.presets import \
        default_3leg_jacket_geometry

    rng = np.random.default_rng(seed)
    nodes0, members, fixed, top = default_3leg_jacket_geometry()
    nodes = {name: tuple(np.asarray(xyz) + rng.uniform(-0.5, 0.5, 3))
             for name, xyz in nodes0.items()}
    model = sf.build_model(
        nodes, members, fixed_nodes=fixed, top_nodes=top,
        leg_section=(rng.uniform(1500, 2500), rng.uniform(40, 90)),
        brace_section=(rng.uniform(500, 1000), rng.uniform(15, 40)))
    wave = sf.make_wave(rng.uniform(4.0, 14.0), rng.uniform(7.0, 12.0),
                        50.0, U_c=rng.uniform(0.0, 2.0), model="stokes",
                        N=5)
    case = sf.LoadCase(
        wave_dir_deg=rng.uniform(0, 360), current_dir_deg=rng.uniform(0, 360),
        F_axial_kN=rng.uniform(5e3, 4e4), F_shear_kN=rng.uniform(0, 5e3),
        M_moment_kNm=rng.uniform(0, 2e4), M_torsion_kNm=rng.uniform(0, 1e4),
        custom_sw_tonnes=rng.uniform(200, 2000), sw_mode="custom",
        t_analysis=rng.uniform(0.0, 9.0),
        marine_growth_mm=rng.choice([0.0, 50.0, 120.0]))
    return model, wave, case


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_model_equilibrium_and_solver_agreement(seed):
    model, wave, case = _random_model_case(seed)

    res = sf.analyze(model, wave, case, solver="chol")
    # global force equilibrium: reactions balance every applied load
    applied = np.asarray(res.F_applied).reshape(-1, 6)[:, :3].sum(axis=0)
    np.testing.assert_allclose(np.asarray(res.total_reaction[:3]), -applied,
                               rtol=1e-9, atol=1e-6)

    # solver-path agreement on the same system
    lu = sf.analyze(model, wave, case, solver="lu")
    np.testing.assert_allclose(np.asarray(lu.U), np.asarray(res.U),
                               rtol=1e-9, atol=1e-12)
    pcg = sf.analyze(model, wave, case, solver="pcg", pcg_tol=1e-12)
    np.testing.assert_allclose(np.asarray(pcg.U), np.asarray(res.U),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("seed", [5, 6])
def test_random_model_condensed_matches_dense(seed):
    model, wave, case = _random_model_case(seed)
    case = dataclasses.replace(case, marine_growth_mm=0.0)
    n_seg = 3
    refined = sf.refine_model(model, n_seg)
    dense = sf.analyze(refined, wave, case, solver="chol", accel="analytic")
    cond = sf.analyze_condensed(model, refined, n_seg, wave, case)
    np.testing.assert_allclose(np.asarray(cond.U), np.asarray(dense.U),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cond.reactions),
                               np.asarray(dense.reactions), rtol=1e-7)


@pytest.mark.parametrize("seed", [7])
def test_random_model_sprung_equilibrium(seed):
    model, wave, case = _random_model_case(seed)
    k = [3e6, 2e6, 8e6, 1e12, 2e12, 5e11]
    ssi = sf.analyze_ssi(model, wave, case, k)
    applied = np.asarray(ssi.F_applied).reshape(-1, 6)[:, :3].sum(axis=0)
    np.testing.assert_allclose(np.asarray(ssi.total_reaction[:3]), -applied,
                               rtol=1e-9, atol=1e-6)
    fixed = np.where(np.asarray(model.fixed_mask))[0]
    u_sup = np.asarray(ssi.U).reshape(-1, 6)[fixed]
    np.testing.assert_allclose(np.asarray(ssi.reactions),
                               -np.asarray(k) * u_sup, rtol=1e-8)


@pytest.mark.parametrize("seed", [5, 6])
def test_random_refined_two_level_pcg(seed):
    """The two-level smoothed-aggregation preconditioner on IRREGULAR
    refined frames (the 'general imported mesh' case it exists for):
    converges, matches the direct solve, and beats block-Jacobi."""
    model, wave, case = _random_model_case(seed)
    refined = sf.refine_model(model, 12)
    tl = sf.analyze(refined, wave, case, solver="pcg", accel="analytic",
                    pcg_precond="two_level", pcg_maxiter=20000)
    ch = sf.analyze(refined, wave, case, solver="chol", accel="analytic")
    scale = float(np.abs(np.asarray(ch.U)).max())
    np.testing.assert_allclose(np.asarray(tl.U), np.asarray(ch.U),
                               rtol=1e-7, atol=1e-8 * scale)
    bj = sf.analyze(refined, wave, case, solver="pcg", accel="analytic",
                    pcg_precond="block_jacobi", pcg_maxiter=20000)
    assert int(tl.solver_iters) * 2 <= int(bj.solver_iters), \
        (int(bj.solver_iters), int(tl.solver_iters))


@pytest.mark.parametrize("seed", [11, 12])
def test_random_model_with_releases(seed):
    """Random pinned braces (legs kept rigid so every node stays
    rotationally restrained): equilibrium, zero released end moments, and
    chain-condensation consistency all hold on irregular geometry."""
    from small_fem_solver_tpu.models.presets import \
        default_3leg_jacket_geometry

    rng = np.random.default_rng(seed)
    nodes0, members, fixed, top = default_3leg_jacket_geometry()
    nodes = {name: tuple(np.asarray(xyz) + rng.uniform(-0.4, 0.4, 3))
             for name, xyz in nodes0.items()}
    members = [dict(m) for m in members]
    pin_idx = []
    for i, m in enumerate(members):
        if m.get("type") == "h_brace" and rng.random() < 0.7:
            m["release"] = rng.choice(["pinned", "pinned1", "pinned2"])
            pin_idx.append(i)
    model = sf.build_model(nodes, members, fixed_nodes=fixed, top_nodes=top)
    wave = sf.make_wave(rng.uniform(6.0, 12.0), 9.4, 50.0, U_c=1.0,
                        model="airy")
    case = sf.LoadCase(wave_dir_deg=rng.uniform(0, 360),
                       current_dir_deg=rng.uniform(0, 360),
                       F_axial_kN=2e4, F_shear_kN=2e3,
                       custom_sw_tonnes=800.0, sw_mode="custom",
                       t_analysis=rng.uniform(0.0, 9.0))
    res = sf.analyze(model, wave, case, accel="analytic")
    applied = np.asarray(res.F_applied).reshape(-1, 6)[:, :3].sum(axis=0)
    np.testing.assert_allclose(np.asarray(res.total_reaction[:3]), -applied,
                               rtol=1e-9, atol=1e-6)
    rel = np.asarray(model.release)
    F1 = np.asarray(res.F1_local)
    F2 = np.asarray(res.F2_local)
    for i in pin_idx:
        if rel[i] & 1:
            assert np.abs(F1[i, 4:6]).max() < 1e-3
        if rel[i] & 2:
            assert np.abs(F2[i, 4:6]).max() < 1e-3
    # condensation consistency on the released refined mesh
    refined = sf.refine_model(model, 3)
    dense = sf.analyze(refined, wave, case, accel="analytic")
    cond = sf.analyze_condensed(model, refined, 3, wave, case)
    np.testing.assert_allclose(np.asarray(cond.U), np.asarray(dense.U),
                               rtol=1e-6, atol=1e-8)

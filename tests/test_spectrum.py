"""Irregular-sea (spectral) analysis: spectrum discretization, the
separable spectral kinematics kernel, response scans and fatigue.

Verification strategy (no external oracle exists for this capability —
the reference is regular-wave only): closed-form spectral identities
(m0 = Hs^2/16, Tz from moments), the narrow-band limit (a one-component
sea IS a regular Airy wave — pinned against the steady-wave kernel), an
independent numpy reimplementation of the Morison quadrature as the
load-path oracle, Rayleigh statistics of the realization, and rainflow
counting against hand-checkable histories.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.spectrum import (_rainflow_ranges,
                                               jonswap_shape,
                                               make_random_sea,
                                               morison_sea_batch,
                                               sea_kinematics, sea_surface,
                                               spectral_fatigue_screen)


def test_sea_m0_matches_hs_exactly():
    for spec in ("jonswap", "pm"):
        sea = make_random_sea(6.5, 9.4, 50.0, n_components=48, seed=3,
                              spectrum=spec)
        np.testing.assert_allclose(float(sea.m0), 6.5**2 / 16.0, rtol=1e-12)
        # JONSWAP/PM mean zero-crossing period sits at ~0.7-0.9 Tp
        tz = float(sea.mean_zero_crossing_period)
        assert 0.6 * 9.4 < tz < 0.95 * 9.4


def test_jonswap_peak_and_gamma():
    om = np.linspace(0.2, 2.5, 2000)
    s3 = np.asarray(jonswap_shape(om, 9.4, 3.3))
    s1 = np.asarray(jonswap_shape(om, 9.4, 1.0))
    wp = 2 * np.pi / 9.4
    # peak at (slightly above, for the shape) the peak frequency
    assert abs(om[np.argmax(s3)] - wp) < 0.05
    # gamma sharpens the peak relative to the tails
    r = s3 / np.maximum(s1, 1e-30)
    assert r[np.argmax(s3)] > 2.5
    assert r[-1] < 1.5


def test_single_component_sea_is_airy_wave():
    """Narrow-band limit: one component == the regular Airy wave with
    H = 2a; kinematics and the Morison load batch agree with the
    steady-wave kernel to machine precision."""
    import dataclasses

    from small_fem_solver_tpu.ops.morison import morison_phase_batch
    from small_fem_solver_tpu.ops.spectrum import SpectralSea
    from small_fem_solver_tpu.ops.waves import kinematics

    H, T, d, Uc = 8.0, 9.4, 50.0, 1.2
    wave = sf.airy_wave(H, T, d, Uc)
    a = H / 2.0
    sea = SpectralSea(
        omega=wave.omega[None], k=wave.k[None], a=jnp.asarray([a]),
        phi=jnp.zeros(1), E=jnp.asarray([a]),
        U=(a * wave.omega / jnp.tanh(wave.k * d))[None],
        d=wave.d, U_c=wave.U_c, Hs=jnp.asarray(2 * np.sqrt(2) * a),
        Tp=wave.T)

    x = jnp.linspace(0.0, 130.0, 9)
    z = jnp.linspace(-45.0, 3.0, 9)
    t = jnp.asarray(2.7)
    kin_w = kinematics(wave, x, z, t, accel="analytic")
    kin_s = sea_kinematics(sea, x, z, t)
    np.testing.assert_allclose(np.asarray(kin_s.u), np.asarray(kin_w.u),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(kin_s.du_dt),
                               np.asarray(kin_w.du_dt), rtol=1e-12,
                               atol=1e-12)

    model = sf.default_3leg_jacket()
    D_m = model.sections.D_outer[model.sect_id] / 1000.0
    ts = jnp.arange(7) * T / 7
    mb_w = morison_phase_batch(wave, model.coords, model.conn, D_m, 38.0,
                               120.0, 0.7, 2.0, 1025.0, ts)
    mb_s = morison_sea_batch(sea, model.coords, model.conn, D_m, 38.0,
                             120.0, 0.7, 2.0, 1025.0, ts)
    np.testing.assert_allclose(np.asarray(mb_s.nodal_forces),
                               np.asarray(mb_w.nodal_forces), rtol=1e-10,
                               atol=1e-8)
    # Wheeler rows ride the same generalized core
    mb_ww = morison_phase_batch(wave, model.coords, model.conn, D_m, 38.0,
                                120.0, 0.7, 2.0, 1025.0, ts,
                                stretching="wheeler")
    mb_sw = morison_sea_batch(sea, model.coords, model.conn, D_m, 38.0,
                              120.0, 0.7, 2.0, 1025.0, ts,
                              stretching="wheeler")
    np.testing.assert_allclose(np.asarray(mb_sw.nodal_forces),
                               np.asarray(mb_ww.nodal_forces), rtol=1e-10,
                               atol=1e-8)


def test_sea_batch_against_numpy_quadrature_oracle():
    """Independent plain-numpy Morison quadrature (drag + inertia, lever
    rule, dry masking) over sea_kinematics == the separable matmul path."""
    model = sf.default_3leg_jacket()
    sea = make_random_sea(6.0, 9.4, 50.0, n_components=12, seed=5, U_c=0.8)
    D_m = np.asarray(model.sections.D_outer)[np.asarray(model.sect_id)] / 1e3
    Cd, Cm, rho = 0.7, 2.0, 1025.0
    dirs = 38.0
    n_gauss = 7
    ts = np.array([0.0, 3.1])

    mb = morison_sea_batch(sea, model.coords, model.conn,
                           jnp.asarray(D_m), dirs, dirs, Cd, Cm, rho,
                           jnp.asarray(ts), n_gauss=n_gauss)

    from small_fem_solver_tpu.ops.morison import gauss_legendre_01
    s, w = gauss_legendre_01(n_gauss)
    coords = np.asarray(model.coords)
    conn = np.asarray(model.conn)
    th = np.deg2rad(90.0 - dirs)
    cw, sw_ = np.cos(th), np.sin(th)
    nodal = np.zeros((len(ts), coords.shape[0], 3))
    for it, t in enumerate(ts):
        for m in range(conn.shape[0]):
            c1, c2 = coords[conn[m, 0]], coords[conn[m, 1]]
            dL = c2 - c1
            L = np.linalg.norm(dL)
            e = dL / L
            F1 = np.zeros(3)
            F2 = np.zeros(3)
            for q in range(n_gauss):
                p = c1 + s[q] * dL
                xw = p[0] * cw + p[1] * sw_
                kin = sea_kinematics(sea, xw, p[2], float(t))
                if not bool(kin.submerged):
                    continue
                u, wv = float(kin.u), float(kin.w)
                du, dw = float(kin.du_dt), float(kin.dw_dt)
                U = np.array([(u - float(sea.U_c)) * cw + float(sea.U_c) * cw,
                              (u - float(sea.U_c)) * sw_ + float(sea.U_c) * sw_,
                              wv])
                A = np.array([du * cw, du * sw_, dw])
                Up = U - (U @ e) * e
                Ap = A - (A @ e) * e
                Um = np.linalg.norm(Up)
                f = rho * Cm * np.pi * D_m[m] ** 2 / 4.0 * Ap * L * w[q]
                if Um > 1e-10:
                    f = f + 0.5 * rho * Cd * D_m[m] * Um * Up * L * w[q]
                F1 += (1 - s[q]) * f
                F2 += s[q] * f
            nodal[it, conn[m, 0]] += F1
            nodal[it, conn[m, 1]] += F2
    got = np.asarray(mb.nodal_forces)
    scale = np.abs(nodal).max()
    np.testing.assert_allclose(got, nodal, rtol=1e-8, atol=1e-8 * scale)


def test_realization_statistics_rayleigh():
    """The realization's surface must carry the spectral variance and
    near-Rayleigh peak statistics (many independent components)."""
    sea = make_random_sea(6.0, 9.4, 50.0, n_components=96, seed=11)
    # long record, fine sampling
    S = 16384
    dt = 0.7
    ts = jnp.arange(S) * dt
    eta = np.asarray(sea_surface(sea, 0.0, ts))
    sigma = np.sqrt(float(sea.m0))
    assert abs(eta.std() - sigma) / sigma < 0.05
    assert abs(eta.mean()) < 0.05 * sigma
    # mean zero-upcrossing period matches the spectral Tz
    up = ((eta[:-1] < 0) & (eta[1:] >= 0)).sum()
    tz_emp = S * dt / up
    tz_spec = float(sea.mean_zero_crossing_period)
    assert abs(tz_emp - tz_spec) / tz_spec < 0.1
    # crest heights ~ Rayleigh(sigma): mean crest = sigma sqrt(pi/2)
    # (narrow-band approximation: tolerate 15%)
    peaks = eta[1:-1][(eta[1:-1] > eta[:-2]) & (eta[1:-1] > eta[2:])]
    crests = peaks[peaks > 0]
    assert abs(crests.mean() - sigma * np.sqrt(np.pi / 2)) \
        < 0.15 * sigma * np.sqrt(np.pi / 2)


def test_sea_scan_condensed_matches_dense():
    """sea_scan_prepared (condensed, factor-once) == sea_response_batch
    (dense Cholesky) on the same refined model, f64."""
    coarse = sf.default_3leg_jacket()
    n_seg = 3
    refined = sf.refine_model(coarse, n_seg)
    sea = make_random_sea(6.5, 9.4, 50.0, n_components=24, seed=7, U_c=1.0)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    ts = np.arange(8) * 1.3
    prep = sf.prepare_condensed(coarse, refined, n_seg)
    cond = sf.sea_scan_prepared(prep, sea, case, ts, stretching="wheeler")
    dense = sf.sea_response_batch(refined, sea, case, ts,
                                  stretching="wheeler")
    U = np.asarray(dense.U)
    np.testing.assert_allclose(np.asarray(cond.U), U, rtol=1e-8,
                               atol=1e-8 * np.abs(U).max())
    np.testing.assert_allclose(np.asarray(cond.von_mises),
                               np.asarray(dense.von_mises), rtol=1e-7,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(cond.reactions),
                               np.asarray(dense.reactions), rtol=1e-7,
                               atol=1e-7 * np.abs(np.asarray(dense.reactions)).max())
    # equilibrium at every sample: vertical reactions balance the loads
    Fz = -25100e3 - 1100e3 * 9.81 + np.asarray(cond.total_morison)[:, 2]
    Rz = np.asarray(cond.reactions).sum(axis=1)[:, 2]
    np.testing.assert_allclose(Rz, -Fz, rtol=1e-9)


def test_rainflow_known_sequence():
    """ASTM E1049 worked example: the classic 6-reversal history."""
    y = np.array([0.0, -2.0, 1.0, -3.0, 5.0, -1.0, 3.0, -4.0, 4.0, -2.0])
    ranges, weight = _rainflow_ranges(y)
    # total damage-equivalent count: sum of m=1 weighted ranges is
    # invariant to counting order for a closed sequence
    assert ranges.size >= 4
    assert np.isclose((weight * ranges).sum(),
                      np.abs(np.diff(y)).sum() / 2.0, rtol=1e-12)


def test_spectral_fatigue_sinusoid_limits():
    """Deterministic sinusoid: rainflow reproduces the one-cycle-per-period
    deterministic screen exactly; the narrow-band Rayleigh estimate is the
    classical Gamma(1 + m/2) = 1.329x conservative bound."""
    from math import gamma

    from small_fem_solver_tpu.ops.fatigue import fatigue_screen

    T = 9.4
    S = 940                      # 100 cycles, 10 samples/cycle
    dt = T / 10.0
    t = np.arange(S) * dt
    amp = np.array([40.0, 15.0])            # MPa amplitudes, 2 members
    # cos puts the extrema ON the sample grid (10/cycle), so the sampled
    # range is exactly 2 amp and sigma exactly amp/sqrt(2)
    vm = 60.0 + amp[None, :] * np.cos(2 * np.pi * t / T)[:, None]

    res = spectral_fatigue_screen(vm, dt, exposure_years=25.0, curve="D")
    det = fatigue_screen(vm, T_wave=T, exposure_years=25.0, curve="D")
    np.testing.assert_allclose(np.asarray(res.damage_rainflow),
                               np.asarray(det.damage), rtol=2e-2)
    ratio = np.asarray(res.damage_rayleigh) / np.asarray(res.damage_rainflow)
    np.testing.assert_allclose(ratio, gamma(1.0 + 3.0 / 2.0), rtol=0.05)
    assert np.all(np.asarray(res.life_years_rainflow) > 0)


def test_spectral_fatigue_on_sea_response():
    """End-to-end: random-sea stress histories -> damage; more exposure =
    proportionally more damage; rainflow <= Rayleigh (narrow-band bound)."""
    coarse = sf.default_3leg_jacket()
    sea = make_random_sea(9.0, 9.4, 50.0, n_components=32, seed=1, U_c=1.0)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    dt = 0.94
    ts = np.arange(256) * dt
    res = sf.sea_response_batch(coarse, sea, case, ts, stretching="wheeler")
    vm = np.asarray(res.von_mises)
    scr = spectral_fatigue_screen(vm, dt, exposure_years=25.0,
                                  curve="D-sea-cp", scf=2.0)
    d_rf = np.asarray(scr.damage_rainflow)
    d_nb = np.asarray(scr.damage_rayleigh)
    loaded = np.asarray(scr.sigma_mpa) > 0.5
    assert loaded.any()
    assert np.all(d_rf[loaded] > 0)
    # the two estimates must agree to within a small factor on every loaded
    # member.  (Strict Rayleigh >= rainflow only holds for GAUSSIAN
    # narrow-band histories; the drag nonlinearity and the unsigned von
    # Mises measure make some member histories non-Gaussian, where rainflow
    # can modestly exceed the narrow-band closed form.)
    ratio = d_nb[loaded] / d_rf[loaded]
    assert np.all((ratio > 0.4) & (ratio < 4.0))
    # and on the GOVERNING member (the fatigue answer) Rayleigh screens
    # conservatively
    g = np.argmax(d_rf)
    assert d_nb[g] >= 0.9 * d_rf[g]
    scr2 = spectral_fatigue_screen(vm, dt, exposure_years=50.0,
                                   curve="D-sea-cp", scf=2.0)
    np.testing.assert_allclose(np.asarray(scr2.damage_rainflow),
                               2.0 * d_rf, rtol=1e-9)


def test_scatter_fatigue_accumulates_states():
    """Scatter-diagram fatigue: Miner damage accumulates linearly over the
    sea states; reproducible per-seed; occurrence sum is validated."""
    coarse = sf.default_3leg_jacket()
    n_seg = 2
    refined = sf.refine_model(coarse, n_seg)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    prep = sf.prepare_condensed(coarse, refined, n_seg)
    states = [(4.0, 8.0, 0.6), (9.0, 9.4, 0.1)]
    res = sf.scatter_fatigue(prep, case, states, d=50.0,
                             exposure_years=25.0, scf=2.0,
                             n_components=16, n_steps=128, seed=3)
    assert res.per_state_rainflow.shape[0] == 2
    np.testing.assert_allclose(np.asarray(res.damage_rainflow),
                               res.per_state_rainflow.sum(axis=0),
                               rtol=1e-12)
    # the severe state dominates the damage of the governing member
    g = int(np.argmax(np.asarray(res.damage_rainflow)))
    assert res.per_state_rainflow[1, g] > res.per_state_rainflow[0, g]
    # reproducible
    res2 = sf.scatter_fatigue(prep, case, states, d=50.0,
                              exposure_years=25.0, scf=2.0,
                              n_components=16, n_steps=128, seed=3)
    np.testing.assert_array_equal(np.asarray(res.damage_rainflow),
                                  np.asarray(res2.damage_rainflow))
    with pytest.raises(ValueError, match="occurrences sum"):
        sf.scatter_fatigue(prep, case, [(4.0, 8.0, 0.7), (9.0, 9.4, 0.5)],
                           d=50.0, exposure_years=25.0)


def test_directional_spreading():
    """Short-crested seas through the per-mode-heading separable core."""
    import dataclasses

    model = sf.default_3leg_jacket()
    D_m = model.sections.D_outer[model.sect_id] / 1000.0
    ts = jnp.arange(6) * 1.3

    # (1) all-zero relative headings == the long-crested path exactly
    sea = make_random_sea(6.0, 9.4, 50.0, n_components=12, seed=5, U_c=0.8)
    sea0 = dataclasses.replace(sea, dir_deg=jnp.zeros(12))
    mb_a = morison_sea_batch(sea, model.coords, model.conn, D_m, 38.0, 38.0,
                             0.7, 2.0, 1025.0, ts)
    mb_b = morison_sea_batch(sea0, model.coords, model.conn, D_m, 38.0,
                             38.0, 0.7, 2.0, 1025.0, ts)
    np.testing.assert_allclose(np.asarray(mb_b.nodal_forces),
                               np.asarray(mb_a.nodal_forces), rtol=1e-12,
                               atol=1e-10)

    # (2) one component at relative heading delta == the same component
    # long-crested with the heading folded into wave_dir_deg (exact)
    one = jax.tree.map(lambda x: x[:1] if getattr(x, "ndim", 0) else x, sea)
    one_rot = dataclasses.replace(one, dir_deg=jnp.asarray([25.0]))
    mb_rel = morison_sea_batch(one_rot, model.coords, model.conn, D_m,
                               38.0, 38.0, 0.7, 2.0, 1025.0, ts)
    mb_abs = morison_sea_batch(one, model.coords, model.conn, D_m,
                               38.0 + 25.0, 38.0, 0.7, 2.0, 1025.0, ts)
    np.testing.assert_allclose(np.asarray(mb_rel.nodal_forces),
                               np.asarray(mb_abs.nodal_forces), rtol=1e-10,
                               atol=1e-8)

    # (3) spreading sampling: seeded-reproducible, bounded, narrower for
    # larger s, and energy (m0) untouched
    s_broad = make_random_sea(6.0, 9.4, 50.0, n_components=256, seed=7,
                              spreading_s=2.0)
    s_narrow = make_random_sea(6.0, 9.4, 50.0, n_components=256, seed=7,
                               spreading_s=25.0)
    db = np.asarray(s_broad.dir_deg)
    dn = np.asarray(s_narrow.dir_deg)
    assert np.abs(db).max() <= 180.0
    assert dn.std() < 0.5 * db.std()
    np.testing.assert_allclose(float(s_broad.m0), 6.0**2 / 16.0, rtol=1e-12)
    again = make_random_sea(6.0, 9.4, 50.0, n_components=256, seed=7,
                            spreading_s=2.0)
    np.testing.assert_array_equal(db, np.asarray(again.dir_deg))
    with pytest.raises(ValueError, match="spreading_s"):
        make_random_sea(6.0, 9.4, 50.0, spreading_s=-1.0)

    # (4) spread-sea response runs end-to-end (wheeler incl.) and the
    # transverse response is nonzero (short-crestedness does something)
    coarse = sf.default_3leg_jacket()
    refined = sf.refine_model(coarse, 2)
    case = sf.LoadCase(wave_dir_deg=90.0, current_dir_deg=90.0,
                       F_axial_kN=25100.0, sw_mode="none")
    sea_s = make_random_sea(7.0, 9.4, 50.0, n_components=24, seed=1,
                            spreading_s=5.0)
    prep = sf.prepare_condensed(coarse, refined, 2)
    hist = sf.sea_scan_prepared(prep, sea_s, case, np.arange(32) * 0.94,
                                stretching="wheeler")
    assert np.isfinite(np.asarray(hist.U)).all()
    # with wave_dir 90 (pure +y loading when long-crested), a spread sea
    # produces x-direction base shear too
    Rx = np.abs(np.asarray(hist.total_morison)[:, 0]).max()
    Ry = np.abs(np.asarray(hist.total_morison)[:, 1]).max()
    assert Rx > 0.02 * Ry


def test_scatter_fatigue_directional():
    """4-column scatter rows carry per-state headings; an identical state
    at the case heading reproduces the 3-column damage, and validation
    rejects malformed rows."""
    model = sf.default_3leg_jacket()
    refined = sf.refine_model(model, 2)
    prep = sf.prepare_condensed(model, refined, 2)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    base = sf.scatter_fatigue(prep, case, [(5.0, 8.5, 0.4)], d=50.0,
                              exposure_years=25.0, n_components=16,
                              n_steps=128)
    same = sf.scatter_fatigue(prep, case, [(5.0, 8.5, 0.4, 38.0)], d=50.0,
                              exposure_years=25.0, n_components=16,
                              n_steps=128)
    np.testing.assert_allclose(np.asarray(same.damage_rainflow),
                               np.asarray(base.damage_rainflow), rtol=1e-9)
    other = sf.scatter_fatigue(prep, case, [(5.0, 8.5, 0.4, 128.0)], d=50.0,
                               exposure_years=25.0, n_components=16,
                               n_steps=128)
    assert not np.allclose(np.asarray(other.damage_rainflow),
                           np.asarray(base.damage_rainflow))
    with pytest.raises(ValueError, match="scatter rows"):
        sf.scatter_fatigue(prep, case, [(5.0, 8.5)], d=50.0,
                           exposure_years=25.0)

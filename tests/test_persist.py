"""Result persistence (npz round trips) and resumable chunked envelopes."""
import numpy as np
import jax.numpy as jnp

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.api import phase_scan_condensed
from small_fem_solver_tpu.parallel.sweep import make_case_batch, make_wave_batch
from small_fem_solver_tpu.utils.persist import (design_envelope_resumable,
                                                load_results, save_results)


def _case(**kw):
    base = dict(wave_dir_deg=38.0, current_dir_deg=38.0, F_axial_kN=25100.0,
                F_shear_kN=2900.0, custom_sw_tonnes=1100.0, sw_mode="custom")
    base.update(kw)
    return sf.LoadCase(**base)


def _assert_tree_equal(a, b):
    assert type(a).__name__ == type(b).__name__
    for name in a._fields:
        va, vb = getattr(a, name), getattr(b, name)
        if va is None:
            assert vb is None
        elif hasattr(va, "_fields"):
            _assert_tree_equal(va, vb)
        else:
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_analysis_results_roundtrip(tmp_path):
    model = sf.default_3leg_jacket()
    wave = sf.airy_wave(9.0, 9.4, 50.0, 1.0)
    res = sf.analyze(model, wave, _case(), solver="chol")
    p = tmp_path / "res.npz"
    save_results(p, res)
    back = load_results(p)
    _assert_tree_equal(res, back)


def test_condensed_scan_roundtrip(tmp_path):
    coarse = sf.default_3leg_jacket()
    refined = sf.refine_model(coarse, 4)
    wave = sf.airy_wave(9.0, 9.4, 50.0)
    scan = phase_scan_condensed(coarse, refined, 4, wave, _case(), n_steps=4)
    p = tmp_path / "scan.npz"
    save_results(p, scan)
    _assert_tree_equal(scan, load_results(p))


def test_envelope_resumable_kill_and_resume(tmp_path):
    model = sf.default_3leg_jacket()
    B = 6
    waves = make_wave_batch(np.linspace(3.0, 12.0, B), 9.4, 50.0, U_c=1.7,
                            model="stokes", N=5, n_modes=8,
                            dtype=jnp.float64)
    cases = make_case_batch(_case(), t_analysis=jnp.zeros(B))
    out = tmp_path / "env"

    # simulate a killed run: only the first chunk completes
    partial = design_envelope_resumable(model, waves, cases, out,
                                        chunk_size=2, max_chunks=1,
                                        n_steps=6)
    assert partial is None
    files = sorted(p.name for p in out.glob("chunk_*.npz"))
    assert files == ["chunk_0000.npz"]
    mtime0 = (out / "chunk_0000.npz").stat().st_mtime_ns

    # resume: finishes the remaining chunks, does not recompute chunk 0
    full = design_envelope_resumable(model, waves, cases, out,
                                     chunk_size=2, n_steps=6)
    assert (out / "chunk_0000.npz").stat().st_mtime_ns == mtime0
    assert len(sorted(out.glob("chunk_*.npz"))) == 3

    # equals the unchunked envelope
    ref = sf.design_envelope(model, waves, cases, n_steps=6)
    np.testing.assert_allclose(np.asarray(full.max_util_per_case),
                               np.asarray(ref.max_util_per_case), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(full.member_envelope),
                               np.asarray(ref.member_envelope), rtol=1e-12)
    assert int(full.governing_case) == int(ref.governing_case)


def test_envelope_resumable_condensed(tmp_path):
    coarse = sf.default_3leg_jacket()
    n_seg = 3
    refined = sf.refine_model(coarse, n_seg)
    B = 4
    waves = make_wave_batch(np.linspace(4.0, 10.0, B), 9.4, 50.0, U_c=1.2,
                            model="stokes", N=5, n_modes=8,
                            dtype=jnp.float64)
    cases = make_case_batch(_case(), t_analysis=jnp.zeros(B))
    out = tmp_path / "env_c"
    full = design_envelope_resumable(coarse, waves, cases, out, chunk_size=2,
                                     refined=refined, n_seg=n_seg, n_steps=4,
                                     solve_dtype=jnp.float64)
    ref = sf.design_envelope_condensed(coarse, refined, n_seg, waves, cases,
                                       n_steps=4, solve_dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(full.max_util_per_case),
                               np.asarray(ref.max_util_per_case), rtol=1e-12)


def test_envelope_resumable_rejects_mismatched_resume(tmp_path):
    """Resuming into a directory holding chunks of a DIFFERENT sweep must
    raise instead of silently merging stale chunks."""
    import pytest
    model = sf.default_3leg_jacket()
    B = 4
    waves = make_wave_batch(np.linspace(3.0, 9.0, B), 9.4, 50.0, U_c=1.7,
                            model="stokes", N=5, n_modes=8,
                            dtype=jnp.float64)
    cases = make_case_batch(_case(), t_analysis=jnp.zeros(B))
    out = tmp_path / "env"
    design_envelope_resumable(model, waves, cases, out, chunk_size=2,
                              max_chunks=1, n_steps=4)
    # different chunk partition -> mismatch
    with pytest.raises(ValueError, match="DIFFERENT sweep"):
        design_envelope_resumable(model, waves, cases, out, chunk_size=4,
                                  n_steps=4)
    # different case data -> mismatch
    waves2 = make_wave_batch(np.linspace(4.0, 9.0, B), 9.4, 50.0, U_c=1.7,
                             model="stokes", N=5, n_modes=8,
                             dtype=jnp.float64)
    with pytest.raises(ValueError, match="DIFFERENT sweep"):
        design_envelope_resumable(model, waves2, cases, out, chunk_size=2,
                                  n_steps=4)


def test_round3_result_types_round_trip(tmp_path):
    """Transient, spectral-fatigue and scatter-fatigue result pytrees
    persist/load like every other result type."""
    import numpy as np

    import small_fem_solver_tpu as sf
    from small_fem_solver_tpu.ops.spectrum import (make_random_sea,
                                                   spectral_fatigue_screen)
    from small_fem_solver_tpu.utils.persist import load_results, save_results

    coarse = sf.default_3leg_jacket()
    refined = sf.refine_model(coarse, 2)
    case = sf.LoadCase(wave_dir_deg=38.0, F_shear_kN=2900.0, sw_mode="none")
    sea = make_random_sea(6.0, 9.4, 50.0, n_components=8, seed=0)
    dt = 0.94
    hist = sf.sea_response_batch(coarse, sea, case, np.arange(32) * dt)
    scr = spectral_fatigue_screen(np.asarray(hist.von_mises), dt, 25.0,
                                  scf=2.0)
    p = tmp_path / "scr.npz"
    save_results(p, scr)
    back = load_results(p)
    np.testing.assert_array_equal(np.asarray(back.damage_rainflow),
                                  np.asarray(scr.damage_rainflow))

    res = sf.transient_response_condensed(coarse, refined, 2, sea, case,
                                          dt=dt, n_steps=16,
                                          damping_ratio=0.05)
    p2 = tmp_path / "trans.npz"
    save_results(p2, res)
    back2 = load_results(p2)
    np.testing.assert_array_equal(np.asarray(back2.U_time),
                                  np.asarray(res.U_time))

    prep = sf.prepare_condensed(coarse, refined, 2)
    sc = sf.scatter_fatigue(prep, case, [(4.0, 8.0, 0.5)], d=50.0,
                            exposure_years=25.0, n_components=8,
                            n_steps=32)
    p3 = tmp_path / "scatter.npz"
    save_results(p3, sc)
    back3 = load_results(p3)
    np.testing.assert_array_equal(np.asarray(back3.damage_rainflow),
                                  np.asarray(sc.damage_rainflow))
    np.testing.assert_array_equal(np.asarray(back3.states),
                                  np.asarray(sc.states))


def test_new_result_types_roundtrip(tmp_path):
    """Every round-3 result pytree round-trips through save/load_results."""
    model = sf.default_3leg_jacket()
    wave = sf.airy_wave(17.038, 9.4, 50.0, 1.7)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    res = sf.analyze(model, wave, case)
    items = {
        "spec": sf.response_spectrum(model, 0.2, n_modes=3,
                                     topside_mass_t=1100.0),
        "push": sf.pushover(model, wave, case, lambda_max=12.0, n_lambda=4,
                            n_iter=25),
        "rob": sf.member_removal_screen(model, wave, case),
        "buck": sf.buckling_analysis(model, res, n_modes=2),
        "viv": sf.viv_screen(model, U_c=1.7, d=50.0),
    }
    for name, r in items.items():
        p = tmp_path / f"{name}.npz"
        sf.save_results(p, r)
        back = sf.load_results(p)
        assert type(back).__name__ == type(r).__name__
        for a, b in zip(r, back):
            if a is None or isinstance(a, (str, tuple, list)):
                continue
            arr = np.asarray(a)
            if np.issubdtype(arr.dtype, np.number) \
                    or arr.dtype == np.bool_:
                np.testing.assert_allclose(
                    arr.astype(np.float64),
                    np.asarray(b).astype(np.float64), rtol=1e-12)


def test_freqdomain_roundtrip(tmp_path):
    """Frequency-domain pytrees (transfer rows + statistics) round-trip."""
    model = sf.default_3leg_jacket()
    refined = sf.refine_model(model, 2)
    prep = sf.prepare_condensed(model, refined, 2)
    sea = sf.make_random_sea(6.0, 9.0, 50.0, n_components=6, seed=2)
    tr = sf.spectral_transfer_prepared(prep, sea, _case())
    st = sf.spectral_response_dynamic(model, refined, 2, sea, _case(),
                                      n_chain_modes=4)
    for name, r in {"transfer": tr, "stats": st}.items():
        p = tmp_path / f"{name}.npz"
        sf.save_results(p, r)
        back = sf.load_results(p)
        assert type(back).__name__ == type(r).__name__
        for a, b in zip(r, back):
            if a is None or isinstance(a, (str, tuple, list)):
                continue
            np.testing.assert_allclose(np.asarray(a, dtype=np.float64),
                                       np.asarray(b, dtype=np.float64),
                                       rtol=1e-12)

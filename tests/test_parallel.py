"""Design sweeps and multi-device sharding on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.parallel.sweep import (critical_case, design_sweep,
                                                 make_case_batch,
                                                 make_wave_batch, stack_waves)


def _base_case():
    return sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")


def test_wave_batch_matches_single():
    Hs = [2.0, 5.0, 8.0]
    batch = make_wave_batch(Hs, 9.4, 50.0, U_c=1.0, model="stokes", N=5,
                            n_modes=8, dtype=jnp.float64)
    for i, H in enumerate(Hs):
        single = sf.stokes_wave(H, 9.4, 50.0, 1.0, order=5, n_modes=8)
        np.testing.assert_allclose(float(batch.k[i]), float(single.k), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(batch.E[i]), np.asarray(single.E),
                                   rtol=1e-12)


def test_design_sweep_matches_individual_analyze():
    model = sf.default_3leg_jacket()
    Hs = [3.0, 6.0, 9.0, 12.0]
    waves = make_wave_batch(Hs, 9.4, 50.0, U_c=1.7, model="stokes", N=5,
                            n_modes=8, dtype=jnp.float64)
    cases = make_case_batch(_base_case(), t_analysis=jnp.zeros(4))
    res = design_sweep(model, waves, cases, accel="fd")
    assert res.utilization.shape[0] == 4
    for i, H in enumerate(Hs):
        w = sf.stokes_wave(H, 9.4, 50.0, 1.7, order=5, n_modes=8)
        r = sf.analyze(model, w, _base_case(), solver="chol")
        np.testing.assert_allclose(np.asarray(res.utilization[i]),
                                   np.asarray(r.utilization), rtol=1e-9)


def test_sharded_sweep_on_8_device_mesh():
    devs = np.array(jax.devices())
    assert len(devs) == 8, "conftest must provide 8 virtual CPU devices"
    mesh = Mesh(devs, ("cases",))
    model = sf.default_3leg_jacket()
    B = 16
    Hs = np.linspace(2.0, 14.0, B)
    waves = make_wave_batch(Hs, 9.4, 50.0, U_c=1.7, model="stokes", N=5,
                            n_modes=8, dtype=jnp.float64)
    cases = make_case_batch(_base_case(), t_analysis=jnp.zeros(B))
    res = design_sweep(model, waves, cases, mesh=mesh, accel="fd")
    # sharded result equals unsharded
    res0 = design_sweep(model, waves, cases, accel="fd")
    np.testing.assert_allclose(np.asarray(res.utilization),
                               np.asarray(res0.utilization), rtol=1e-10)
    crit = critical_case(res)
    # monotone in H: the critical case is the largest wave
    assert int(crit["index"]) == B - 1


def test_stack_waves_rejects_mixed_clamp():
    wa = sf.airy_wave(2.0, 9.0, 50.0, n_modes=5)
    ws = sf.stokes_wave(3.0, 9.0, 50.0, order=5, n_modes=5)
    with pytest.raises(ValueError):
        stack_waves([wa, ws])


def test_multihost_helpers_single_process():
    """Multi-host plumbing degenerates correctly on one process: the global
    mesh covers the 8 virtual devices, the local slice is everything, and
    the host-batched envelope equals the plain sharded envelope."""
    from small_fem_solver_tpu.parallel.multihost import (
        global_case_mesh, init_multihost, multihost_design_envelope,
        process_local_slice)

    assert init_multihost() is False          # single-process no-op
    mesh = global_case_mesh()
    assert mesh.devices.size == 8
    assert process_local_slice(10) == slice(0, 10)

    model = sf.default_3leg_jacket()
    Hs = np.linspace(3.0, 12.0, 8)
    env = multihost_design_envelope(model, Hs, 9.4, 50.0, 1.7, _base_case(),
                                    wave_model="stokes", N=5, n_modes=8,
                                    n_steps=4, dtype=jnp.float64)
    waves = make_wave_batch(Hs, 9.4, 50.0, U_c=1.7, model="stokes", N=5,
                            n_modes=8, dtype=jnp.float64)
    cases = make_case_batch(_base_case(), t_analysis=jnp.zeros(8))
    ref = sf.design_envelope(model, waves, cases, n_steps=4, mesh=mesh)
    np.testing.assert_allclose(np.asarray(env.max_util_per_case),
                               np.asarray(ref.max_util_per_case), rtol=1e-12)


def test_design_sweep_with_springs():
    """Sprung design_sweep case i equals the one-shot analyze_ssi."""
    model = sf.default_3leg_jacket()
    Hs = [6.0, 12.0]
    waves = make_wave_batch(Hs, 9.4, 50.0, U_c=1.7, model="stokes", N=5,
                            n_modes=8, dtype=jnp.float64)
    cases = make_case_batch(_base_case(), t_analysis=jnp.zeros(2))
    k = [1e6, 1e6, 1e6, 1e12, 1e12, 1e12]
    res = design_sweep(model, waves, cases, support_stiffness=k)
    import jax
    wave1 = jax.tree.map(lambda x: x[1], waves)
    one = sf.analyze_ssi(model, wave1, _base_case(), k, accel="analytic")
    np.testing.assert_allclose(np.asarray(res.U[1]), np.asarray(one.U),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.reactions[1]),
                               np.asarray(one.reactions), rtol=1e-9)


def test_multihost_condensed_envelope_single_process():
    """The flagship condensed envelope through the multi-host layer equals
    the plain mesh-sharded condensed envelope on one process."""
    from small_fem_solver_tpu.parallel.multihost import (
        global_case_mesh, multihost_design_envelope_condensed)

    coarse = sf.default_3leg_jacket()
    n_seg = 2
    refined = sf.refine_model(coarse, n_seg)
    Hs = np.linspace(3.0, 12.0, 8)
    env = multihost_design_envelope_condensed(
        coarse, refined, n_seg, Hs, 9.4, 50.0, 1.7, _base_case(),
        wave_model="stokes", N=5, n_modes=8, n_steps=4,
        dtype=jnp.float64, solve_dtype=jnp.float64)
    waves = make_wave_batch(Hs, 9.4, 50.0, U_c=1.7, model="stokes", N=5,
                            n_modes=8, dtype=jnp.float64)
    cases = make_case_batch(_base_case(), t_analysis=jnp.zeros(8))
    ref = sf.design_envelope_condensed(coarse, refined, n_seg, waves, cases,
                                       n_steps=4, solve_dtype=jnp.float64,
                                       mesh=global_case_mesh())
    np.testing.assert_allclose(np.asarray(env.max_util_per_case),
                               np.asarray(ref.max_util_per_case), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(env.member_envelope),
                               np.asarray(ref.member_envelope), rtol=1e-12)

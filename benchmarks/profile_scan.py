"""Profiling harness: component timings + optional jax.profiler traces.

The tracing/observability subsystem the reference lacks entirely (SURVEY.md
section 5).  Reports per-stage wall times (element stiffness, chain
factorization, loads, solve, recovery) and can write a TensorBoard-loadable
trace.

Usage:
    python benchmarks/profile_scan.py [--n-seg 32] [--steps 360]
                                      [--trace /tmp/jax-trace]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"  {name:<38} {best*1e3:8.1f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-seg", type=int, default=32)
    ap.add_argument("--steps", type=int, default=360)
    ap.add_argument("--trace", help="write a jax.profiler trace here")
    args = ap.parse_args()

    import small_fem_solver_tpu as sf
    from small_fem_solver_tpu.api import phase_scan_condensed
    from small_fem_solver_tpu.ops.assembly import assemble_dense
    from small_fem_solver_tpu.ops.beams import element_stiffness
    from small_fem_solver_tpu.ops.condense import factor_chains
    from small_fem_solver_tpu.ops.morison import morison_phase_batch
    from small_fem_solver_tpu.ops.pallas_kernels import morison_phase_batch_pallas
    from small_fem_solver_tpu.ops.solve import factor_dense, free_fixed_dofs

    coarse = sf.default_3leg_jacket(dtype=jnp.float32)
    refined = sf.refine_model(coarse, args.n_seg)
    wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="fenton", N=18,
                        dtype=jnp.float32)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    E = jnp.float32(210000.0)
    G = jnp.float32(210000.0 / 2.6)
    ts = jnp.arange(args.steps, dtype=jnp.float32) * jnp.float32(9.4) / args.steps
    D_m = refined.sections.D_outer[refined.sect_id] / 1000.0
    free_np, _ = free_fixed_dofs(coarse.fixed_mask)

    print(f"profile: ndof={refined.n_dof}, {args.steps} phases, "
          f"device={jax.devices()[0]}")

    f_elem = jax.jit(lambda c: element_stiffness(
        c, refined.conn, refined.sections, refined.sect_id, E, G))
    Kg = timeit("element_stiffness", f_elem, refined.coords)[0]
    f_fac = jax.jit(lambda K: factor_chains(K, args.n_seg))
    fac = timeit("factor_chains", f_fac, Kg)
    f_int = jax.jit(lambda ks: factor_dense(
        assemble_dense(ks, coarse.conn, 6 * coarse.n_nodes),
        jnp.asarray(free_np)))
    timeit("interface assemble+factor", f_int, fac.K_super)
    f_mx = jax.jit(lambda t: morison_phase_batch(
        wave, refined.coords, refined.conn, D_m, 38.0, 38.0, 0.7, 2.0,
        1025.0, t))
    timeit("morison loads (XLA separable)", f_mx, ts)
    f_mp = jax.jit(lambda t: morison_phase_batch_pallas(
        wave, refined.coords, refined.conn, D_m, 38.0, 38.0, 0.7, 2.0,
        1025.0, t))
    timeit("morison loads (Pallas fused)", f_mp, ts)

    run = lambda: phase_scan_condensed(coarse, refined, args.n_seg, wave,
                                       case, n_steps=args.steps,
                                       kinematics="pallas",
                                       solve_dtype=jnp.float32)
    timeit("FULL condensed scan (single call)", run)

    N = 10
    run().utilization.block_until_ready()
    t0 = time.time()
    last = None
    for _ in range(N):
        last = run().utilization
    last.block_until_ready()
    print(f"  {'FULL condensed scan (amortized x10)':<38} "
          f"{(time.time()-t0)/N*1e3:8.1f} ms")

    if args.trace:
        with jax.profiler.trace(args.trace):
            run().utilization.block_until_ready()
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()

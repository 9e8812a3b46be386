"""Pipelined per-stage timing of the flagship condensed scan.

Unlike profile_scan.py (single-dispatch latency, floor-dominated through the
axon relay), every stage here is timed amortized: N async dispatches, one
block at the end, min over rounds — the same methodology as bench.py, so the
stage numbers add up to the bench number.  Also A/Bs chain_solver variants
at the bench configuration.

Usage: python benchmarks/ab_stages.py [--n-seg 32] [--steps 360] [-N 20]
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def amortized(name, fn, *args, N=20, rounds=3, leaf=None):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        last = None
        for _ in range(N):
            last = fn(*args)
        jax.block_until_ready(last if leaf is None else leaf(last))
        best = min(best, (time.time() - t0) / N)
    print(f"  {name:<44} {best*1e3:8.2f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-seg", type=int, default=32)
    ap.add_argument("--steps", type=int, default=360)
    ap.add_argument("-N", type=int, default=20)
    args = ap.parse_args()

    import small_fem_solver_tpu as sf
    from small_fem_solver_tpu.api import (_chain_factor, _condensed_solve,
                                          phase_scan_condensed)
    from small_fem_solver_tpu.ops import condense as cm
    from small_fem_solver_tpu.ops import solve as solve_mod
    from small_fem_solver_tpu.ops.assembly import assemble_dense
    from small_fem_solver_tpu.ops.beams import element_stiffness
    from small_fem_solver_tpu.ops.pallas_kernels import morison_phase_batch_pallas

    n_seg = args.n_seg
    coarse = sf.default_3leg_jacket(dtype=jnp.float32)
    refined = sf.refine_model(coarse, n_seg)
    wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="fenton", N=18,
                        dtype=jnp.float32)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    E = jnp.float32(210000.0)
    G = jnp.float32(210000.0 / 2.6)
    ts = jnp.arange(args.steps, dtype=jnp.float32) * jnp.float32(9.4) / args.steps
    D_m = refined.sections.D_outer[refined.sect_id] / 1000.0
    free_np, _ = free_fixed = solve_mod.free_fixed_dofs(coarse.fixed_mask)
    free = jnp.asarray(free_np)
    nc, Mc = coarse.n_nodes, coarse.n_members
    N = args.N

    print(f"ab_stages: ndof={refined.n_dof}, {args.steps} phases, "
          f"N={N}, device={jax.devices()[0]}")

    with jax.default_matmul_precision("highest"):
        f_elem = jax.jit(lambda c: element_stiffness(
            c, refined.conn, refined.sections, refined.sect_id, E, G))
        Kg = amortized("element_stiffness", f_elem, refined.coords,
                       N=N, leaf=lambda o: o[0])[0]

        for cs in ("thomas", "nested"):
            f_fac = jax.jit(
                lambda K, cs=cs: _chain_factor(K, n_seg, cs)[0])
            fac = amortized(f"factor_chains[{cs}]", f_fac, Kg, N=N,
                            leaf=lambda o: o.K_super)

        f_int = jax.jit(lambda ks: solve_mod.factor_dense(
            assemble_dense(ks, coarse.conn, 6 * nc), free))
        fac_t, _condense, _backsub = _chain_factor(Kg, n_seg, "thomas")
        dfac = amortized("interface assemble+factor", f_int, fac_t.K_super,
                         N=N, leaf=lambda o: o[0])

        f_mp = jax.jit(lambda t: morison_phase_batch_pallas(
            wave, refined.coords, refined.conn, D_m, jnp.float32(38.0),
            jnp.float32(38.0), jnp.float32(0.7), jnp.float32(2.0),
            jnp.float32(1025.0), t))
        mb = amortized("morison loads (pallas)", f_mp, ts, N=N,
                       leaf=lambda o: o.nodal_forces)

        from small_fem_solver_tpu.api import assemble_loads
        f_asm = jax.jit(lambda nodal: jax.vmap(
            lambda nf: assemble_loads(refined, case.cast(jnp.float32), nf,
                                      jnp.ones(refined.n_members,
                                               jnp.float32)))(nodal))
        F_all = amortized("assemble_loads (vmap)", f_asm, mb.nodal_forces,
                          N=N)

        node1, node2 = coarse.conn[:, 0], coarse.conn[:, 1]
        Fn = F_all.reshape(args.steps, -1, 6)
        F_I_nodes = Fn[:, :nc]
        g = Fn[:, nc:].reshape(args.steps, Mc, n_seg - 1, 6).swapaxes(1, 2)

        for cs in ("thomas", "nested"):
            fac_c, cfn, bfn = _chain_factor(Kg, n_seg, cs)
            f_solve = jax.jit(lambda FI, gg, fac_c=fac_c, cfn=cfn, bfn=bfn:
                              _condensed_solve(FI, gg, fac_c, dfac, cfn, bfn,
                                               node1, node2))
            amortized(f"condense+solve+backsub[{cs}] S={args.steps}",
                      f_solve, F_I_nodes, g, N=N, leaf=lambda o: o[1])

        f_mv = jax.jit(lambda U_In, v: cm.chain_matvec(
            Kg, n_seg, coarse.conn, U_In, v))
        fac_c, cfn, bfn = _chain_factor(Kg, n_seg, "thomas")
        U_In, v, _, _ = _condensed_solve(F_I_nodes, g, fac_c, dfac, cfn, bfn,
                                         node1, node2)
        amortized("chain_matvec (refinement residual)", f_mv, U_In, v,
                  N=N, leaf=lambda o: o[0])

        # full scans for reference
        for cs in ("thomas", "nested"):
            run = lambda cs=cs: phase_scan_condensed(
                coarse, refined, n_seg, wave, case, n_steps=args.steps,
                kinematics="pallas", solve_dtype=jnp.float32,
                chain_solver=cs)
            amortized(f"FULL scan[{cs}]", run, N=N,
                      leaf=lambda o: o.utilization)
        run0 = lambda: phase_scan_condensed(
            coarse, refined, n_seg, wave, case, n_steps=args.steps,
            kinematics="pallas", solve_dtype=jnp.float32, refine_steps=0)
        amortized("FULL scan[thomas, refine_steps=0]", run0, N=N,
                  leaf=lambda o: o.utilization)


if __name__ == "__main__":
    main()

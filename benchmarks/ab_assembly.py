"""A/B: global-K assembly formulations at ~100k DOF on the real TPU.

Stages timed (f32, pipelined 10-deep, min-of-3 rounds, one process):
  congr   — element_stiffness with the batched T^T K T congruence
            (round-3 baseline; [M, 12, 12, 12] broadcast intermediates)
  direct  — element_global_stiffness (closed-form 3x3-block construction,
            no T/K_local materialization)
  bcsr    — assemble_bcsr alone, from a precomputed element stack
  full_*  — element K + BCSR accumulate end-to-end

Usage: python benchmarks/ab_assembly.py [n_seg]
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.api import _cached_bcsr_pattern
from small_fem_solver_tpu.ops import beams
from small_fem_solver_tpu.ops.assembly import assemble_bcsr


def bench(fn, *args, n_pipe=10, rounds=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        last = None
        for _ in range(n_pipe):
            last = fn(*args)
        jax.block_until_ready(last)
        best = min(best, (time.time() - t0) / n_pipe)
    return best


def main():
    n_seg = int(sys.argv[1]) if len(sys.argv) > 1 else 327
    model = sf.refine_model(sf.default_3leg_jacket(dtype=jnp.float32), n_seg)
    pattern = _cached_bcsr_pattern(model.conn, model.n_nodes)
    E = jnp.float32(210000.0)
    G = E / 2.6
    print(f"n_dof={model.n_dof}, M={model.conn.shape[0]}, "
          f"n_blocks={pattern.n_blocks}, "
          f"gather max_c={pattern.gather_idx.shape[1]}")

    @jax.jit
    def elem_congr(coords):
        # the round-3 baseline formulation, reproduced verbatim
        with jax.default_matmul_precision("highest"):
            c1 = coords[model.conn[:, 0]]
            c2 = coords[model.conn[:, 1]]
            dL = c2 - c1
            L = jnp.linalg.norm(dL, axis=-1)
            R = beams.local_axes(dL, L)
            T = beams.transformation_matrices(R)
            K_local = beams.local_stiffness(L * 1000.0, model.sections,
                                            model.sect_id, E, G)
            return beams.congruence(T, K_local)

    @jax.jit
    def elem_direct(coords):
        with jax.default_matmul_precision("highest"):
            return beams.element_global_stiffness(
                coords, model.conn, model.sections, model.sect_id, E, G)

    Kg = elem_direct(model.coords)

    @jax.jit
    def bcsr_only(Kg):
        return assemble_bcsr(Kg, pattern).blocks

    @jax.jit
    def full_congr(coords):
        return bcsr_only(elem_congr(coords))

    @jax.jit
    def full_direct(coords):
        with jax.default_matmul_precision("highest"):
            K = beams.element_global_stiffness(
                coords, model.conn, model.sections, model.sect_id, E, G)
            return assemble_bcsr(K, pattern).blocks

    B = 32
    scales = jnp.linspace(1.0, 1.01, B, dtype=jnp.float32)

    @jax.jit
    def sustained_congr(scales):
        # B assemblies in ONE device program: amortizes the relay dispatch
        # floor the way production paths (envelopes, sweeps) do
        def one(s):
            return bcsr_only(elem_congr(model.coords * s)).sum()
        return jax.lax.map(one, scales)

    @jax.jit
    def sustained_direct(scales):
        def one(s):
            with jax.default_matmul_precision("highest"):
                K = beams.element_global_stiffness(
                    model.coords * s, model.conn, model.sections,
                    model.sect_id, E, G)
            return assemble_bcsr(K, pattern).blocks.sum()
        return jax.lax.map(one, scales)

    @jax.jit
    def sustained_elem(scales):
        def one(s):
            with jax.default_matmul_precision("highest"):
                K = beams.element_global_stiffness(
                    model.coords * s, model.conn, model.sections,
                    model.sect_id, E, G)
            return K.sum()
        return jax.lax.map(one, scales)

    @jax.jit
    def sustained_bcsr(scales):
        def one(s):
            return assemble_bcsr(Kg * s, pattern).blocks.sum()
        return jax.lax.map(one, scales)

    @jax.jit
    def sustained_fused(scales):
        # quadrant-layout element construction fused into the gathers
        def one(s):
            coords = model.coords * s
            c1 = coords[model.conn[:, 0]]
            c2 = coords[model.conn[:, 1]]
            dL = c2 - c1
            L = jnp.linalg.norm(dL, axis=-1)
            R = beams.local_axes(dL, L)
            coeffs = beams.stiffness_coeffs(L * 1000.0, model.sections,
                                            model.sect_id, E, G)
            q = beams.global_stiffness_quadrants(R, coeffs)
            return assemble_bcsr(q, pattern).blocks.sum()
        return jax.lax.map(one, scales)

    for name, fn, args, per in [
        ("elem_congr      ", elem_congr, (model.coords,), 1),
        ("elem_direct     ", elem_direct, (model.coords,), 1),
        ("bcsr_only       ", bcsr_only, (Kg,), 1),
        ("full_congr      ", full_congr, (model.coords,), 1),
        ("full_direct     ", full_direct, (model.coords,), 1),
        ("sustained_congr ", sustained_congr, (scales,), B),
        ("sustained_direct", sustained_direct, (scales,), B),
        ("sustained_elem  ", sustained_elem, (scales,), B),
        ("sustained_bcsr  ", sustained_bcsr, (scales,), B),
        ("sustained_fused ", sustained_fused, (scales,), B),
    ]:
        t = bench(fn, *args, n_pipe=3 if per > 1 else 10) / per
        print(f"{name}: {t*1e3:7.3f} ms   ({model.n_dof/t/1e9:.3f} GDOF/s)")


if __name__ == "__main__":
    main()

"""Decompose the sustained assembly cost: element table vs gather vs map.

Stages (all inside one device program; min-of-3):
  geom      — lengths/axes/coeffs only (lax.map over B)
  table     — geom + [4M, 36] contribution table
  gather    — two-tier gather from a FIXED table (no element work)
  gather_v  — the same gather over a [B, 4M1, 36] batch (vmap, no lax.map)
  table_v   — vmapped element table (no lax.map)
  full_v    — vmapped table + gather
  segsum    — segment_sum accumulate from the fixed table (scatter path)

Usage: python benchmarks/ab_assembly_decomp.py [n_seg]
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
from benchmarks.ab_assembly_lane import entry_vectors, quadrant_entry


def bench(fn, *args, n_pipe=3, rounds=3):
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
    M = int(model.conn.shape[0])
    nb = pattern.n_blocks
    print(f"n_dof={model.n_dof}, M={M}, n_blocks={nb}", flush=True)

    def geometry(coords):
        c1 = coords[model.conn[:, 0]]
        c2 = coords[model.conn[:, 1]]
        dL = c2 - c1
        L = jnp.linalg.norm(dL, axis=-1)
        R = beams.local_axes(dL, L)
        coeffs = beams.stiffness_coeffs(L * 1000.0, model.sections,
                                        model.sect_id, E, G)
        return R, coeffs

    def flat_table(s):
        R, coeffs = geometry(model.coords * s)
        ent = entry_vectors(R, coeffs)
        cols = [jnp.stack([quadrant_entry(ent, q, k, M, R.dtype)
                           for k in range(36)], axis=-1)
                for q in range(4)]
        return jnp.concatenate(
            cols + [jnp.zeros((1, 36), jnp.float32)], axis=0)  # [4M+1, 36]

    def gather(flat):
        g = pattern.gather_idx
        out = flat[g[:, 0]] + flat[g[:, 1]]
        if pattern.extra_idx.shape[0]:
            out = out.at[pattern.extra_slot].add(flat[pattern.extra_idx])
        return out

    def segsum(flat):
        slots = jnp.concatenate(
            [pattern.elem_slot[:, 0], pattern.elem_slot[:, 1],
             pattern.elem_slot[:, 2], pattern.elem_slot[:, 3]])
        return jax.ops.segment_sum(flat[:-1], slots, num_segments=nb)

    B = 32
    scales = jnp.linspace(1.0, 1.01, B, dtype=jnp.float32)
    fixed = flat_table(jnp.float32(1.0))
    fixed_b = jnp.broadcast_to(fixed, (B,) + fixed.shape) * \
        scales[:, None, None]

    @jax.jit
    def run_geom(scales):
        return jax.lax.map(
            lambda s: jax.tree.map(jnp.sum, geometry(model.coords * s)),
            scales)

    @jax.jit
    def run_table(scales):
        return jax.lax.map(lambda s: flat_table(s).sum(), scales)

    @jax.jit
    def run_gather(scales):
        return jax.lax.map(lambda s: gather(fixed * s).sum(), scales)

    @jax.jit
    def run_gather_v(fixed_b):
        return jax.vmap(gather)(fixed_b).sum(axis=(1, 2))

    @jax.jit
    def run_table_v(scales):
        return jax.vmap(lambda s: flat_table(s).sum())(scales)

    @jax.jit
    def run_full_v(scales):
        return jax.vmap(lambda s: gather(flat_table(s)).sum())(scales)

    @jax.jit
    def run_segsum(scales):
        return jax.lax.map(lambda s: segsum(fixed * s).sum(), scales)

    for name, fn, args in [
        ("geom    ", run_geom, (scales,)),
        ("table   ", run_table, (scales,)),
        ("gather  ", run_gather, (scales,)),
        ("gather_v", run_gather_v, (fixed_b,)),
        ("table_v ", run_table_v, (scales,)),
        ("full_v  ", run_full_v, (scales,)),
        ("segsum  ", run_segsum, (scales,)),
    ]:
        with jax.default_matmul_precision("highest"):
            t = bench(fn, *args) / B
        print(f"{name}: {t*1e3:7.3f} ms   ({model.n_dof/t/1e9:.3f} GDOF/s)",
              flush=True)


if __name__ == "__main__":
    main()

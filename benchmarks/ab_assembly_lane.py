"""A/B: flat-lane element-K + BCSR layouts vs the round-4 quadrant baseline.

Hypothesis: [4M, 6, 6] / [n_blocks, 6, 6] tensors pad their two minor dims
to the TPU's (8, 128) vector tiles (up to ~14x physical bytes vs logical),
so the gather-assembly is roofline-bound on PADDING, not data.  A flat
[4M, 36] contribution table (36 -> 128 lanes, 3.5x pad) or a lane-major
[36, 4M] table (~1.1x pad) should cut real HBM traffic accordingly.

Variants (all sustained: B assemblies per device program via lax.map):
  quad66   — current production path (global_stiffness_quadrants ->
             assemble_bcsr on [4M, 6, 6])
  flat36   — entry-vector element K straight into a [4M, 36] table,
             row gathers, out [n_blocks, 36]
  flat36r  — flat36 + final reshape to [n_blocks, 6, 6] (consumer layout)
  lane36   — [36, 4M] lane-major table, gathers along the lane axis,
             out [36, n_blocks]

Usage: python benchmarks/ab_assembly_lane.py [n_seg]
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


def entry_vectors(R, coeffs):
    """The 144 per-entry [M] vectors of the element global stiffness,
    organized as ent[(B1, B2)][3*r + s] (see beams._direct_block_grid)."""
    ent = {}
    for c, i, j, v in beams._KPAT_ENTRIES:
        B1, a = divmod(i, 3)
        B2, b = divmod(j, 3)
        w = v * coeffs[:, c]
        for r in range(3):
            for s in range(3):
                key = (B1, B2, 3 * r + s)
                term = w * R[:, a, r] * R[:, b, s]
                ent[key] = ent.get(key, 0.0) + term
    return ent


def quadrant_entry(ent, q, k, M, dtype):
    """Entry k (= 6r+s) of quadrant q as an [M] vector."""
    B1q, B2q = divmod(q, 2)
    r, s = divmod(k, 6)
    B1, a = 2 * B1q + r // 3, r % 3
    B2, b = 2 * B2q + s // 3, s % 3
    v = ent.get((B1, B2, 3 * a + b))
    return jnp.zeros((M,), dtype) if v is None else v


def main():
    n_seg = int(sys.argv[1]) if len(sys.argv) > 1 else 327
    model = sf.refine_model(sf.default_3leg_jacket(dtype=jnp.float32), n_seg)
    pattern = _cached_bcsr_pattern(model.conn, model.n_nodes)
    E = jnp.float32(210000.0)
    G = E / 2.6
    M = int(model.conn.shape[0])
    nb = pattern.n_blocks
    print(f"n_dof={model.n_dof}, M={M}, n_blocks={nb}, "
          f"extras={int(pattern.extra_idx.shape[0])}", flush=True)

    def geometry(coords):
        c1 = coords[model.conn[:, 0]]
        c2 = coords[model.conn[:, 1]]
        dL = c2 - c1
        L = jnp.linalg.norm(dL, axis=-1)
        R = beams.local_axes(dL, L)
        coeffs = beams.stiffness_coeffs(L * 1000.0, model.sections,
                                        model.sect_id, E, G)
        return R, coeffs

    def one_quad66(s):
        R, coeffs = geometry(model.coords * s)
        q = beams.global_stiffness_quadrants(R, coeffs)
        return assemble_bcsr(q, pattern).blocks

    def flat_table(s):
        R, coeffs = geometry(model.coords * s)
        ent = entry_vectors(R, coeffs)
        cols = [jnp.stack([quadrant_entry(ent, q, k, M, R.dtype)
                           for k in range(36)], axis=-1)
                for q in range(4)]                       # 4 x [M, 36]
        return jnp.concatenate(cols, axis=0)             # [4M, 36]

    def one_flat36(s):
        flat = jnp.concatenate(
            [flat_table(s), jnp.zeros((1, 36), jnp.float32)], axis=0)
        g = pattern.gather_idx
        out = flat[g[:, 0]] + flat[g[:, 1]]
        if pattern.extra_idx.shape[0]:
            out = out.at[pattern.extra_slot].add(flat[pattern.extra_idx])
        return out                                       # [nb, 36]

    def one_flat36r(s):
        return one_flat36(s).reshape(nb, 6, 6)

    def lane_table(s):
        R, coeffs = geometry(model.coords * s)
        ent = entry_vectors(R, coeffs)
        rows = [jnp.stack([quadrant_entry(ent, q, k, M, R.dtype)
                           for q in range(4)], axis=0).reshape(-1)
                for k in range(36)]                      # 36 x [4M]
        return jnp.stack(rows, axis=0)                   # [36, 4M]

    def one_lane36(s):
        flat = jnp.concatenate(
            [lane_table(s), jnp.zeros((36, 1), jnp.float32)], axis=1)
        g = pattern.gather_idx
        out = flat[:, g[:, 0]] + flat[:, g[:, 1]]
        if pattern.extra_idx.shape[0]:
            out = out.at[:, pattern.extra_slot].add(flat[:, pattern.extra_idx])
        return out                                       # [36, nb]

    # correctness first (single call, vs the production path)
    ref = one_quad66(jnp.float32(1.0))
    got = one_flat36(jnp.float32(1.0)).reshape(nb, 6, 6)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    got2 = one_lane36(jnp.float32(1.0)).T.reshape(nb, 6, 6)
    err2 = float(jnp.max(jnp.abs(got2 - ref)) / jnp.max(jnp.abs(ref)))
    print(f"flat36 rel err {err:.2e}   lane36 rel err {err2:.2e}", flush=True)

    B = 32
    scales = jnp.linspace(1.0, 1.01, B, dtype=jnp.float32)

    def sustain(one):
        @jax.jit
        def run(scales):
            return jax.lax.map(lambda s: one(s).sum(), scales)
        return run

    for name, one in [("quad66 ", one_quad66), ("flat36 ", one_flat36),
                      ("flat36r", one_flat36r), ("lane36 ", one_lane36)]:
        with jax.default_matmul_precision("highest"):
            t = bench(sustain(one), scales) / B
        print(f"{name}: {t*1e3:7.3f} ms   ({model.n_dof/t/1e9:.3f} GDOF/s)",
              flush=True)


if __name__ == "__main__":
    main()

"""Decompose assembly cost without lax.map: 32-unrolled loops in one jit.

Separates scan-step overhead from real work, and tests a lane-major
geometry pipeline ([3, M] axes / [M] lane vectors — no minor-dim-3 arrays).

Usage: python benchmarks/ab_assembly_decomp2.py [n_seg]
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

    # --- row-major (current) geometry -------------------------------------
    def geometry(coords):
        c1 = coords[model.conn[:, 0]]
        c2 = coords[model.conn[:, 1]]
        dL = c2 - c1
        L = jnp.linalg.norm(dL, axis=-1)
        R = beams.local_axes(dL, L)
        coeffs = beams.stiffness_coeffs(L * 1000.0, model.sections,
                                        model.sect_id, E, G)
        return R, coeffs

    # --- lane-major geometry: every hot array is [M] or [k, M] -------------
    cT1 = jnp.asarray(model.coords)[model.conn[:, 0]].T   # [3, M] fixed gathers
    cT2 = jnp.asarray(model.coords)[model.conn[:, 1]].T

    def geometry_lane(s):
        d = (cT2 - cT1) * s                                # [3, M]
        L = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)    # [M]
        lx = d / L                                         # [3, M]
        # reference vertical-member convention (beams.local_axes)
        horiz = jnp.sqrt(lx[0] ** 2 + lx[1] ** 2)
        vertical = horiz < 1e-6
        up = lx[2] >= 0.0
        sgn = jnp.where(up, 1.0, -1.0)
        # general: ly ~ z_hat x lx (normalized), lz = lx x ly
        ly_g = jnp.stack([-lx[1], lx[0], jnp.zeros_like(L)], axis=0)
        ng = jnp.sqrt(ly_g[0] ** 2 + ly_g[1] ** 2 + 1e-30)
        ly_g = ly_g / ng
        lz_g = jnp.stack([
            lx[1] * ly_g[2] - lx[2] * ly_g[1],
            lx[2] * ly_g[0] - lx[0] * ly_g[2],
            lx[0] * ly_g[1] - lx[1] * ly_g[0]], axis=0)
        one = jnp.ones_like(L)
        zero = jnp.zeros_like(L)
        ly_v = jnp.stack([zero, sgn * one, zero], axis=0)
        lz_v = jnp.stack([-sgn * lx[2] * one, zero, sgn * lx[0] * one],
                         axis=0)
        # NOTE: only checking speed here — exact vertical convention parity
        # is validated against beams.local_axes in the production rewrite.
        ly = jnp.where(vertical, ly_v, ly_g)
        lz = jnp.where(vertical, lz_v, lz_g)
        coeffs = beams.stiffness_coeffs(L * 1000.0, model.sections,
                                        model.sect_id, E, G)
        return (lx, ly, lz), L, coeffs

    def entry_vectors_lane(rows, coeffs):
        R = rows  # tuple of [3, M]: R[a][r] is the [M] vector R[:, a, r]
        ent = {}
        for c, i, j, v in beams._KPAT_ENTRIES:
            B1, a = divmod(i, 3)
            B2, b = divmod(j, 3)
            w = v * coeffs[:, c]
            for r in range(3):
                for s in range(3):
                    key = (B1, B2, 3 * r + s)
                    term = w * R[a][r] * R[b][s]
                    ent[key] = ent.get(key, 0.0) + term
        return ent

    def lane_table(s):
        rows, L, coeffs = geometry_lane(s)
        ent = entry_vectors_lane(rows, coeffs)
        M_ = L.shape[0]
        out_rows = []
        for k in range(36):
            qs = []
            for q in range(4):
                B1q, B2q = divmod(q, 2)
                r, sdx = divmod(k, 6)
                B1, a = 2 * B1q + r // 3, r % 3
                B2, b = 2 * B2q + sdx // 3, sdx % 3
                v = ent.get((B1, B2, 3 * a + b))
                qs.append(jnp.zeros((M_,), jnp.float32) if v is None else v)
            out_rows.append(jnp.concatenate(qs, axis=0))
        return jnp.stack(out_rows, axis=0)                 # [36, 4M]

    def flat_from_lane(s):
        return lane_table(s).T                             # [4M, 36]

    def gather_rows(flat):
        g = pattern.gather_idx
        out = flat[g[:, 0]] + flat[g[:, 1]]
        if pattern.extra_idx.shape[0]:
            out = out.at[pattern.extra_slot].add(flat[pattern.extra_idx])
        return out

    def gather_lanes(lane):
        g = pattern.gather_idx
        out = lane[:, g[:, 0]] + lane[:, g[:, 1]]
        if pattern.extra_idx.shape[0]:
            out = out.at[:, pattern.extra_slot].add(lane[:, pattern.extra_idx])
        return out

    B = 32
    scales = jnp.linspace(1.0, 1.01, B, dtype=jnp.float32)
    fixed_rows = jnp.concatenate(
        [flat_from_lane(jnp.float32(1.0)),
         jnp.zeros((1, 36), jnp.float32)], axis=0)
    fixed_lane = jnp.concatenate(
        [lane_table(jnp.float32(1.0)),
         jnp.zeros((36, 1), jnp.float32)], axis=1)

    def unroll(one):
        @jax.jit
        def run(scales):
            acc = jnp.float32(0.0)
            for i in range(B):
                acc = acc + one(scales[i])
            return acc
        return run

    cases = [
        ("empty       ", lambda s: s * 2.0),
        # already measured: geom_row 0.339, geom_lane 0.302 (incl. ~0.29 floor)
        ("table_lane  ", lambda s: lane_table(s).sum()),
        ("gather_row  ", lambda s: gather_rows(fixed_rows * s).sum()),
        ("gather_lane ", lambda s: gather_lanes(fixed_lane * s).sum()),
        ("full_rowg   ", lambda s: gather_rows(
            jnp.concatenate([flat_from_lane(s),
                             jnp.zeros((1, 36), jnp.float32)], 0)).sum()),
        ("full_laneg  ", lambda s: gather_lanes(
            jnp.concatenate([lane_table(s),
                             jnp.zeros((36, 1), jnp.float32)], 1)).sum()),
    ]
    for name, one in cases:
        with jax.default_matmul_precision("highest"):
            t = bench(unroll(one), scales) / B
        print(f"{name}: {t*1e3:7.3f} ms   ({model.n_dof/t/1e9:.3f} GDOF/s)",
              flush=True)


if __name__ == "__main__":
    main()

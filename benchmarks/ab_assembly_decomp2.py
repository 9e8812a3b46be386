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
        # production conventions (beams.local_axes branch structure and
        # _VERTICAL_COS threshold), matching ab_assembly_direct.py —
        # parity vs beams.local_axes printed below
        d = (cT2 - cT1) * s                                # [3, M]
        L = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)    # [M]
        lx = d / L                                         # [3, M]
        horiz2 = lx[0] ** 2 + lx[1] ** 2
        horiz = jnp.sqrt(horiz2)
        vertical = jnp.abs(lx[2]) > beams._VERTICAL_COS
        zero = jnp.zeros_like(L)
        # vertical: ly = norm(z x lx) fallback (0,1,0); lz = lx x ly
        degen = horiz <= 1e-10
        hsafe = jnp.where(degen, 1.0, horiz)
        lyv = [jnp.where(degen, zero, -lx[1] / hsafe),
               jnp.where(degen, 1.0, lx[0] / hsafe), zero]
        lzv = [lx[1] * lyv[2] - lx[2] * lyv[1],
               lx[2] * lyv[0] - lx[0] * lyv[2],
               lx[0] * lyv[1] - lx[1] * lyv[0]]
        # generic: lz = normalize(lx x z), ly = lz x lx
        gsafe = jnp.where(horiz <= 1e-30, 1.0, horiz)
        lzg = [lx[1] / gsafe, -lx[0] / gsafe, zero]
        lyg = [lzg[1] * lx[2] - lzg[2] * lx[1],
               lzg[2] * lx[0] - lzg[0] * lx[2],
               lzg[0] * lx[1] - lzg[1] * lx[0]]
        ly = jnp.stack([jnp.where(vertical, a, b)
                        for a, b in zip(lyv, lyg)], axis=0)
        lz = jnp.stack([jnp.where(vertical, a, b)
                        for a, b in zip(lzv, lzg)], axis=0)
        coeffs = beams.stiffness_coeffs(L * 1000.0, model.sections,
                                        model.sect_id, E, G)
        return (lx, ly, lz), L, coeffs

    # geometry parity vs production local_axes (ADVICE r04: the lane
    # variant previously used a different vertical convention unchecked)
    (lxp, lyp, lzp), _, _ = geometry_lane(jnp.float32(1.0))
    R_lane = jnp.stack([jnp.stack(list(v), 0) for v in
                        ((lxp[0], lxp[1], lxp[2]),
                         (lyp[0], lyp[1], lyp[2]),
                         (lzp[0], lzp[1], lzp[2]))], 0)    # [3, 3, M]
    _c1 = jnp.asarray(model.coords)[model.conn[:, 0]]
    _c2 = jnp.asarray(model.coords)[model.conn[:, 1]]
    _dL = _c2 - _c1
    R_prod = beams.local_axes(_dL, jnp.linalg.norm(_dL, axis=-1))
    import numpy as _np
    _err = _np.abs(_np.asarray(R_prod).transpose(1, 2, 0)
                   - _np.asarray(R_lane)).max()
    print(f"geometry_lane vs beams.local_axes max abs err {_err:.2e}",
          flush=True)

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

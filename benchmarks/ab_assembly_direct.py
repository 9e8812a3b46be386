"""A/B: gather-free "direct-write" BCSR assembly.

Observation (ab_assembly_decomp2): the element table is bandwidth-free; the
two-tier gather is the whole assembly cost (0.24-0.40 ms real at 100k DOF).
But the gather is unnecessary: with blocks ordered [diag | ij | ji],

- every OFF-DIAGONAL block has exactly one contribution per duplicate-free
  edge -> emitting the ij/ji quadrant tables in slot-sorted member order IS
  the assembled off-diagonal data (a constant permutation, bakeable into the
  geometry constants);
- DIAGONAL blocks sum the ii/jj contributions of incident member-ends; on
  refined meshes almost every node has degree 2, so a padded [2N]-entry
  pipeline + pairwise reshape-sum covers them, with a tiny scatter for
  hub-node extras (and duplicate edges).

Variants:
  lane_g   — current best XLA candidate: [36, 4M] table + lane gathers
  direct_p — permuted entry vectors (36 fused 1-D lane gathers, no row
             gathers)
  direct_c — permuted CONSTANTS (zero runtime gathers; geometry evaluated
             per contribution list)

Usage: python benchmarks/ab_assembly_direct.py [n_seg]
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

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


def build_plan(conn, n_nodes):
    """Host-side direct-write plan.

    Returns dict with:
      order: block order [diag 0..N-1 | ij keys sorted | ji keys sorted]
             as (block_rows, block_cols)
      ij_members, ji_members: [n_ij] member ids in emit order
      diag_member, diag_end, diag_mask: [2N] padded per-node first-two
             contribution lists (member id, end 0/1, 0/1 valid mask)
      extra_*: leftovers (hub 3rd+ diag contributions, duplicate edges)
    """
    i = conn[:, 0].astype(np.int64)
    j = conn[:, 1].astype(np.int64)
    M = i.shape[0]

    def offdiag(rows, cols):
        key = rows * n_nodes + cols
        order = np.argsort(key, kind="stable")
        k_sorted = key[order]
        uniq, first = np.unique(k_sorted, return_index=True)
        members = order[first].astype(np.int32)
        dup_sel = np.ones(M, bool)
        dup_sel[first] = False
        dup_members = order[dup_sel].astype(np.int32)
        dup_slot = np.searchsorted(uniq, k_sorted[dup_sel]).astype(np.int32)
        return uniq, members, dup_members, dup_slot

    ij_keys, ij_members, ij_dup_m, ij_dup_s = offdiag(i, j)
    ji_keys, ji_members, ji_dup_m, ji_dup_s = offdiag(j, i)

    # diagonal: contributions (member m, end e) at node (e==0 ? i : j)
    nodes = np.concatenate([i, j])
    member = np.concatenate([np.arange(M), np.arange(M)]).astype(np.int32)
    end = np.concatenate([np.zeros(M, np.int32), np.ones(M, np.int32)])
    order = np.argsort(nodes, kind="stable")
    nodes_s, member_s, end_s = nodes[order], member[order], end[order]
    counts = np.bincount(nodes_s, minlength=n_nodes)
    starts = np.zeros(n_nodes + 1, np.int64)
    starts[1:] = np.cumsum(counts)
    diag_member = np.zeros(2 * n_nodes, np.int32)
    diag_end = np.zeros(2 * n_nodes, np.int32)
    diag_mask = np.zeros(2 * n_nodes, np.float32)
    for c in range(2):
        sel = counts > c
        pos = 2 * np.where(sel)[0] + c
        src = starts[:-1][sel] + c
        diag_member[pos] = member_s[src]
        diag_end[pos] = end_s[src]
        diag_mask[pos] = 1.0
    extra_m, extra_e, extra_slot = [], [], []
    maxc = int(counts.max())
    for c in range(2, maxc):
        sel = np.where(counts > c)[0]
        src = starts[:-1][sel] + c
        extra_m.append(member_s[src])
        extra_e.append(end_s[src])
        extra_slot.append(sel)
    n_ij = ij_keys.shape[0]
    n_ji = ji_keys.shape[0]
    # duplicate off-diag edges append to the same extras mechanism
    extra_m = np.concatenate(extra_m + [ij_dup_m, ji_dup_m]).astype(np.int32) \
        if (extra_m or ij_dup_m.size or ji_dup_m.size) else np.zeros(0, np.int32)
    extra_e = np.concatenate(
        extra_e + [np.full(ij_dup_m.shape, 2, np.int32),
                   np.full(ji_dup_m.shape, 3, np.int32)]).astype(np.int32) \
        if extra_m.size else np.zeros(0, np.int32)
    extra_slot = np.concatenate(
        extra_slot + [n_nodes + ij_dup_s, n_nodes + n_ij + ji_dup_s]
    ).astype(np.int32) if extra_m.size else np.zeros(0, np.int32)

    block_rows = np.concatenate([
        np.arange(n_nodes), ij_keys // n_nodes, ji_keys // n_nodes
    ]).astype(np.int32)
    block_cols = np.concatenate([
        np.arange(n_nodes), ij_keys % n_nodes, ji_keys % n_nodes
    ]).astype(np.int32)
    return dict(block_rows=block_rows, block_cols=block_cols,
                ij_members=ij_members, ji_members=ji_members,
                diag_member=diag_member, diag_end=diag_end,
                diag_mask=diag_mask, extra_m=extra_m, extra_e=extra_e,
                extra_slot=extra_slot, n_ij=n_ij, n_ji=n_ji)


# quadrant entry map: ENT_OF[q][k] = (B1, B2, 3a+b) source entry or None
def _entry_key(q, k):
    B1q, B2q = divmod(q, 2)
    r, s = divmod(k, 6)
    return (2 * B1q + r // 3, 2 * B2q + s // 3, 3 * (r % 3) + (s % 3))


def main():
    n_seg = int(sys.argv[1]) if len(sys.argv) > 1 else 327
    model = sf.refine_model(sf.default_3leg_jacket(dtype=jnp.float32), n_seg)
    pattern = _cached_bcsr_pattern(model.conn, model.n_nodes)
    conn = np.asarray(model.conn)
    N = model.n_nodes
    plan = build_plan(conn, N)
    E = jnp.float32(210000.0)
    G = E / 2.6
    M = int(conn.shape[0])
    nb = pattern.n_blocks
    nb_new = plan["block_rows"].shape[0]
    print(f"n_dof={model.n_dof}, M={M}, nb={nb} nb_new={nb_new} "
          f"extras={plan['extra_m'].shape[0]}", flush=True)
    assert nb == nb_new

    coordsT = np.asarray(model.coords).T                   # [3, N]
    cT1 = jnp.asarray(coordsT[:, conn[:, 0]])              # [3, M]
    cT2 = jnp.asarray(coordsT[:, conn[:, 1]])

    def geometry_lane(c1, c2, sect_id, s):
        d = (c2 - c1) * s
        L = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)
        lx = d / L
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
        ly = [jnp.where(vertical, a, b) for a, b in zip(lyv, lyg)]
        lz = [jnp.where(vertical, a, b) for a, b in zip(lzv, lzg)]
        R = ([lx[0], lx[1], lx[2]], ly, lz)   # R[a][r] lane vectors
        coeffs = beams.stiffness_coeffs(L * 1000.0, model.sections,
                                        sect_id, E, G)
        return R, coeffs

    def entries(R, coeffs, keys):
        """Entry vectors for the requested (B1, B2, 3a+b) keys."""
        out = {}
        for c, i_, j_, v in beams._KPAT_ENTRIES:
            B1, a = divmod(i_, 3)
            B2, b = divmod(j_, 3)
            w = v * coeffs[:, c]
            for r in range(3):
                for s in range(3):
                    key = (B1, B2, 3 * r + s)
                    if key not in keys:
                        continue
                    term = w * R[a][r] * R[b][s]
                    out[key] = out.get(key, 0.0) + term
        return out

    KEYS_ALL = {_entry_key(q, k) for q in range(4) for k in range(36)}

    # ---- variant direct_p: entry vectors on [M] lanes + constant perms ----
    d_mem = jnp.asarray(plan["diag_member"])
    d_end = jnp.asarray(plan["diag_end"])
    d_mask = jnp.asarray(plan["diag_mask"])
    ij_m = jnp.asarray(plan["ij_members"])
    ji_m = jnp.asarray(plan["ji_members"])

    ex_m = jnp.asarray(plan["extra_m"])
    ex_e = jnp.asarray(plan["extra_e"])
    ex_s = jnp.asarray(plan["extra_slot"])
    n_extra = int(plan["extra_m"].shape[0])

    def _extra_vals(e_ii, e_jj, e_ij, e_ji):
        """3rd+ diag contributions of hub nodes (e 0/1) and duplicate
        off-diag edges (e 2/3), gathered on the extras lane."""
        return jnp.where(ex_e == 0, e_ii[ex_m],
                         jnp.where(ex_e == 1, e_jj[ex_m],
                                   jnp.where(ex_e == 2, e_ij[ex_m],
                                             e_ji[ex_m])))

    def one_direct_p(s):
        R, coeffs = geometry_lane(cT1, cT2, model.sect_id, s)
        ent = entries(R, coeffs, KEYS_ALL)
        rows = []
        for k in range(36):
            e_ii = ent.get(_entry_key(0, k), None)
            e_jj = ent.get(_entry_key(3, k), None)
            e_ii = jnp.zeros((M,), jnp.float32) if e_ii is None else e_ii
            e_jj = jnp.zeros((M,), jnp.float32) if e_jj is None else e_jj
            dvec = jnp.where(d_end == 0, e_ii[d_mem], e_jj[d_mem]) * d_mask
            diag = dvec.reshape(N, 2).sum(-1)
            e_ij = ent.get(_entry_key(1, k))
            e_ji = ent.get(_entry_key(2, k))
            e_ij = jnp.zeros((M,), jnp.float32) if e_ij is None else e_ij
            e_ji = jnp.zeros((M,), jnp.float32) if e_ji is None else e_ji
            row = jnp.concatenate([diag, e_ij[ij_m], e_ji[ji_m]])
            if n_extra:
                row = row.at[ex_s].add(_extra_vals(e_ii, e_jj, e_ij, e_ji))
            rows.append(row)
        return jnp.stack(rows, axis=0)                      # [36, nb]

    # ---- variant direct_c: permuted constants, zero runtime gathers -------
    def perm_consts(mem):
        return (jnp.asarray(coordsT[:, conn[mem, 0]]),
                jnp.asarray(coordsT[:, conn[mem, 1]]),
                jnp.asarray(np.asarray(model.sect_id)[mem]))

    dg = perm_consts(plan["diag_member"])
    ijg = perm_consts(plan["ij_members"])
    jig = perm_consts(plan["ji_members"])
    exg = perm_consts(plan["extra_m"]) if n_extra else None

    KEYS_DIAG = {_entry_key(0, k) for k in range(36)} | \
                {_entry_key(3, k) for k in range(36)}
    KEYS_IJ = {_entry_key(1, k) for k in range(36)}
    KEYS_JI = {_entry_key(2, k) for k in range(36)}

    def one_direct_c(s):
        Rd, cd = geometry_lane(dg[0], dg[1], dg[2], s)      # [*, 2N]
        ed = entries(Rd, cd, KEYS_DIAG)
        Ri, ci = geometry_lane(ijg[0], ijg[1], ijg[2], s)   # [*, n_ij]
        ei = entries(Ri, ci, KEYS_IJ)
        Rj, cj = geometry_lane(jig[0], jig[1], jig[2], s)   # [*, n_ji]
        ej = entries(Rj, cj, KEYS_JI)
        # extras lane: hub 3rd+ diag contributions and duplicate edges,
        # geometry evaluated per contribution (tiny: n_extra entries)
        if n_extra:
            Re, ce = geometry_lane(exg[0], exg[1], exg[2], s)
            ee = entries(Re, ce, KEYS_ALL)
            ze = jnp.zeros((n_extra,), jnp.float32)
        zd = jnp.zeros((2 * N,), jnp.float32)
        zi = jnp.zeros((plan["n_ij"],), jnp.float32)
        zj = jnp.zeros((plan["n_ji"],), jnp.float32)
        rows = []
        for k in range(36):
            e_ii = ed.get(_entry_key(0, k), zd)
            e_jj = ed.get(_entry_key(3, k), zd)
            dvec = jnp.where(d_end == 0, e_ii, e_jj) * d_mask
            diag = dvec.reshape(N, 2).sum(-1)
            row = jnp.concatenate([
                diag, ei.get(_entry_key(1, k), zi),
                ej.get(_entry_key(2, k), zj)])
            if n_extra:
                val = jnp.where(ex_e == 0, ee.get(_entry_key(0, k), ze),
                                jnp.where(ex_e == 1,
                                          ee.get(_entry_key(3, k), ze),
                                          jnp.where(ex_e == 2,
                                                    ee.get(_entry_key(1, k),
                                                           ze),
                                                    ee.get(_entry_key(2, k),
                                                           ze))))
                row = row.at[ex_s].add(val)
            rows.append(row)
        return jnp.stack(rows, axis=0)                      # [36, nb]

    # ---- baseline: [36, 4M] lane table + lane gathers ---------------------
    def one_lane_g(s):
        R, coeffs = geometry_lane(cT1, cT2, model.sect_id, s)
        ent = entries(R, coeffs, KEYS_ALL)
        zero = jnp.zeros((M,), jnp.float32)
        rows = [jnp.concatenate([ent.get(_entry_key(q, k), zero)
                                 for q in range(4)])
                for k in range(36)]
        lane = jnp.concatenate(
            [jnp.stack(rows, axis=0), jnp.zeros((36, 1), jnp.float32)], 1)
        g = pattern.gather_idx
        out = lane[:, g[:, 0]] + lane[:, g[:, 1]]
        if pattern.extra_idx.shape[0]:
            out = out.at[:, pattern.extra_slot].add(lane[:, pattern.extra_idx])
        return out

    # ---- parity vs production -------------------------------------------
    prod = assemble_bcsr(
        beams.element_global_stiffness(model.coords, model.conn,
                                       model.sections, model.sect_id, E, G),
        pattern)
    key_prod = (np.asarray(pattern.block_rows).astype(np.int64) * N
                + np.asarray(pattern.block_cols))
    key_new = (plan["block_rows"].astype(np.int64) * N + plan["block_cols"])
    lookup = np.searchsorted(key_prod, key_new)   # prod keys are sorted
    ref = np.asarray(prod.blocks.reshape(nb, 36))[lookup]   # in new order
    scale = np.abs(ref).max()
    for name, fn in [("direct_p", one_direct_p), ("direct_c", one_direct_c),
                     ("lane_g", one_lane_g)]:
        got = np.asarray(fn(jnp.float32(1.0))).T
        if name == "lane_g":
            err = np.abs(np.asarray(prod.blocks.reshape(nb, 36))
                         - got).max() / scale
        else:
            err = np.abs(ref - got).max() / scale
        print(f"{name} rel err {err:.2e}", flush=True)

    B = 32
    scales = jnp.linspace(1.0, 1.01, B, dtype=jnp.float32)

    def unroll(one):
        @jax.jit
        def run(scales):
            acc = jnp.float32(0.0)
            for b in range(B):
                acc = acc + one(scales[b]).sum()
            return acc
        return run

    for name, one in [("empty   ", lambda s: s * 2.0),
                      ("lane_g  ", one_lane_g),
                      ("direct_p", one_direct_p),
                      ("direct_c", one_direct_c)]:
        with jax.default_matmul_precision("highest"):
            t = bench(unroll(one), scales) / B
        print(f"{name}: {t*1e3:7.3f} ms   ({model.n_dof/t/1e9:.3f} GDOF/s)",
              flush=True)


if __name__ == "__main__":
    main()

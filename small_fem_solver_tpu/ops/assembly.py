"""Global stiffness assembly: dense scatter-add and block-sparse (BCSR).

Capability parity with ``FEMSolver._assemble_global_stiffness``
(`/root/reference/JacketAnalysisGUI_v2.py:457-467`), redesigned TPU-first.
The reference scatters each 12x12 element matrix into a dense n_dof x n_dof
numpy array with a Python triple loop; here:

- the *dense* path is one XLA scatter-add of all M*144 contributions
  (fine up to a few thousand DOF, and bit-equivalent to the reference);
- the *block-sparse* path lays K out as 6x6 node blocks in BCSR
  (block compressed sparse row).  The sparsity pattern depends only on
  connectivity, so it is computed once host-side; assembly is then a single
  ``segment_sum`` of per-element 6x6 blocks into their pattern slots, and
  mat-vecs (the hot op of the CG solver) are gather + batched 6x6 matmuls.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def element_dof_indices(conn: jnp.ndarray) -> jnp.ndarray:
    """``dofs[M, 12]``: global DOF indices (6*node + c) for each element
    (`JacketAnalysisGUI_v2.py:462-464`)."""
    c = jnp.arange(6, dtype=conn.dtype)
    d1 = 6 * conn[:, 0:1] + c
    d2 = 6 * conn[:, 1:2] + c
    return jnp.concatenate([d1, d2], axis=-1)


def assemble_dense(K_elems: jnp.ndarray, conn: jnp.ndarray, n_dof: int) -> jnp.ndarray:
    """Dense global K via one scatter-add of all element contributions."""
    dofs = element_dof_indices(conn)
    rows = jnp.broadcast_to(dofs[:, :, None], K_elems.shape)
    cols = jnp.broadcast_to(dofs[:, None, :], K_elems.shape)
    K = jnp.zeros((n_dof, n_dof), dtype=K_elems.dtype)
    return K.at[rows.reshape(-1), cols.reshape(-1)].add(K_elems.reshape(-1))


# ---------------------------------------------------------------------------
# Block CSR (6x6 node blocks)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BCSRPattern:
    """Block sparsity pattern of the global K (host-computed, once per mesh).

    Sizes are static metadata (shapes must be compile-time constants for
    ``segment_sum``); index arrays are device data so the pattern pytree can
    flow through jit.

    block_rows   [n_blocks] int32   block row index of each stored block
    block_cols   [n_blocks] int32   block col index of each stored block
    row_ptr      [n_nodes+1] int64  CSR row pointers
    elem_slot    [M, 4] int32       destination slot of each element's
                                    (ii, ij, ji, jj) block
    """

    block_rows: jnp.ndarray
    block_cols: jnp.ndarray
    row_ptr: jnp.ndarray
    elem_slot: jnp.ndarray
    # TWO-TIER gather plan (padded with 4M -> a zero row): gathers measured
    # 2.3x faster than segment_sum scatter at 100k DOF on TPU, and two
    # gathers cover the first two contributions of every block — on refined
    # meshes that is ALL of the blocks except the few original hub nodes
    # (a flat [n_blocks, max_c] table wasted max_c = 8 full-size gathers on
    # a majority of single-contribution blocks; measured 1.16 -> ~0.4 ms).
    # The leftovers (contribution 3+, only at high-degree nodes) go through
    # one small scatter-add.
    gather_idx: jnp.ndarray | None = None     # [n_blocks, <=2]
    extra_idx: jnp.ndarray | None = None      # [n_extra] contribution rows
    extra_slot: jnp.ndarray | None = None     # [n_extra] destination blocks
    n_nodes: int = dataclasses.field(default=0, metadata=dict(static=True))
    n_blocks: int = dataclasses.field(default=0, metadata=dict(static=True))


def build_bcsr_pattern(conn, n_nodes: int) -> BCSRPattern:
    """Host-side pattern construction from int connectivity (runs once per
    mesh).  Uses the native C++ mesh-kit (O(M) hash map) when built,
    otherwise a numpy sort over the 4M block keys."""
    conn = np.asarray(conn)
    try:
        from ..native import bcsr_pattern_native
        out = bcsr_pattern_native(conn, n_nodes)
    except Exception:
        out = None
    if out is not None:
        block_rows, block_cols, row_ptr, elem_slot = out
        gidx, eidx, eslot = _build_gather_table(np.asarray(elem_slot),
                                                int(block_rows.shape[0]))
        return BCSRPattern(
            block_rows=jnp.asarray(block_rows),
            block_cols=jnp.asarray(block_cols),
            row_ptr=jnp.asarray(row_ptr),
            elem_slot=jnp.asarray(elem_slot),
            gather_idx=jnp.asarray(gidx),
            extra_idx=jnp.asarray(eidx),
            extra_slot=jnp.asarray(eslot),
            n_nodes=int(n_nodes),
            n_blocks=int(block_rows.shape[0]),
        )
    i, j = conn[:, 0].astype(np.int64), conn[:, 1].astype(np.int64)
    # the 4 blocks each element touches: (i,i), (i,j), (j,i), (j,j)
    br = np.concatenate([i, i, j, j])
    bc = np.concatenate([i, j, i, j])
    keys = br * n_nodes + bc
    uniq, inverse = np.unique(keys, return_inverse=True)
    n_blocks = uniq.shape[0]
    block_rows = (uniq // n_nodes).astype(np.int32)
    block_cols = (uniq % n_nodes).astype(np.int32)
    row_ptr = np.zeros(n_nodes + 1, dtype=np.int64)
    np.add.at(row_ptr, block_rows + 1, 1)
    row_ptr = np.cumsum(row_ptr)
    elem_slot = inverse.reshape(4, -1).T.astype(np.int32)  # [M, 4]
    gidx, eidx, eslot = _build_gather_table(elem_slot, n_blocks)
    return BCSRPattern(
        block_rows=jnp.asarray(block_rows),
        block_cols=jnp.asarray(block_cols),
        row_ptr=jnp.asarray(row_ptr),
        elem_slot=jnp.asarray(elem_slot),
        gather_idx=jnp.asarray(gidx),
        extra_idx=jnp.asarray(eidx),
        extra_slot=jnp.asarray(eslot),
        n_nodes=int(n_nodes),
        n_blocks=int(n_blocks),
    )


def _build_gather_table(elem_slot: np.ndarray, n_blocks: int):
    """Two-tier contribution plan (host-side, once per mesh).

    Returns ``(gidx [n_blocks, <=2], extra_idx [n_extra],
    extra_slot [n_extra])``; pad entries of ``gidx`` point at index 4M (a
    zero contribution row).  Contributions 3+ of high-degree blocks land in
    the extras lists (scatter-added; empty arrays when every block has at
    most two contributions)."""
    slots = elem_slot.T.reshape(-1)                        # column-major = the
    # concatenation order of assemble_bcsr's contribution list
    order = np.argsort(slots, kind="stable").astype(np.int64)
    counts = np.bincount(slots, minlength=n_blocks)
    max_c = max(int(counts.max()), 1)
    starts = np.zeros(n_blocks + 1, np.int64)
    starts[1:] = np.cumsum(counts)
    n_tier = min(max_c, 2)
    gidx = np.full((n_blocks, n_tier), slots.size, np.int32)
    for c in range(n_tier):
        sel = counts > c
        gidx[sel, c] = order[starts[:-1][sel] + c]
    extra_idx, extra_slot = [], []
    for c in range(2, max_c):
        sel = np.where(counts > c)[0]
        extra_idx.append(order[starts[:-1][sel] + c])
        extra_slot.append(sel)
    extra_idx = (np.concatenate(extra_idx).astype(np.int32) if extra_idx
                 else np.zeros(0, np.int32))
    extra_slot = (np.concatenate(extra_slot).astype(np.int32) if extra_slot
                  else np.zeros(0, np.int32))
    return gidx, extra_idx, extra_slot


class BCSRMatrix(NamedTuple):
    pattern: BCSRPattern
    blocks: jnp.ndarray          # [n_blocks, 6, 6]


def assemble_bcsr(K_elems: jnp.ndarray, pattern: BCSRPattern) -> BCSRMatrix:
    """Assemble element matrices into BCSR blocks.

    ``K_elems`` is either the stacked ``[M, 12, 12]`` element matrices or
    the pre-split quadrant stack ``[4M, 6, 6]`` in (ii, ij, ji, jj)-major
    order (see :func:`ops.beams.global_stiffness_quadrants`, which lets XLA
    fuse element construction straight into the gathers below with no
    intermediate 12x12 layout round-trip).

    With the pattern's two-tier gather plan: two row-gathers over the 4M
    element sub-blocks cover every block's first two contributions
    (scatter-free; TPU scatters on (6, 6)-shaped rows badly underfill the
    vector tiles — measured 9.3 vs 4.0 ms at 100k DOF), plus one small
    scatter-add for the 3rd+ contributions of high-degree hub blocks.
    Falls back to one ``segment_sum`` for patterns without the plan.
    """
    if K_elems.ndim == 3 and K_elems.shape[-2:] == (12, 12):
        Kii = K_elems[:, 0:6, 0:6]
        Kij = K_elems[:, 0:6, 6:12]
        Kji = K_elems[:, 6:12, 0:6]
        Kjj = K_elems[:, 6:12, 6:12]
        contrib = jnp.concatenate([Kii, Kij, Kji, Kjj], axis=0)    # [4M, 6, 6]
    else:
        contrib = K_elems                                          # [4M, 6, 6]
    if pattern.gather_idx is not None:
        flat = jnp.concatenate(
            [contrib.reshape(-1, 36),
             jnp.zeros((1, 36), contrib.dtype)], axis=0)
        gidx = pattern.gather_idx
        out = flat[gidx[:, 0]]
        for c in range(1, gidx.shape[1]):
            out = out + flat[gidx[:, c]]
        if pattern.extra_idx is not None and pattern.extra_idx.shape[0]:
            out = out.at[pattern.extra_slot].add(flat[pattern.extra_idx])
        return BCSRMatrix(pattern=pattern, blocks=out.reshape(-1, 6, 6))
    slots = jnp.concatenate([pattern.elem_slot[:, 0], pattern.elem_slot[:, 1],
                             pattern.elem_slot[:, 2], pattern.elem_slot[:, 3]])
    blocks = jax.ops.segment_sum(contrib, slots, num_segments=pattern.n_blocks)
    return BCSRMatrix(pattern=pattern, blocks=blocks)


def bcsr_matvec(A: BCSRMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """y = K @ x with x of shape [n_dof] or [n_dof, B] (multi-RHS).

    gather x blocks -> batched 6x6 matmul -> segment-sum back to rows.
    """
    n = A.pattern.n_nodes
    multi = x.ndim == 2
    xb = x.reshape(n, 6, -1)                              # [n, 6, B]
    xg = xb[A.pattern.block_cols]                         # [nb, 6, B]
    yb = jnp.einsum("bij,bjk->bik", A.blocks, xg)         # [nb, 6, B]
    y = jax.ops.segment_sum(yb, A.pattern.block_rows, num_segments=n)
    y = y.reshape(6 * n, -1)
    return y if multi else y[:, 0]


def bcsr_block_diagonal(A: BCSRMatrix) -> jnp.ndarray:
    """The 6x6 diagonal blocks ``[n_nodes, 6, 6]`` (for block-Jacobi PCG)."""
    n = A.pattern.n_nodes
    isdiag = A.pattern.block_rows == A.pattern.block_cols
    contrib = jnp.where(isdiag[:, None, None], A.blocks, 0.0)
    return jax.ops.segment_sum(contrib, A.pattern.block_rows, num_segments=n)


def bcsr_to_dense(A: BCSRMatrix) -> jnp.ndarray:
    """Densify (testing only)."""
    n = A.pattern.n_nodes
    K = jnp.zeros((n, 6, n, 6), dtype=A.blocks.dtype)
    K = K.at[A.pattern.block_rows, :, A.pattern.block_cols, :].set(A.blocks)
    return K.reshape(6 * n, 6 * n)

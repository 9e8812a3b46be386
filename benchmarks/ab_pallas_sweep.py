"""A/B: Pallas fused chain RHS sweep (one launch, factors VMEM-resident)
vs the current two-lax.scan condense_loads.

    python - <<'PY'
    exec(open("benchmarks/ab_pallas_sweep.py").read())
    PY
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.beams import element_stiffness
from small_fem_solver_tpu.ops.condense import (back_substitute,
                                               condense_loads, factor_chains)

S = 360
N_SEG = 32
TS = 128      # phase-tile width (lane multiple)

coarse = sf.default_3leg_jacket(dtype=jnp.float32)
refined = sf.refine_model(coarse, N_SEG)
E = jnp.float32(210000.0)
with jax.default_matmul_precision("highest"):
    Kg, _, _, _ = element_stiffness(refined.coords, refined.conn,
                                    refined.sections, refined.sect_id,
                                    E, E / 2.6)
    fac = jax.jit(lambda K: factor_chains(K, N_SEG))(Kg)
Mc = coarse.n_members
n_int = N_SEG - 1
key = jax.random.PRNGKey(0)
g = jax.random.normal(key, (S, n_int, Mc, 6), jnp.float32)


# --------------------------- current path ---------------------------------
@jax.jit
def current(g):
    with jax.default_matmul_precision("highest"):
        return condense_loads(fac, g)


# --------------------------- pallas kernels -------------------------------
from jax.experimental.pallas import tpu as pltpu

LCH = 8                              # levels per grid chunk
NCH = -(-n_int // LCH)               # chunks (levels padded to NCH*LCH)
NP = NCH * LCH
SP = 384                             # S padded to a lane multiple


def _mm(A, x):                          # [Mc,6,6] @ [Mc,6,TS]
    # broadcast-reduce on the VPU: full f32 (in-kernel dot_general runs
    # bf16 MXU passes -- measured 3e-2 errors; the solver-precision
    # invariant forbids that)
    return jnp.sum(A[..., None] * x[:, None, :, :], axis=2)


def _fwd_kernel(dinvl_ref, dinv_ref, g_ref, y_ref, carry):
    # grid (s_tiles, NCH), chunk fastest; DinvL[0] == 0 so level 0 ignores
    # the (zeroed) carry
    @pl.when(pl.program_id(1) == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    y = carry[...]
    for l in range(LCH):
        y = _mm(dinv_ref[l], g_ref[l]) - _mm(dinvl_ref[l], y)
        y_ref[l] = y
    carry[...] = y


def _bwd_kernel(cprime_ref, y_ref, v_ref, carry):
    # chunks iterate REVERSED via the index maps; padded levels have
    # Cprime == 0 and y == 0, so the recursion self-starts
    @pl.when(pl.program_id(1) == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    v = carry[...]
    for l in range(LCH - 1, -1, -1):
        v = y_ref[l] - _mm(cprime_ref[l], v)
        v_ref[l] = v
    carry[...] = v


def _pad_levels(x):
    return jnp.pad(x, ((0, NP - n_int),) + ((0, 0),) * (x.ndim - 1))


@jax.jit
def pallas_sweep(g):
    gT = jnp.moveaxis(g, 0, -1).reshape(n_int, Mc, 6, S)  # phases last
    gT = _pad_levels(jnp.pad(gT, ((0, 0), (0, 0), (0, 0), (0, SP - S))))
    grid = (SP // TS, NCH)
    fac_f = pl.BlockSpec((LCH, Mc, 6, 6), lambda s, c: (c, 0, 0, 0))
    io_f = pl.BlockSpec((LCH, Mc, 6, TS), lambda s, c: (c, 0, 0, s))
    fac_b = pl.BlockSpec((LCH, Mc, 6, 6),
                         lambda s, c: (NCH - 1 - c, 0, 0, 0))
    io_b = pl.BlockSpec((LCH, Mc, 6, TS),
                        lambda s, c: (NCH - 1 - c, 0, 0, s))
    scratch = [pltpu.VMEM((Mc, 6, TS), jnp.float32)]
    yT = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[fac_f, fac_f, io_f],
        out_specs=io_f,
        out_shape=jax.ShapeDtypeStruct((NP, Mc, 6, SP), jnp.float32),
        scratch_shapes=scratch,
    )(_pad_levels(fac.DinvL), _pad_levels(fac.Dinv), gT)
    vT = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[fac_b, io_b],
        out_specs=io_b,
        out_shape=jax.ShapeDtypeStruct((NP, Mc, 6, SP), jnp.float32),
        scratch_shapes=scratch,
    )(_pad_levels(fac.Cprime), yT)
    vT = vT[:n_int, ..., :S]
    with jax.default_matmul_precision("highest"):
        fI = -jnp.einsum("mij,mjs->smi", fac.B0, vT[0])
        fJ = -jnp.einsum("mij,mjs->smi", fac.Cn, vT[-1])
    return fI, fJ, jnp.moveaxis(vT, -1, 0)


def bench(name, fn, rounds=5, n=20):
    out = fn(g)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        last = None
        for _ in range(n):
            last = fn(g)
        jax.block_until_ready(last)
        best = min(best, (time.time() - t0) / n)
    print(f"  {name:<30} {best*1e3:7.3f} ms")
    return out


a = bench("condense_loads (2 lax.scans)", current)
b = bench("pallas fused sweep", pallas_sweep)
for x, yv, lbl in zip(a, b, ["fI", "fJ", "v"]):
    rel = np.abs(np.asarray(x) - np.asarray(yv)).max() \
        / max(np.abs(np.asarray(x)).max(), 1e-30)
    print(f"  agreement {lbl}: {rel:.2e}")


# ---------------- XLA block-diag MXU variant (no pallas) -------------------
def _blockdiag(F):
    # [n_int, Mc, 6, 6] -> [n_int, 306, 306] block-diagonal
    n, M = F.shape[0], F.shape[1]
    out = jnp.zeros((n, M * 6, M * 6), F.dtype)
    r = jnp.arange(M)
    return out.at[:, r[:, None, None] * 6 + jnp.arange(6)[None, :, None],
                  r[:, None, None] * 6 + jnp.arange(6)[None, None, :]].set(F)


BD_DinvL = jax.jit(_blockdiag)(fac.DinvL)
BD_Dinv = jax.jit(_blockdiag)(fac.Dinv)
BD_Cprime = jax.jit(_blockdiag)(fac.Cprime)


@jax.jit
def xla_blockdiag(g):
    with jax.default_matmul_precision("highest"):
        gT = jnp.moveaxis(g, 1, 0).reshape(n_int, S, Mc * 6)  # [n_int,S,306]

        def fwd(y_prev, inp):
            Dl, Dv, gp = inp
            y = gp @ Dv.T - y_prev @ Dl.T
            return y, y

        _, y = jax.lax.scan(fwd, jnp.zeros_like(gT[0]),
                            (BD_DinvL, BD_Dinv, gT))

        def bwd(v_next, inp):
            Cp, yp = inp
            v = yp - v_next @ Cp.T
            return v, v

        _, v = jax.lax.scan(bwd, jnp.zeros_like(y[0]), (BD_Cprime, y),
                            reverse=True)
        vM = v.reshape(n_int, S, Mc, 6)
        fI = -jnp.einsum("mij,smj->smi", fac.B0, vM[0])
        fJ = -jnp.einsum("mij,smj->smi", fac.Cn, vM[-1])
        return fI, fJ, jnp.moveaxis(vM, 0, 1)


c = bench("xla block-diag MXU scans", xla_blockdiag)
for x, yv, lbl in zip(a, c, ["fI", "fJ", "v"]):
    rel = np.abs(np.asarray(x) - np.asarray(yv)).max() \
        / max(np.abs(np.asarray(x)).max(), 1e-30)
    print(f"  agreement {lbl}: {rel:.2e}")

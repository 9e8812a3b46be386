"""A/B: chain RHS sweeps, phase-axis-last (lane-major) vs current layout.

The current condense_loads/back_substitute operate on [S, n_int, Mc, 6]
tensors whose minor dim (6) badly underfills the TPU's (8, 128) vector
tiles. The candidate keeps phases LAST: [n_int, Mc, 6, S] turns every
scan step into a batched [6,6] x [6,S] matmul (S on lanes). In-process
A/B is valid under relay contention (min over rounds, one process).

    python - <<'PY'
    exec(open("benchmarks/ab_lane_major.py").read())
    PY
"""
import time

import jax
import jax.numpy as jnp

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.beams import element_stiffness
from small_fem_solver_tpu.ops.condense import (back_substitute,
                                               condense_loads, factor_chains)

S = 360
N_SEG = 32

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
uI = jax.random.normal(key, (S, Mc, 6), jnp.float32)
uJ = jax.random.normal(key, (S, Mc, 6), jnp.float32)


@jax.jit
def current(g, uI, uJ):
    with jax.default_matmul_precision("highest"):
        fI, fJ, v_g = condense_loads(fac, g)
        v = back_substitute(fac, v_g, uI, uJ)
        return fI, fJ, v


@jax.jit
def lane_major(g, uI, uJ):
    with jax.default_matmul_precision("highest"):
        gT = jnp.moveaxis(g, 0, -1)                       # [n_int, Mc, 6, S]

        def fwd(y_prev, inp):
            DinvLp, Dinvp, gp = inp
            y = Dinvp @ gp - DinvLp @ y_prev              # [Mc, 6, S]
            return y, y

        _, y = jax.lax.scan(fwd, jnp.zeros_like(gT[0]),
                            (fac.DinvL, fac.Dinv, gT))

        def bwd(v_next, inp):
            cprime, yp = inp
            v = yp - cprime @ v_next
            return v, v

        _, vT = jax.lax.scan(bwd, jnp.zeros_like(y[0]), (fac.Cprime, y),
                             reverse=True)
        uIT = jnp.moveaxis(uI, 0, -1)                     # [Mc, 6, S]
        uJT = jnp.moveaxis(uJ, 0, -1)
        fI = -jnp.moveaxis(fac.B0 @ vT[0], -1, 0)
        fJ = -jnp.moveaxis(fac.Cn @ vT[-1], -1, 0)
        v = vT - jnp.einsum("pmij,mjs->pmis", fac.Z0, uIT) \
            - jnp.einsum("pmij,mjs->pmis", fac.Zn, uJT)
        return fI, fJ, jnp.moveaxis(v, -1, 0)


def bench(name, fn, rounds=5, n=20):
    out = fn(g, uI, uJ)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        last = None
        for _ in range(n):
            last = fn(g, uI, uJ)
        jax.block_until_ready(last)
        best = min(best, (time.time() - t0) / n)
    print(f"  {name:<26} {best*1e3:7.2f} ms")
    return out


import numpy as np

a = bench("current [S,...,6]", current)
b = bench("lane-major [...,6,S]", lane_major)
for x, yv, lbl in zip(a, b, ["fI", "fJ", "v"]):
    yv2 = np.moveaxis(np.asarray(yv), -1, 0) if lbl == "v" and np.asarray(yv).shape != np.asarray(x).shape else np.asarray(yv)
    rel = np.abs(np.asarray(x) - yv2).max() / max(np.abs(np.asarray(x)).max(), 1e-30)
    print(f"  agreement {lbl}: {rel:.2e}")

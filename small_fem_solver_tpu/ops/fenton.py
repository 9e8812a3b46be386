"""Fenton stream-function wave theory (fully nonlinear), pure jnp.

Capability parity with the reference's raschii ``FentonWave`` path
(`/root/reference/JacketAnalysisGUI_v2.py:234-242`), implemented from the
published method: M.M. Rienecker & J.D. Fenton, "A Fourier approximation
method for steady water waves", J. Fluid Mech. 104 (1981), as refined in
Fenton, "The numerical solution of steady water wave problems", Computers &
Geosciences 14 (1988).

TPU-first design: the nonlinear collocation system is solved by a
fixed-iteration Newton method written in jnp (Jacobian via ``jax.jacfwd``,
dense solve) with wave-height continuation for steep waves — so wave *setup*
is itself jittable and vmappable over (H, T) case batches, and the result is
lowered to the same canonical :class:`FourierWave` coefficient pytree every
other model uses.  Evaluation therefore shares the one batched kinematics
kernel.

Formulation (wave frame, z measured from the sea bed, theta = k x):

    psi(x, z) = B0 z + sum_j B_j sinh(j k z)/cosh(j k d) cos(j theta)
    u_f = dpsi/dz,  w_f = -dpsi/dx,   B0 = -c  (zero mean Eulerian current,
    Stokes' first definition — the raschii default the reference relies on)

Unknowns  q = [eta_0..eta_M, B_1..B_N, B0, k, Q, R]  with M = N collocation
points over half a wavelength (theta_m = m pi / M; the wave is symmetric).
Equations:

    KFSBC   psi(x_m, eta_m) = Q                       (M+1)
    DFSBC   (u_f^2 + w_f^2)/2 + g eta_m = R           (M+1)
    mean    trapezoid mean of eta = d                  (1)
    height  eta_0 - eta_M = H                          (1)
    period  -B0 k = omega                              (1)

After the solve, the fixed-frame velocity u = u_f + c gives the canonical
coefficients U_hat_j = j k B_j, and the surface cosine coefficients E_j come
from the type-I discrete cosine transform of eta_m - d (exact for the M-mode
collocation representation).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import G_GRAV
from .dispersion import solve_dispersion
from .waves import FourierWave


def _residual(q, d, H, omega, M, g):
    """The 2M+5 collocation equations; q = [eta(M+1), B(N=M), B0, k, Q, R]."""
    eta = q[: M + 1]
    B = q[M + 1: 2 * M + 1]
    B0 = q[2 * M + 1]
    k = q[2 * M + 2]
    Q = q[2 * M + 3]
    R = q[2 * M + 4]

    j = jnp.arange(1, M + 1, dtype=q.dtype)            # [N]
    theta = jnp.pi * jnp.arange(M + 1, dtype=q.dtype) / M  # [M+1]
    cjt = jnp.cos(jnp.outer(theta, j))                 # [M+1, N]
    sjt = jnp.sin(jnp.outer(theta, j))

    # hyperbolic profiles at the (unknown) surface heights, normalized by
    # cosh(j k d) for overflow safety (eta ~ d, so the ratio is O(1))
    A = j * k * eta[:, None]
    Bd = j * k * d
    scale = jnp.exp(A - Bd) / (1.0 + jnp.exp(-2.0 * Bd))
    Cj = scale * (1.0 + jnp.exp(-2.0 * A))             # cosh(jk eta)/cosh(jkd)
    Sj = scale * (1.0 - jnp.exp(-2.0 * A))             # sinh(jk eta)/cosh(jkd)

    psi = B0 * eta + (Sj * cjt) @ B
    u_f = B0 + ((j * k) * Cj * cjt) @ B
    w_f = ((j * k) * Sj * sjt) @ B

    r_kfsbc = psi - Q
    r_dfsbc = 0.5 * (u_f**2 + w_f**2) + g * eta - R
    r_mean = (0.5 * eta[0] + jnp.sum(eta[1:M]) + 0.5 * eta[M]) / M - d
    r_height = eta[0] - eta[M] - H
    r_period = -B0 * k - omega
    return jnp.concatenate([
        r_kfsbc, r_dfsbc,
        jnp.stack([r_mean, r_height, r_period]),
    ])


def _initial_guess(H, T, d, M, dtype):
    omega = 2.0 * jnp.pi / T
    k = solve_dispersion(omega, d)
    c = omega / k
    a = H / 2.0
    theta = jnp.pi * jnp.arange(M + 1, dtype=dtype) / M
    eta = d + a * jnp.cos(theta)
    B = jnp.zeros((M,), dtype=dtype)
    # linear-theory B_1: u = a omega cosh(kz)/sinh(kd) cos -> j k B1 / cosh(kd)
    B = B.at[0].set(a * omega / (k * jnp.tanh(k * d)))
    B0 = -c
    Q = B0 * d
    R = 0.5 * B0**2 + G_GRAV * d
    return jnp.concatenate([eta, B, jnp.stack([B0, k, Q, R])])


@partial(jax.jit, static_argnames=("M", "n_newton", "n_cont"))
def _solve_fenton(H, T, d, M: int, n_newton: int = 12, n_cont: int = 10):
    """Height-continuation Newton solve; returns the unknown vector q.

    Wave height is ramped 0 -> H in ``n_cont`` steps (Rienecker & Fenton's
    recommendation for steep waves); each step runs ``n_newton`` full Newton
    iterations with the exact jacfwd Jacobian.
    """
    dtype = jnp.result_type(H, T, d, 1.0)
    H = jnp.asarray(H, dtype=dtype)
    T = jnp.asarray(T, dtype=dtype)
    d = jnp.asarray(d, dtype=dtype)
    g = jnp.asarray(G_GRAV, dtype=dtype)
    omega = 2.0 * jnp.pi / T

    q0 = _initial_guess(H / n_cont, T, d, M, dtype)

    def newton_step(q, Hi):
        r = _residual(q, d, Hi, omega, M, g)
        J = jax.jacfwd(_residual)(q, d, Hi, omega, M, g)
        return q - jnp.linalg.solve(J, r)

    def cont_step(q, i):
        Hi = H * (i + 1.0) / n_cont
        q = jax.lax.fori_loop(0, n_newton, lambda _, qq: newton_step(qq, Hi), q)
        return q, None

    q, _ = jax.lax.scan(cont_step, q0, jnp.arange(n_cont, dtype=dtype))
    return q


def fenton_wave(H, T, d, U_c=0.0, N: int = 10, n_modes: int | None = None,
                dtype=jnp.float64, n_newton: int = 12,
                n_cont: int = 10, check: bool = True) -> FourierWave:
    """Fully nonlinear stream-function wave in canonical Fourier form.

    ``N`` is the number of Fourier modes / collocation intervals (the
    reference passes raschii N=10-20 chosen from steepness,
    `JacketAnalysisGUI_v2.py:234`).  ``check=True`` verifies the collocation
    residual host-side and raises for non-converged (e.g. above-breaking)
    waves, mirroring the reference's behavior of surfacing raschii failures
    as errors; pass ``check=False`` inside jit/vmap contexts.
    """
    M = int(N)
    # The collocation Newton needs float64 (the Jacobian is ill-conditioned
    # near steep crests); run the setup solve on CPU in f64 regardless of the
    # session/backend dtype, then cast the resulting coefficients to the
    # requested evaluation dtype.  This mirrors the reference, where wave
    # setup happens once per case on the host (raschii's internal solve,
    # `JacketAnalysisGUI_v2.py:234-242`), while *evaluation* stays on-device.
    with jax.enable_x64(True), jax.default_device(jax.devices("cpu")[0]):
        q = _solve_fenton(jnp.asarray(float(H), dtype=jnp.float64),
                          jnp.asarray(float(T), dtype=jnp.float64),
                          jnp.asarray(float(d), dtype=jnp.float64), M,
                          n_newton=n_newton, n_cont=n_cont)
        q = np.asarray(q)
    wave = fenton_wave_from_solution(jnp.asarray(q, dtype=dtype), H, T, d,
                                     U_c, M, n_modes=n_modes, dtype=dtype)
    if check:
        g = G_GRAV
        omega = 2.0 * np.pi / float(T)
        with jax.enable_x64(True), jax.default_device(jax.devices("cpu")[0]):
            r = np.asarray(_residual(jnp.asarray(q, dtype=jnp.float64),
                                     jnp.asarray(float(d), dtype=jnp.float64),
                                     jnp.asarray(float(H), dtype=jnp.float64),
                                     omega, M,
                                     jnp.asarray(g, dtype=jnp.float64)))
        scale = max(g * float(d), 1.0)
        if not np.isfinite(r).all() or np.abs(r).max() > 1e-6 * scale:
            raise ValueError(
                f"Fenton stream-function solve did not converge for H={H}, "
                f"T={T}, d={d} (residual {np.abs(r).max():.2e}); the wave may "
                f"exceed the breaking limit")
    return wave


def fenton_wave_from_solution(q, H, T, d, U_c, M: int,
                              n_modes: int | None = None,
                              dtype=jnp.float64) -> FourierWave:
    """Lower a collocation solution vector to the canonical FourierWave."""
    eta = q[: M + 1]
    B = q[M + 1: 2 * M + 1]
    k = q[2 * M + 2]
    omega = 2.0 * jnp.pi / jnp.asarray(T, dtype=dtype)
    c = omega / k

    # E_j: type-I DCT of eta - d over the half-wavelength collocation grid.
    # The inverse DCT-I carries a 1/2 weight on the j = M (Nyquist) term, so
    # its forward coefficient takes 1/M, not 2/M — without the halving the
    # reconstructed surface misses the collocation heights by O(mm).
    j = jnp.arange(1, M + 1, dtype=dtype)
    theta = jnp.pi * jnp.arange(M + 1, dtype=dtype) / M
    w = jnp.ones((M + 1,), dtype=dtype).at[0].set(0.5).at[M].set(0.5)
    E = (2.0 / M) * jnp.einsum("m,mj->j", w * (eta - d), jnp.cos(jnp.outer(theta, j)))
    E = E.at[-1].multiply(0.5)
    U = j * k * B

    n_modes = n_modes or M
    if n_modes > M:
        pad = jnp.zeros((n_modes - M,), dtype=dtype)
        E = jnp.concatenate([E, pad])
        U = jnp.concatenate([U, pad])
    elif n_modes < M:
        raise ValueError("n_modes must be >= N")

    return FourierWave(
        k=k, omega=omega, c=c, d=jnp.asarray(d, dtype=dtype),
        U_c=jnp.asarray(U_c, dtype=dtype), H=jnp.asarray(H, dtype=dtype),
        T=jnp.asarray(T, dtype=dtype), E=E, U=U,
        clamp_z=True, model="fenton", order=M,
    )

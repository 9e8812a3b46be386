"""Linear dispersion relation solver, pure jnp and batchable.

Replaces the reference's scalar Newton loop ``RaschiiWave._solve_dispersion``
(`/root/reference/JacketAnalysisGUI_v2.py:197-206`) with a fixed-count Newton
iteration expressed as ``lax.fori_loop`` so it jits, vmaps over wave-case
batches, and differentiates (Newton's fixed point is implicit-function
friendly).  Identical iteration function and start point as the reference:

    k0 = omega^2 / g
    f  = omega^2 - g k tanh(k d)
    f' = -g (tanh(k d) + k d / cosh(k d)^2)

The reference stops once |dk| < 1e-10; after convergence further Newton
steps are ~machine-epsilon no-ops, so a fixed 50 iterations reproduces its
result to well below the 1e-8 parity bar.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import G_GRAV


def solve_dispersion(omega, d, n_iter: int = 50):
    """Wavenumber k satisfying omega^2 = g k tanh(k d). Batched over inputs."""
    omega = jnp.asarray(omega)
    d = jnp.asarray(d)
    g = jnp.asarray(G_GRAV, dtype=jnp.result_type(omega, d))
    k0 = omega**2 / g

    def body(_, k):
        kd = k * d
        th = jnp.tanh(kd)
        f = omega**2 - g * k * th
        df = -g * (th + kd / jnp.cosh(kd) ** 2)
        return k - f / df

    return jax.lax.fori_loop(0, n_iter, body, k0)


def apparent_period(T, d, U_along, n_iter: int = 50):
    """Apparent (intrinsic) wave period seen in the frame moving with the
    current — the API RP 2A wave-current Doppler correction.

    A wave of absolute period ``T`` (earth frame) riding a uniform current
    ``U_along`` (the current component ALONG the wave direction,
    U_c cos(wave_dir - current_dir); positive = following) satisfies the
    current-modified dispersion relation

        (omega_a - k U)^2 = g k tanh(k d),   omega_a = 2 pi / T,

    and the wave theory should be evaluated with the intrinsic period
    T_app = 2 pi / (omega_a - k U) (longer for following current, shorter
    and steeper for opposing).  The reference ignores this coupling (it
    adds the current to the kinematics only, `JacketAnalysisGUI_v2.py:281`);
    build the wave with ``make_wave(H, apparent_period(T, d, U), d, U_c)``
    or pass ``--doppler`` on the CLI.  Solved by fixed-count Newton on k
    (batched/differentiable like :func:`solve_dispersion`).

    Opposing currents have a blocking limit (group velocity = |U|); beyond
    it no steady wave exists and the Newton diverges — validity requires
    omega_a + k U > 0, checked by the caller-facing ``make_wave`` path.
    """
    T = jnp.asarray(T)
    d = jnp.asarray(d)
    U = jnp.asarray(U_along)
    dtype = jnp.result_type(T, d, U, 1.0)
    g = jnp.asarray(G_GRAV, dtype=dtype)
    omega_a = 2.0 * jnp.pi / T
    k0 = omega_a**2 / g

    def body(_, k):
        kd = k * d
        th = jnp.tanh(kd)
        wi = omega_a - k * U
        f = wi**2 - g * k * th
        df = -2.0 * wi * U - g * (th + kd / jnp.cosh(kd) ** 2)
        return k - f / df

    k = jax.lax.fori_loop(0, n_iter, body, k0)
    return 2.0 * jnp.pi / (omega_a - k * U)

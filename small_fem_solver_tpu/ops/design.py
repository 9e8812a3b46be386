"""Differentiable design: section sensitivities and gradient-based sizing.

A capability no user of the reference tool has, and the payoff of building
the WHOLE pipeline (wave kinematics -> Morison -> FEM -> von Mises) as pure
JAX: the analysis is differentiable end-to-end, so the derivative of any
response quantity with respect to any design parameter is one
``jax.grad`` — through the Fourier kinematics, the quadrature, the element
stiffness, the Cholesky solve and the stress recovery.  Uses:

- :func:`section_sensitivities` — d(max utilization)/d(D, t) and
  d(mass)/d(D, t) for EVERY section group in one reverse pass;
- :func:`optimize_sections` — projected gradient descent sizing all wall
  thicknesses to a target utilization at minimum structural mass.

Both work for any number of section groups (the reference's default layout
has two, leg/brace, but imported/JSON models may carry more).  The
governing-member max is optionally smoothed with a temperature-scaled
logsumexp so the optimizer does not chatter when the critical member flips.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .sections import tube_sections
from .solve import free_fixed_dofs


def _mass_t(model, D, t):
    """Structural mass [t] — depends only on sections and lengths (no FEM)."""
    sections = tube_sections(D, t, model.sections.rho_steel)
    L = model.member_geometry()[3]
    return jnp.sum(sections.mass_per_m[model.sect_id] * L) / 1000.0


def _respond(model, wave, case, D, t, n_gauss, accel, free, fixed, tau):
    """(util_soft, mass_t, utilization) for per-group section arrays
    ``D``/``t`` [n_sections] (mm)."""
    from ..api import _analyze_impl

    sections = tube_sections(D, t, model.sections.rho_steel)
    m = dataclasses.replace(model, sections=sections)
    res = _analyze_impl(m, wave, case, "chol", n_gauss, accel, free, fixed,
                        None, 1e-10, 2000)
    util = res.utilization
    if tau is None:
        util_max = jnp.max(util)
    else:
        util_max = tau * jax.scipy.special.logsumexp(util / tau)
    mass_t = jnp.sum(sections.mass_per_m[m.sect_id] * res.length_m) / 1000.0
    return util_max, mass_t, util


class SectionSensitivities(NamedTuple):
    """Gradients w.r.t. the interleaved section parameter vector
    ``(D_0, t_0, D_1, t_1, ...)`` — for the standard 2-section leg/brace
    layout that is exactly ``(D_leg, t_leg, D_brace, t_brace)`` — all in
    per-mm."""

    dutil: jnp.ndarray        # [2 n_sections] d(max utilization)/d(param)
    dmass_t: jnp.ndarray      # [2 n_sections] d(structural mass [t])/d(param)
    util_max: jnp.ndarray
    mass_t: jnp.ndarray


def section_sensitivities(model, wave, case, n_gauss: int = 15,
                          accel: str = "analytic",
                          tau: float | None = None) -> SectionSensitivities:
    """One reverse-mode pass through the full analysis, any section count.

    ``tau`` smooths the member max with a logsumexp of that temperature
    (None = hard max; its gradient is the governing member's, which is the
    correct sensitivity almost everywhere).
    """
    free_np, fixed_np = free_fixed_dofs(model.fixed_mask)
    free, fixed = jnp.asarray(free_np), jnp.asarray(fixed_np)
    dtype = model.coords.dtype
    case = case.cast(dtype)
    # interleaved (D_i, t_i) parameter vector [2n]
    params = jnp.stack([model.sections.D_outer,
                        model.sections.t], axis=-1).reshape(-1)

    @jax.jit
    def val_and_grads(params):
        with jax.default_matmul_precision("highest"):
            def f_util(p):
                return _respond(model, wave, case, p[0::2], p[1::2],
                                n_gauss, accel, free, fixed, tau)[0]

            # one differentiated FEM pass for utilization; the mass gradient
            # needs no FEM (sections x lengths only)
            (u, du) = jax.value_and_grad(f_util)(params)
            (mt, dm) = jax.value_and_grad(
                lambda p: _mass_t(model, p[0::2], p[1::2]))(params)
            return u, du, mt, dm

    u, du, mt, dm = val_and_grads(params)
    return SectionSensitivities(dutil=du, dmass_t=dm, util_max=u, mass_t=mt)


class SizingResult(NamedTuple):
    t: jnp.ndarray            # [n_sections] optimized wall thicknesses [mm]
    t_leg: jnp.ndarray        # = t[0] (kept for the standard 2-section layout)
    t_brace: jnp.ndarray      # = t[-1]
    util_max: jnp.ndarray
    mass_t: jnp.ndarray
    history: np.ndarray       # [n_iter, n_sections + 2] (t..., util, mass)


def optimize_sections(model, wave, case, target_util: float = 0.8,
                      n_iter: int = 60, lr: float = 2.0,
                      t_bounds=(10.0, 120.0), penalty: float = 200.0,
                      n_gauss: int = 15, accel: str = "analytic",
                      tau: float = 0.02) -> SizingResult:
    """Size ALL section-group wall thicknesses by projected gradient descent.

    Minimizes NORMALIZED structural mass (mass / starting mass) with a
    quadratic penalty on exceeding ``target_util``; thicknesses are
    projected to ``t_bounds`` and to the thin-wall validity limit D/t > 10
    after each step.  Diameters are held fixed (change the model's sections
    to size them too).  Each iteration is ONE differentiated full analysis,
    whatever the number of section groups (the gradient vector just grows).
    """
    free_np, fixed_np = free_fixed_dofs(model.fixed_mask)
    free, fixed = jnp.asarray(free_np), jnp.asarray(fixed_np)
    dtype = model.coords.dtype
    case = case.cast(dtype)
    D = model.sections.D_outer                            # [n] fixed
    n_sect = int(np.asarray(D).shape[0])
    m0 = float(jnp.sum(model.sections.mass_per_m[model.sect_id]
                       * model.member_geometry()[3]) / 1000.0)

    @jax.jit
    def step(t, step_len):
        with jax.default_matmul_precision("highest"):
            def loss(tt):
                u, m, _ = _respond(model, wave, case, D, tt, n_gauss,
                                   accel, free, fixed, tau)
                return (m / m0
                        + penalty * jnp.maximum(u - target_util, 0.0) ** 2,
                        (u, m))

            (val, (u, m)), g = jax.value_and_grad(loss, has_aux=True)(t)
            # normalized (sign-like) step: the raw gradient scale is
            # ~1e-2 /mm, so a fixed step length in mm with decay converges
            # in tens of iterations regardless of the penalty balance
            gn = g / jnp.maximum(jnp.linalg.norm(g), 1e-12)
            tt = t - step_len * gn
            # projections: bounds and thin-wall validity D/t > 10
            tt = jnp.clip(tt, t_bounds[0], t_bounds[1])
            tt = jnp.minimum(tt, D / 10.0 - 1e-6)
            return tt, u, m

    t = model.sections.t
    hist = np.zeros((n_iter, n_sect + 2))
    for i in range(n_iter):
        step_len = lr * (1.0 - 0.9 * i / n_iter)   # decaying step [mm]
        t, u, m = step(t, jnp.asarray(step_len, dtype))
        # (u, m) describe the PRE-step design; history records the pair that
        # was actually evaluated together
        hist[i] = list(np.asarray(t)) + [float(u), float(m)]

    # evaluate the RETURNED design (hist carries the pre-step responses, so
    # the final thicknesses would otherwise be reported with the previous
    # iterate's utilization/mass)
    u_fin, m_fin, _ = _respond(model, wave, case, D, t, n_gauss, accel,
                               free, fixed, None)
    return SizingResult(t=t, t_leg=t[0], t_brace=t[-1],
                        util_max=u_fin, mass_t=m_fin, history=hist)

"""Differentiable design: section sensitivities and gradient-based sizing.

A capability no user of the reference tool has, and the payoff of building
the WHOLE pipeline (wave kinematics -> Morison -> FEM -> von Mises) as pure
JAX: the analysis is differentiable end-to-end, so the derivative of any
response quantity with respect to any design parameter is one
``jax.grad`` — through the Fourier kinematics, the quadrature, the element
stiffness, the Cholesky solve and the stress recovery.  Uses:

- :func:`section_sensitivities` — d(max utilization)/d(D, t) and
  d(mass)/d(D, t) for the leg and brace sections in one reverse pass;
- :func:`optimize_sections` — projected gradient descent sizing the wall
  thicknesses to a target utilization at minimum structural mass.

The governing-member max is optionally smoothed with a temperature-scaled
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


def _check_two_sections(model):
    if np.asarray(model.sections.D_outer).shape[0] != 2:
        raise ValueError(
            "design sensitivities/sizing parameterize the standard "
            "2-section (leg/brace) layout; this model carries "
            f"{np.asarray(model.sections.D_outer).shape[0]} sections")


def _mass_t(model, params):
    """Structural mass [t] — depends only on sections and lengths (no FEM)."""
    D_leg, t_leg, D_brace, t_brace = params
    sections = tube_sections(jnp.stack([D_leg, D_brace]),
                             jnp.stack([t_leg, t_brace]),
                             model.sections.rho_steel)
    L = model.member_geometry()[3]
    return jnp.sum(sections.mass_per_m[model.sect_id] * L) / 1000.0


def _respond(model, wave, case, params, n_gauss, accel, free, fixed, tau):
    """(util_soft, mass_t, utilization) for section params
    (D_leg, t_leg, D_brace, t_brace) [mm]."""
    from ..api import _analyze_impl

    D_leg, t_leg, D_brace, t_brace = params
    sections = tube_sections(jnp.stack([D_leg, D_brace]),
                             jnp.stack([t_leg, t_brace]),
                             model.sections.rho_steel)
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
    """Gradients w.r.t. (D_leg, t_leg, D_brace, t_brace), all in per-mm."""

    dutil: jnp.ndarray        # [4] d(max utilization)/d(param)
    dmass_t: jnp.ndarray      # [4] d(structural mass [t])/d(param)
    util_max: jnp.ndarray
    mass_t: jnp.ndarray


def section_sensitivities(model, wave, case, n_gauss: int = 15,
                          accel: str = "analytic",
                          tau: float | None = None) -> SectionSensitivities:
    """One reverse-mode pass through the full analysis.

    ``tau`` smooths the member max with a logsumexp of that temperature
    (None = hard max; its gradient is the governing member's, which is the
    correct sensitivity almost everywhere).
    """
    _check_two_sections(model)
    free_np, fixed_np = free_fixed_dofs(model.fixed_mask)
    free, fixed = jnp.asarray(free_np), jnp.asarray(fixed_np)
    dtype = model.coords.dtype
    case = case.cast(dtype)
    params = jnp.stack([model.sections.D_outer[0], model.sections.t[0],
                        model.sections.D_outer[1], model.sections.t[1]])

    @jax.jit
    def val_and_grads(params):
        with jax.default_matmul_precision("highest"):
            def f_util(p):
                return _respond(model, wave, case, p, n_gauss, accel, free,
                                fixed, tau)[0]

            # one differentiated FEM pass for utilization; the mass gradient
            # needs no FEM (sections x lengths only)
            (u, du) = jax.value_and_grad(f_util)(params)
            (mt, dm) = jax.value_and_grad(lambda p: _mass_t(model, p))(params)
            return u, du, mt, dm

    u, du, mt, dm = val_and_grads(params)
    return SectionSensitivities(dutil=du, dmass_t=dm, util_max=u, mass_t=mt)


class SizingResult(NamedTuple):
    t_leg: jnp.ndarray
    t_brace: jnp.ndarray
    util_max: jnp.ndarray
    mass_t: jnp.ndarray
    history: np.ndarray       # [n_iter, 4] (t_leg, t_brace, util, mass)


def optimize_sections(model, wave, case, target_util: float = 0.8,
                      n_iter: int = 60, lr: float = 2.0,
                      t_bounds=(10.0, 120.0), penalty: float = 200.0,
                      n_gauss: int = 15, accel: str = "analytic",
                      tau: float = 0.02) -> SizingResult:
    """Size the leg/brace wall thicknesses by projected gradient descent.

    Minimizes NORMALIZED structural mass (mass / starting mass) with a
    quadratic penalty on exceeding ``target_util``; thicknesses are
    projected to ``t_bounds`` and to the thin-wall validity limit D/t > 10
    after each step.  Diameters are held fixed (change the model's sections
    to size them too).  Each iteration is ONE differentiated full analysis.
    """
    _check_two_sections(model)
    free_np, fixed_np = free_fixed_dofs(model.fixed_mask)
    free, fixed = jnp.asarray(free_np), jnp.asarray(fixed_np)
    dtype = model.coords.dtype
    case = case.cast(dtype)
    D_leg = model.sections.D_outer[0]
    D_brace = model.sections.D_outer[1]
    m0 = float(jnp.sum(model.sections.mass_per_m[model.sect_id]
                       * model.member_geometry()[3]) / 1000.0)

    @jax.jit
    def step(t_leg, t_brace, step_len):
        with jax.default_matmul_precision("highest"):
            def loss(tt):
                params = jnp.stack([D_leg, tt[0], D_brace, tt[1]])
                u, m, _ = _respond(model, wave, case, params, n_gauss,
                                   accel, free, fixed, tau)
                return (m / m0
                        + penalty * jnp.maximum(u - target_util, 0.0) ** 2,
                        (u, m))

            (val, (u, m)), g = jax.value_and_grad(loss, has_aux=True)(
                jnp.stack([t_leg, t_brace]))
            # normalized (sign-like) step: the raw gradient scale is
            # ~1e-2 /mm, so a fixed step length in mm with decay converges
            # in tens of iterations regardless of the penalty balance
            gn = g / jnp.maximum(jnp.linalg.norm(g), 1e-12)
            tt = jnp.stack([t_leg, t_brace]) - step_len * gn
            # projections: bounds and thin-wall validity D/t > 10
            tt = jnp.clip(tt, t_bounds[0], t_bounds[1])
            tt = jnp.minimum(tt, jnp.stack([D_leg, D_brace]) / 10.0 - 1e-6)
            return tt[0], tt[1], u, m

    t_leg = model.sections.t[0]
    t_brace = model.sections.t[1]
    hist = np.zeros((n_iter, 4))
    for i in range(n_iter):
        step_len = lr * (1.0 - 0.9 * i / n_iter)   # decaying step [mm]
        t_leg, t_brace, u, m = step(t_leg, t_brace,
                                    jnp.asarray(step_len, dtype))
        # (u, m) describe the PRE-step design; history records the pair that
        # was actually evaluated together
        hist[i] = [float(t_leg), float(t_brace), float(u), float(m)]

    # evaluate the RETURNED design (hist carries the pre-step responses, so
    # the final thicknesses would otherwise be reported with the previous
    # iterate's utilization/mass)
    u_fin, m_fin, _ = _respond(
        model, wave, case, jnp.stack([D_leg, t_leg, D_brace, t_brace]),
        n_gauss, accel, free, fixed, None)
    return SizingResult(t_leg=t_leg, t_brace=t_brace,
                        util_max=u_fin, mass_t=m_fin, history=hist)

"""Wave-model facade with automatic steepness-based selection.

Capability parity with ``RaschiiWave._create_wave``
(`/root/reference/JacketAnalysisGUI_v2.py:208-253`): given (H, T, d, model
name, N) return the appropriate canonical :class:`FourierWave`.  Selection
thresholds replicate the reference exactly:

    steepness = H / L_airy
    'auto':   < 0.01 -> Airy;  < 0.03 -> Stokes N=3;  < 0.06 -> Stokes N=5;
              else Fenton with N = clip(int(200 * steepness), 10, 20)
    'stokes': order = min(N, 5)
    'fenton': stream function with N modes
    'airy':   linear theory

Selection runs host-side on a scalar (it picks which constructor/kernel to
trace — the same role the reference's Python dispatch plays); each
constructor itself is jittable/vmappable for design sweeps.

Breaking-wave limits (documented in the reference Info tab,
`JacketAnalysisGUI_v2.py:1651-1654`): H/L < 0.142 (deep), H/d < 0.78
(shallow).  ``validate_wave`` enforces them as explicit errors — an upgrade
over the reference, which documents but never checks them.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .dispersion import solve_dispersion
from .fenton import fenton_wave
from .stokes import stokes_wave
from .waves import FourierWave, airy_wave


def airy_steepness(H, T, d) -> float:
    """H / L with L from linear dispersion (the reference's selection metric,
    `JacketAnalysisGUI_v2.py:211-213`)."""
    omega = 2.0 * np.pi / float(T)
    k = float(solve_dispersion(omega, float(d)))
    return float(H) * k / (2.0 * np.pi)


def validate_wave(H, T, d, strict: bool = False):
    """Check breaking limits; raise (strict) or warn via return value."""
    msgs = []
    s = airy_steepness(H, T, d)
    if s >= 0.142:
        msgs.append(f"steepness H/L = {s:.3f} exceeds deep-water breaking "
                    f"limit 0.142")
    if float(H) / float(d) >= 0.78:
        msgs.append(f"H/d = {float(H)/float(d):.3f} exceeds shallow-water "
                    f"breaking limit 0.78")
    if strict and msgs:
        raise ValueError("; ".join(msgs))
    return msgs


def make_wave(H, T, d, U_c=0.0, model: str = "auto", N: int = 10,
              n_modes: int | None = None, dtype=jnp.float64) -> FourierWave:
    """Build a wave of the requested (or auto-selected) theory.

    ``n_modes`` pads coefficient arrays to a fixed size so heterogeneous
    models can be stacked/vmapped in one design-sweep batch.
    """
    model = model.lower()
    if model == "auto":
        s = airy_steepness(H, T, d)
        if s < 0.01:
            model, N = "airy", 1
        elif s < 0.03:
            model, N = "stokes", 3
        elif s < 0.06:
            model, N = "stokes", 5
        else:
            model, N = "fenton", int(np.clip(int(s * 200), 10, 20))

    if model == "airy":
        return airy_wave(H, T, d, U_c, n_modes=n_modes or 1, dtype=dtype)
    if model == "stokes":
        return stokes_wave(H, T, d, U_c, order=min(int(N), 5),
                           n_modes=n_modes or 5, dtype=dtype)
    if model == "fenton":
        return fenton_wave(H, T, d, U_c, N=int(N), n_modes=n_modes,
                           dtype=dtype)
    raise ValueError(f"unknown wave model {model!r} "
                     f"(expected auto/airy/stokes/fenton)")

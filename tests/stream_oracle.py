"""Independent stream-function wave oracle (numpy + scipy only).

A from-scratch Rienecker & Fenton (1981) steady-wave solver used as a
NUMERICAL ORACLE for the package's jnp implementations (ops/fenton.py,
ops/stokes.py).  Everything about it is deliberately different from the
package path so shared-bug risk is minimal:

- depth-scaled dimensionless unknowns (lengths / d, velocities / sqrt(g d))
  instead of the package's SI variables;
- raw ``np.cosh``/``np.sinh`` hyperbolics instead of the package's
  exp-normalized overflow-safe forms;
- a damped (line-searched) Newton iteration with a forward finite-
  difference Jacobian in plain numpy, instead of the package's fixed-step
  Newton with an exact ``jax.jacfwd`` Jacobian;
- its own evaluation functions (direct stream-function derivatives in the
  wave frame) instead of the package's canonical FourierWave kernel.

Frame conventions shared with the package (and raschii, which the reference
wraps): zero mean Eulerian current below trough (Stokes' first definition,
B0 = -c), theta = k x at t = 0, z measured from the mean water level.
"""
from __future__ import annotations

import numpy as np

G = 9.81


class StreamSolution:
    """Converged dimensional solution: eta_m at theta_m = m pi / M, B_j."""

    def __init__(self, H, T, d, M, eta, B, B0, k, Q, R, residual):
        self.H, self.T, self.d, self.M = H, T, d, M
        self.eta = eta          # [M+1] surface heights above BED
        self.B = B              # [M] stream-function coefficients (SI)
        self.B0 = B0            # = -c
        self.k = k
        self.c = -B0
        self.Q, self.R = Q, R
        self.residual = residual

    # -- direct evaluation (fixed frame, z from MWL) ----------------------
    def surface(self, x, t=0.0):
        """eta(x, t) above MWL via the trigonometric interpolant of the
        collocation heights (the exact representation of the solution).
        Time enters as the steady-wave translation x - c t."""
        x = np.asarray(x, dtype=float) - self.c * np.asarray(t, dtype=float)
        j = np.arange(1, self.M + 1)
        theta_m = np.pi * np.arange(self.M + 1) / self.M
        w = np.ones(self.M + 1)
        w[0] = w[-1] = 0.5
        a = (2.0 / self.M) * (w * (self.eta - self.d)) @ np.cos(
            np.outer(theta_m, j))
        a[-1] *= 0.5
        return np.cos(np.outer(self.k * x, j)) @ a

    def uw(self, x, z_mwl, t=0.0):
        """(u, w) in the fixed frame (no dry masking, no clamp)."""
        x = np.asarray(x, dtype=float) - self.c * np.asarray(t, dtype=float)
        z = np.asarray(z_mwl, dtype=float) + self.d   # height above bed
        j = np.arange(1, self.M + 1)
        jk = j * self.k
        C = np.cosh(np.multiply.outer(z, jk)) / np.cosh(jk * self.d)
        S = np.sinh(np.multiply.outer(z, jk)) / np.cosh(jk * self.d)
        cj = np.cos(np.multiply.outer(self.k * x, j))
        sj = np.sin(np.multiply.outer(self.k * x, j))
        u_frame = self.B0 + np.sum((jk * self.B) * C * cj, axis=-1)
        w = np.sum((jk * self.B) * S * sj, axis=-1)
        return u_frame + self.c, w


def reference_kinematics(sol: StreamSolution, x, z_mwl, t, U_c=0.0,
                         dt=1e-3):
    """The reference's EXACT ``RaschiiWave.get_kinematics`` call pattern
    (`/root/reference/JacketAnalysisGUI_v2.py:259-296`), replayed on the
    independent oracle solution instead of raschii:

    - eta(x, t) from the wave solution's surface;
    - dry check z > eta -> all-zero kinematics, submerged = False;
    - velocity at the RASCHII-CLAMPED height above bed
      max(0.01, min(z + d, d + eta - 0.01)) (`:272`), current U_c added to
      the x-component (`:281`);
    - acceleration by forward finite difference over dt = 1e-3 (`:283-288`)
      THROUGH the dry-checked, clamped, current-added velocity at t and
      t + dt (each call re-evaluates its own eta), so U_c cancels and
      points that emerge within dt see the same one-sided derivative.

    Scalar (x, z, t) in, dict out, mirroring the reference's return shape.
    raschii itself cannot be installed in this environment (zero egress;
    pip resolves no distribution), so this is the closest executable form
    of the reference's nonlinear-wave branch.
    """
    def eta_at(tt):
        return float(np.asarray(sol.surface(np.asarray([x]), tt))[0])

    def vel(tt):
        e = eta_at(tt)
        if z_mwl > e:
            return 0.0, 0.0
        z_bed = max(0.01, min(z_mwl + sol.d, sol.d + e - 0.01))
        u, w = sol.uw(np.asarray([x]), np.asarray([z_bed - sol.d]), tt)
        return float(u[0]) + U_c, float(w[0])

    eta_local = eta_at(t)
    if z_mwl > eta_local:
        return dict(u=0.0, w=0.0, du_dt=0.0, dw_dt=0.0, submerged=False,
                    eta=eta_local)
    u0, w0 = vel(t)
    u1, w1 = vel(t + dt)
    return dict(u=u0, w=w0, du_dt=(u1 - u0) / dt, dw_dt=(w1 - w0) / dt,
                submerged=True, eta=eta_local)


def solve_stream_wave(H, T, d, M=20, g=G) -> StreamSolution:
    """Solve the steady-wave collocation problem (dimensionless, hybr)."""
    Hp = H / d                      # heights / d
    sg = np.sqrt(g * d)             # velocity scale
    om = 2.0 * np.pi / T * np.sqrt(d / g)   # dimensionless omega

    jj = np.arange(1, M + 1)
    theta = np.pi * np.arange(M + 1) / M
    cjt = np.cos(np.outer(theta, jj))
    sjt = np.sin(np.outer(theta, jj))
    wtrap = np.ones(M + 1)
    wtrap[0] = wtrap[-1] = 0.5

    def residual(q, Hi):
        etap = q[: M + 1]          # eta / d (from bed)
        Bp = q[M + 1: 2 * M + 1]
        B0p = q[2 * M + 1]
        kap = q[2 * M + 2]         # k d
        Qp = q[2 * M + 3]
        Rp = q[2 * M + 4]
        # clip hyperbolic arguments so a wild Newton trial point stays
        # finite and gets rejected by the line search (legit solutions have
        # |A| < ~60 for any reachable M, kd)
        A = np.clip(np.outer(etap, jj * kap), -300.0, 300.0)
        ch = np.cosh(A) / np.cosh(np.minimum(jj * kap, 300.0))
        sh = np.sinh(A) / np.cosh(np.minimum(jj * kap, 300.0))
        psi = B0p * etap + (sh * cjt) @ Bp
        u = B0p + ((jj * kap) * ch * cjt) @ Bp
        w = ((jj * kap) * sh * sjt) @ Bp
        return np.concatenate([
            psi - Qp,
            0.5 * (u * u + w * w) + etap - Rp,
            [np.sum(wtrap * etap) / M - 1.0,
             etap[0] - etap[-1] - Hi,
             -B0p * kap - om],
        ])

    # Airy initial guess (dimensionless dispersion by bisection — again a
    # different method from the package's Newton)
    lo, hi = 1e-6, max(10.0, om * om * 2 + 1)
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if mid * np.tanh(mid) < om * om:
            lo = mid
        else:
            hi = mid
    kap0 = 0.5 * (lo + hi)
    n_cont = max(8, int(40 * Hp / 0.34))   # more ramp steps for steep waves
    a0 = (Hp / n_cont) / 2.0               # guess matches the FIRST ramp step

    q = np.concatenate([
        1.0 + a0 * np.cos(theta),
        np.zeros(M),
        [-om / kap0, kap0, -om / kap0, 0.5 * (om / kap0) ** 2 + 1.0],
    ])
    q[M + 1] = a0 * om / (kap0 * np.tanh(kap0))

    def fd_jac(q, Hi, eps=1e-7):
        n = q.size
        r0 = residual(q, Hi)
        J = np.empty((n, n))
        for i in range(n):
            h = eps * max(1.0, abs(q[i]))
            dq = np.zeros(n)
            dq[i] = h
            J[:, i] = (residual(q + dq, Hi) - r0) / h
        return J

    def newton(q, Hi, iters=40):
        for _ in range(iters):
            r = residual(q, Hi)
            base = np.abs(r).max()
            if base < 1e-12:
                break
            dq = np.linalg.solve(fd_jac(q, Hi), r)
            lam = 1.0
            qn = q
            for _ in range(30):          # damping line search (NaN-aware)
                trial = q - lam * dq
                val = np.abs(residual(trial, Hi)).max()
                if np.isfinite(val) and val < base:
                    qn = trial
                    break
                lam *= 0.5
            q = qn
        return q

    for i in range(1, n_cont + 1):
        q = newton(q, Hp * i / n_cont)
    res = np.abs(residual(q, Hp)).max()
    if res > 1e-9:
        raise RuntimeError(f"oracle failed to converge (residual {res:.2e})")

    etap = q[: M + 1]
    Bp = q[M + 1: 2 * M + 1]
    B0p, kap = q[2 * M + 1], q[2 * M + 2]
    return StreamSolution(
        H=H, T=T, d=d, M=M,
        eta=etap * d,
        B=Bp * d * sg,
        B0=B0p * sg,
        k=kap / d,
        Q=q[2 * M + 3] * d * sg,
        R=q[2 * M + 4] * g * d,
        residual=res,
    )

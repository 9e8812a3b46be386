"""Worked example 13: from a wave climate to a failure probability.

The reference tool checks one storm the user types in.  Example 11 found
the 100-year ENVIRONMENT (IFORM contour).  This example asks the direct
design question: how likely is the structure itself to exceed a
utilization limit, accounting for how the RESPONSE — not just the
environment — varies over the climate?

    climate scatter -> joint (Hs, Tp) fit
                    -> direct FORM on max utilization   (beta, pf, design storm)
                    -> SORM curvature correction
                    -> importance-sampling Monte-Carlo check

    python examples/13_reliability.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.metocean import return_period_beta

# -- synthetic 10-year measurement campaign at the site --------------------
rng = np.random.default_rng(11)
hs = 2.0 * 2.5 * rng.weibull(1.5, size=29_220)            # 3-h states, 10 y
tp = np.exp(np.log(5.5 + 1.4 * np.sqrt(hs / 2.0))
            + 0.12 * rng.standard_normal(hs.size)) + 4.0
joint = sf.fit_joint_hs_tp(hs, tp, n_bins=8, state_hours=3.0)
print(f"climate: Hs ~ Weibull(k={joint.weibull_k:.2f}, "
      f"lam={joint.weibull_lam:.2f} m)")

# -- the structure and the response measure --------------------------------
model = sf.default_3leg_jacket()
case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                   F_axial_kN=25100.0, F_shear_kN=2900.0,
                   custom_sw_tonnes=1100.0, sw_mode="custom")
response = sf.utilization_response(model, case, d=50.0, U_c=1.7,
                                   wave_model="airy", n_steps=12)

# what the 100-year IFORM contour would give (environment-only view)
b100 = return_period_beta(joint, 100.0)
hs100, tp100 = sf.rosenblatt_hs_tp(joint, b100, 0.0)
print(f"100-year IFORM Hs = {float(hs100):.2f} m "
      f"(environmental beta {b100:.2f})")

# -- direct FORM: P(utilization > 0.35) -------------------------------------
rel = sf.environmental_reliability(response, joint, threshold=0.35)
f = rel.form
print(f"\nFORM on utilization > 0.35 "
      f"({f.n_iter} iterations, {f.n_evals} phase scans):")
print(f"  beta = {f.beta:.3f}, design storm Hs {rel.hs_star:.2f} m / "
      f"Tp {rel.tp_star:.2f} s")
print(f"  alpha = (Hs {f.alpha[0]:+.3f}, Tp {f.alpha[1]:+.3f}) "
      f"-> wave height carries {f.alpha[0]**2:.0%} of the risk")
print(f"  pf = {rel.pf_state:.3e} per 3-h state "
      f"= {rel.pf_annual:.3e} per year "
      f"(return period {rel.return_years:,.0f} years)")

# -- second-order correction and an unbiased Monte-Carlo check -------------
# SORM reads the surface curvature at the design point (a few more scans);
# the Monte-Carlo check evaluates ALL samples as ONE design-envelope
# program — stiffness factored once, every sample x phase in one
# multi-RHS solve (pass mesh= to shard the samples across chips).
g_of_u, _ = sf.hs_tp_limit_state(response, joint, 0.35)
pf_sorm = sf.sorm_correction(g_of_u, f)
response_b = sf.utilization_response_batch(model, case, d=50.0, U_c=1.7,
                                           wave_model="airy", n_steps=12)
g_batch = sf.hs_tp_limit_state_batch(response_b, joint, 0.35)
pf_is, cov = sf.importance_sample_batch(g_batch, f, n_samples=512, seed=0)
print(f"\nSORM (Breitung):     pf = {pf_sorm:.3e}")
print(f"importance sampling: pf = {pf_is:.3e} (cov {cov:.1%}, "
      f"512 samples centered at the design point, one device program)")
print("FORM within the IS confidence band:",
      abs(rel.pf_state - pf_is) < 3.0 * cov * max(pf_is, 1e-300))

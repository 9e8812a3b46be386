"""Worked example 11: site statistics to structural assurance.

1. contour:    fit a joint (Hs, Tp) climate and extract the 100-year
               IFORM contour;
2. envelope:   drive the contour's sea states through the design
               envelope (one batched program) to find the governing one;
3. robustness: the ALS single-member-removal screen at that state
               (all 51 damaged configurations in one vmapped batch);
4. buckling:   Craig-Bampton condensed global buckling on a refined
               mesh (reduced eigenproblem, demands on every element).

    python examples/11_life_cycle.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.buckling import buckling_analysis_condensed
from small_fem_solver_tpu.parallel.sweep import (make_case_batch,
                                                 make_wave_batch)

# -- 1. synthetic site climate + 100-year contour ---------------------------
rng = np.random.default_rng(11)
hs_c = 3.1 * rng.weibull(1.45, 20_000)
tp_c = np.exp(np.log(6.0 + 1.5 * np.sqrt(hs_c))
              + 0.11 * rng.standard_normal(hs_c.size))
climate = sf.fit_joint_hs_tp(hs_c, tp_c, n_bins=10)
hs, tp = sf.n_year_sea_states(climate, 100.0, n_points=12)
print(f"climate: Hs ~ Weibull(k={climate.weibull_k:.2f}, "
      f"lam={climate.weibull_lam:.2f} m); 100-yr contour peak Hs "
      f"{hs.max():.1f} m")

# -- 2. contour response envelope -------------------------------------------
model = sf.default_3leg_jacket()
case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                   F_axial_kN=25100.0, F_shear_kN=2900.0,
                   custom_sw_tonnes=1100.0, sw_mode="custom")
hs = np.clip(hs, 0.05, 0.75 * 50.0)        # breaking-limit clamp
waves = make_wave_batch(hs, tp, 50.0, U_c=1.7, model="airy")
cases = make_case_batch(case, t_analysis=np.zeros(len(hs)))
env = sf.design_envelope(model, waves, cases, n_steps=12)
g = int(env.governing_case)
print(f"governing contour state: Hs {hs[g]:.1f} m / Tp {tp[g]:.1f} s, "
      f"max utilization {float(env.max_util_per_case.max()):.3f}")

# -- 3. damage screen at the governing state --------------------------------
gov_wave = sf.airy_wave(float(hs[g]), float(tp[g]), 50.0, 1.7)
scr = sf.member_removal_screen(model, gov_wave, case)
crit = np.asarray(scr.critical)
worst = int(np.nanargmax(np.where(np.asarray(scr.stable),
                                  np.asarray(scr.max_util), np.nan)))
print(f"damage screen: {int(crit.sum())} critical member(s); worst "
      f"removal {model.member_names[worst]} -> max util "
      f"{float(scr.max_util[worst]):.3f}")

# -- 4. condensed buckling at the governing state ----------------------------
n_seg = 8
refined = sf.refine_model(model, n_seg)
res = sf.analyze_condensed(model, refined, n_seg, gov_wave, case)
b = buckling_analysis_condensed(model, refined, n_seg, res, n_modes=3)
print(f"condensed buckling ({refined.n_dof} DOF, reduced eigenproblem): "
      "lambda_cr = "
      + ", ".join(f"{float(v):.1f}" for v in b.load_factor))

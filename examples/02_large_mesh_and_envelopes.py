"""Worked example 2: refined meshes, 100k DOF, and storm envelopes.

Demonstrates the scales the reference cannot reach (its dense Python
assembly is O(n^2) memory): a ~100k-DOF full analysis via the exact chain
condensation, a 360-phase full-FEM scan at 9,612 DOF, and a multi-case
storm envelope with one factorization.

    python examples/02_large_mesh_and_envelopes.py
"""
import time

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.parallel.sweep import make_case_batch, make_wave_batch

coarse = sf.default_3leg_jacket()
wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="fenton", N=18)
case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                   F_axial_kN=25100.0, F_shear_kN=2900.0,
                   custom_sw_tonnes=1100.0, sw_mode="custom", t_analysis=0.34)

# -- ~100k DOF, exact direct solve --
refined = sf.refine_model(coarse, 327)
t0 = time.time()
res = sf.analyze_condensed(coarse, refined, 327, wave, case)
print(f"{refined.n_dof} DOF full analysis: {time.time()-t0:.1f} s "
      f"(max util {float(res.utilization.max()):.2%})")

# -- 360-phase full-FEM scan at ~10k DOF --
r32 = sf.refine_model(coarse, 32)
scan = sf.phase_scan_condensed(coarse, r32, 32, wave, case, n_steps=360)
print(f"{r32.n_dof} DOF x 360 phases: governing phase index "
      f"{int(scan.critical_index)}, max util "
      f"{float(scan.utilization.max()):.2%}")

# -- multi-case storm envelope, factorized once --
Hs = np.linspace(8.0, 17.0, 6)
waves = make_wave_batch(Hs, 9.4, 50.0, U_c=1.7, model="fenton", N=18,
                        n_modes=18, dtype=jnp.float64)
cases = make_case_batch(case, t_analysis=jnp.zeros(6))
env = sf.design_envelope_condensed(coarse, r32, 32, waves, cases,
                                   n_steps=36, solve_dtype=jnp.float64)
g = int(env.governing_case)
print(f"storm envelope over H = {Hs.round(1)}: governing case H = {Hs[g]} m "
      f"at util {float(env.max_util_per_case[g]):.2%}")

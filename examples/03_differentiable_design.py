"""Worked example 3: differentiable design — only possible because the
entire pipeline is JAX.

Computes exact sensitivities of the governing utilization and the
structural mass with respect to the section parameters (one reverse-mode
pass through wave kinematics, Morison loading, FEM and stress recovery),
then sizes the wall thicknesses to a target utilization by gradient
descent.

    python examples/03_differentiable_design.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import small_fem_solver_tpu as sf

model = sf.default_3leg_jacket()
wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="stokes", N=5)
case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                   F_axial_kN=25100.0, F_shear_kN=2900.0,
                   custom_sw_tonnes=1100.0, sw_mode="custom",
                   t_analysis=0.34)

s = sf.section_sensitivities(model, wave, case)
names = ["D_leg", "t_leg", "D_brace", "t_brace"]
print("exact gradients through the full analysis (per mm):")
for n, du, dm in zip(names, np.asarray(s.dutil), np.asarray(s.dmass_t)):
    print(f"  {n:<8} d(util) = {du:+.3e}   d(mass) = {dm:+.2f} t")

opt = sf.optimize_sections(model, wave, case, target_util=0.5, n_iter=80)
print(f"sizing to 50% utilization: "
      f"t_leg {float(model.sections.t[0]):.0f} -> {float(opt.t_leg):.1f} mm, "
      f"t_brace {float(model.sections.t[1]):.0f} -> {float(opt.t_brace):.1f} mm")
print(f"mass {float(s.mass_t):.0f} -> {float(opt.mass_t):.0f} t "
      f"({1 - float(opt.mass_t)/float(s.mass_t):.0%} saved) "
      f"at utilization {float(opt.util_max):.2%}")

"""Worked example 4: foundation flexibility (SSI) and what it does to
statics AND dynamics.

The reference clamps the supports rigidly and lists soil-structure
interaction on its exclusion list (`JacketAnalysisGUI_v2.py` Info tab).
Here the same storm runs on pile-head springs from a geotechnical
pushover, at three scales:

  1. coarse model: sprung vs clamped displacements and reactions,
  2. a refined ~10k-DOF mesh through the exact chain condensation,
  3. modal analysis: foundation flexibility lengthens the natural
     periods — the number a jacket designer checks against the wave
     period first.

    python examples/04_foundation_and_dynamics.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.dynamics import modal_analysis

model = sf.default_3leg_jacket()
wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7)
case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                   F_axial_kN=25100.0, F_shear_kN=2900.0,
                   custom_sw_tonnes=1100.0, sw_mode="custom")

# pile-head stiffnesses: lateral/vertical springs in N/mm, rotational in
# N*mm/rad (a pinned head would use zero rotational stiffness)
springs = [8e5, 8e5, 2e6, 5e12, 5e12, 1e12]

# -- 1. coarse model: clamped vs sprung -------------------------------
clamped = sf.analyze(model, wave, case)
sprung = sf.analyze_ssi(model, wave, case, springs)
print("supports:            clamped    on springs")
print(f"max displacement:  {float(clamped.max_displacement_mm):9.1f} mm "
      f"{float(sprung.max_displacement_mm):9.1f} mm")
print(f"max utilization:   {float(clamped.utilization.max()):9.2%} "
      f"{float(sprung.utilization.max()):9.2%}")
# the reactions ARE the spring forces: R = -k u at each support
fixed = np.where(np.asarray(model.fixed_mask))[0]
u_sup = np.asarray(sprung.U).reshape(-1, 6)[fixed]
assert np.allclose(np.asarray(sprung.reactions),
                   -np.asarray(springs) * u_sup, rtol=1e-8)

# -- 2. the same springs on a refined mesh (chain condensation) -------
n_seg = 16
refined = sf.refine_model(model, n_seg)
big = sf.analyze_condensed(model, refined, n_seg, wave, case,
                           support_stiffness=springs)
print(f"\nrefined mesh ({refined.n_dof} DOF, condensed solve): "
      f"max displacement {float(big.max_displacement_mm):.1f} mm, "
      f"max utilization {float(big.utilization.max()):.2%}")

# -- 3. natural periods: the first-order SSI effect -------------------
mc = modal_analysis(model, n_modes=3, topside_mass_t=1100.0)
ms = modal_analysis(model, n_modes=3, topside_mass_t=1100.0,
                    support_stiffness=springs)
print("\nmode   T clamped [s]   T on springs [s]")
for i in range(3):
    print(f"  {i + 1}    {float(mc.periods_s[i]):10.3f} "
          f"{float(ms.periods_s[i]):15.3f}")
print(f"wave period {float(wave.T):.1f} s — foundation flexibility moves "
      "the structure TOWARD the wave band; checking this is why SSI "
      "matters")

"""Worked example 10: ultimate strength and dynamic damping.

1. pushover:  gravity constant, storm scaled by lambda; EPP axial yield,
              load-displacement curve + Reserve Strength Ratio;
2. rose:      the governing RSR over storm headings (3-leg symmetry
              makes 120-degree-apart headings identical);
3. doppler:   the wave built at the apparent period seen through the
              current (API RP 2A wave-current interaction);
4. damping:   transient response with relative-velocity Morison drag —
              physical quadratic damping capping the resonant response.

    python examples/10_ultimate_strength.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.pushover import pushover, pushover_rose

model = sf.default_3leg_jacket()
case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                   F_axial_kN=25100.0, F_shear_kN=2900.0,
                   custom_sw_tonnes=1100.0, sw_mode="custom",
                   t_analysis=0.34)

# -- 3. wave-current Doppler -----------------------------------------------
T_app = float(sf.apparent_period(9.4, 50.0, 1.7))  # following current
print(f"apparent period: {T_app:.3f} s (absolute 9.4 s, +1.7 m/s current)")
wave = sf.stokes_wave(17.038, T_app, 50.0, 1.7, order=5)

# -- 1. pushover ------------------------------------------------------------
res = pushover(model, wave, case, lambda_max=18.0, n_lambda=19, n_iter=100)
lam = np.asarray(res.lambdas)
print("\npushover (whole lambda grid = ONE vmapped device program):")
for i in range(0, len(lam), 3):
    print(f"  lambda {lam[i]:5.1f}: disp {float(res.max_displacement_mm[i]):9.1f} mm, "
          f"{int(res.n_yielded[i]):2d} members at capacity")
print(f"first yield at lambda = {float(res.first_yield_lambda):.2f}; "
      f"RSR = {float(res.rsr):.2f}")

# -- 2. directional rose ----------------------------------------------------
hd, rsr, fy, _ = pushover_rose(model, wave, case, [0, 30, 60, 90],
                               lambda_max=16.0, n_lambda=9, n_iter=60)
print("\nRSR rose: " + ", ".join(f"{h:.0f}deg -> {r:.1f}"
                                 for h, r in zip(hd, rsr))
      + f"; governing {hd[int(rsr.argmin())]:.0f} deg")

# -- 4. relative-velocity drag damping --------------------------------------
from small_fem_solver_tpu.ops.dynamics import transient_response_condensed

refined = sf.refine_model(model, 4)
kw = dict(dt=T_app / 48, n_steps=6 * 48, damping_ratio=0.0,
          topside_mass_t=1100.0, added_mass_Ca=1.0, ramp_periods=1.0)
std = transient_response_condensed(model, refined, 4, wave, case, **kw)
rel = transient_response_condensed(model, refined, 4, wave, case,
                                   relative_drag=True, **kw)
print(f"\ntransient (6 periods, zero Rayleigh damping): peak tip "
      f"{float(np.abs(np.asarray(std.tip_displacement_mm)).max()):.1f} mm "
      f"standard drag -> "
      f"{float(np.abs(np.asarray(rel.tip_displacement_mm)).max()):.1f} mm "
      f"with relative-velocity (physical hydrodynamic) damping")

"""Worked example 1: the reference tool's storm check, end to end.

Runs the default 3-leg jacket under the canonical storm (H=17.038 m,
T=9.4 s, d=50 m, 1.7 m/s current at 38 deg) exactly like the reference
GUI's RUN button, then goes beyond it: the critical phase is found with a
FULL FEM solution at every phase (the reference only scans total force).

    python examples/01_storm_analysis.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import small_fem_solver_tpu as sf

model = sf.default_3leg_jacket()
wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7)          # auto -> Fenton
case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                   F_axial_kN=25100.0, F_shear_kN=2900.0,
                   custom_sw_tonnes=1100.0, sw_mode="custom")

print(f"wave model: {wave.model_info()}")

# -- single analysis at t = 0 (the reference's quasi-static check) --
res = sf.analyze(model, wave, case)
print(f"total Morison force: {np.asarray(res.morison.total_morison)/1e3} kN")
print(f"max utilization:     {float(res.utilization.max()):.2%}")
print(f"max displacement:    {float(res.max_displacement_mm):.1f} mm "
      f"at {model.node_names[int(res.max_displacement_node)]}")

# -- full-FEM phase scan: stresses at EVERY phase of the wave cycle --
ts, batch = sf.analyze_phase_batch(model, wave, case, n_steps=72)
util_t = np.asarray(batch.utilization).max(axis=1)
crit = int(util_t.argmax())
print(f"governing phase: t = {float(ts[crit]):.2f} s with "
      f"utilization {util_t[crit]:.2%} "
      f"(t = 0 gives only {util_t[0]:.2%})")

# -- buckling and natural periods, which the reference excludes --
b = sf.buckling_analysis(model, res)
modal = sf.modal_analysis(model, n_modes=3, topside_mass_t=1100.0)
print(f"elastic buckling load factor: {float(b.load_factor[0]):.1f}")
print(f"first natural period: {float(modal.periods_s[0]):.2f} s "
      f"(wave period {float(wave.T):.1f} s)")

"""Worked example 9: design-office workflow — combinations, releases,
seismic, air gap.

Round-3 capabilities on the default jacket, all beyond the reference:

1. releases:     pin the horizontal braces (moment-free ends) and watch
                 their end moments vanish while equilibrium holds;
2. combinations: analyze the characteristic actions once (gravity,
                 environment) and evaluate an LRFD/WSD combo table by
                 superposition — no re-analysis;
3. seismic:      EC8-shape response spectrum with CQC modal combination,
                 dense AND Craig-Bampton condensed on a refined mesh;
4. air gap:      crest-vs-deck clearance over a full wave cycle.

    python examples/09_design_checks.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.utils.io import model_from_dict, model_to_dict

# -- 1. pin the horizontal braces ----------------------------------------
model = sf.default_3leg_jacket()
d = model_to_dict(model)
for m in d["members"]:
    if m["type"] == "h_brace":
        m["release"] = "pinned"
pinned, _ = model_from_dict(d)

storm = sf.airy_wave(17.038, 9.4, 50.0, 1.7)
calm = sf.airy_wave(1e-9, 9.4, 50.0)
full = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                   F_axial_kN=25100.0, F_shear_kN=2900.0,
                   custom_sw_tonnes=1100.0, sw_mode="custom")
rigid_r = sf.analyze(model, storm, full)
pinned_r = sf.analyze(pinned, storm, full)
hb = [e for e in range(model.n_members) if model.member_types[e] == "h_brace"]
print("h-braces pinned: max end moment "
      f"{np.abs(np.asarray(pinned_r.F1_local)[hb][:, 4:6]).max():.1e} N*mm "
      f"(rigid: {np.abs(np.asarray(rigid_r.F1_local)[hb][:, 4:6]).max():.3e}); "
      f"max disp {float(rigid_r.max_displacement_mm):.1f} -> "
      f"{float(pinned_r.max_displacement_mm):.1f} mm")

# -- 2. load combinations -------------------------------------------------
actions = {
    "G": sf.analyze(model, calm, sf.LoadCase(
        F_axial_kN=25100.0, F_shear_kN=2900.0,
        custom_sw_tonnes=1100.0, sw_mode="custom")),
    "E": sf.analyze(model, storm, sf.LoadCase(
        wave_dir_deg=38.0, current_dir_deg=38.0, sw_mode="none")),
}
combos = {"LRFD extreme": {"G": 1.1, "E": 1.35},
          "operating":    {"G": 1.3, "E": 0.9},
          "WSD":          {"G": 1.0, "E": 1.0}}
results, env = sf.combo_envelope(model, actions, combos)
print("\ncombination table (one analysis per ACTION, combos by superposition):")
for c, r in results.items():
    tag = " <- governing" if c == env["governing"] else ""
    print(f"  {c:13s} max util {float(r.utilization.max()):.4f}{tag}")

# -- 3. seismic response spectrum ----------------------------------------
seis = sf.response_spectrum(model, pga_g=0.25, ground="C", zeta=0.05,
                            n_modes=12, topside_mass_t=1100.0,
                            added_mass_Ca=1.0,
                            directions=((1, 0, 0), (0, 1, 0), (0, 0, 1)))
print(f"\nseismic (0.25 g, ground C): T1 = {float(seis.periods_s[0]):.3f} s, "
      f"base shear {float(seis.base_shear_kN[0]):,.0f} kN, "
      f"max util {float(seis.utilization.max()):.4f}")
refined = sf.refine_model(model, 8)
seis_c = sf.response_spectrum_condensed(
    model, refined, 8, pga_g=0.25, ground="C", zeta=0.05, n_modes=12,
    topside_mass_t=1100.0, added_mass_Ca=1.0)
print(f"condensed ({refined.n_dof} DOF, reduced eigenproblem): "
      f"T1 = {float(seis_c.periods_s[0]):.3f} s, "
      f"max util over every refined element {float(seis_c.utilization.max()):.4f}")

# -- 4. deck air gap ------------------------------------------------------
crest_wave = sf.stokes_wave(17.038, 9.4, 50.0, order=5)
ag = sf.air_gap_check(model, crest_wave, wave_dir_deg=38.0, surge_m=1.0)
print(f"\nair gap: crest {float(ag.crest_m):.2f} m + 1.00 m surge vs deck at "
      f"{ag.deck_elevation_m:.1f} m -> {float(ag.air_gap_m):.2f} m "
      f"({'OK' if bool(ag.ok) else 'WAVE-IN-DECK RISK'})")

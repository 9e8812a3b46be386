"""Worked example 8: a full site assessment beyond the reference's scope.

One pass through the round-3 engineering stack on the default jacket:

1. soil:   API p-y/t-z/Q-z pile-head springs from a layered profile
           (clamped analysis supplies each support's working loads),
           with and without 3 m of general scour;
2. wind:   API power-law member drag + an 800 m^2 topside block,
           combined with the storm wave on the soil springs;
3. checks: API RP 2A-WSD and ISO 19902 member unity checks on the
           governing state;
4. VIV:    current-induced vortex-shedding susceptibility screen.

    python examples/08_site_assessment.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import dataclasses

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import small_fem_solver_tpu as sf

model = sf.default_3leg_jacket()
wave = sf.stokes_wave(17.038, 9.4, 50.0, 1.7, order=5)
storm = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                    F_axial_kN=25100.0, F_shear_kN=2900.0,
                    custom_sw_tonnes=1100.0, sw_mode="custom",
                    t_analysis=0.34)

# -- 1. pile-head springs from the soil profile --------------------------
soil = [sf.SoilLayer("clay", 0.0, 8.0, su_kPa=40.0, gamma_kN_m3=8.0,
                     eps50=0.02),
        sf.SoilLayer("sand", 8.0, 30.0, phi_deg=32.0, gamma_kN_m3=10.0),
        sf.SoilLayer("sand", 30.0, 100.0, phi_deg=38.0, gamma_kN_m3=11.0)]
pile = sf.Pile(D_mm=2134.0, t_mm=50.0, L_m=60.0)

clamped = sf.analyze(model, wave, storm, solver="chol")
springs = sf.soil_support_stiffness(model, soil, pile,
                                    reactions=clamped.reactions)
springs_scour = sf.soil_support_stiffness(model, soil, pile,
                                          reactions=clamped.reactions,
                                          scour_m=3.0)
print("pile-head springs (support 0): "
      f"k_lat {springs[0, 0] / 1e3:.0f} kN/mm -> "
      f"{springs_scour[0, 0] / 1e3:.0f} kN/mm with 3 m scour")

# -- 2. storm + wind on the soil springs ---------------------------------
windy = dataclasses.replace(storm, wind_speed_ms=40.0, wind_dir_deg=38.0,
                            wind_topside_area_m2=800.0)
res = {}
for tag, case, ks in [("clamped, no wind", storm, None),
                      ("soil springs", storm, springs),
                      ("+ wind", windy, springs),
                      ("+ 3 m scour", windy, springs_scour)]:
    r = (sf.analyze(model, wave, case, solver="chol") if ks is None
         else sf.analyze_ssi(model, wave, case, ks))
    res[tag] = r
    print(f"{tag:18s}: max displacement {float(r.max_displacement_mm):6.1f} mm, "
          f"max util {float(r.utilization.max()):.4f}")

# -- 3. member code checks on the governing state ------------------------
gov = res["+ 3 m scour"]
api = sf.member_code_check(model, gov)
iso = sf.iso_member_check(model, gov)
e_api = int(np.argmax(np.asarray(api.uc)))
e_iso = int(np.argmax(np.asarray(iso.uc)))
print(f"\nAPI RP 2A-WSD governing member: {model.member_names[e_api]} "
      f"UC = {float(api.uc[e_api]):.3f} ({api.governing[e_api]})")
print(f"ISO 19902     governing member: {model.member_names[e_iso]} "
      f"UC = {float(iso.uc[e_iso]):.3f} ({iso.governing[e_iso]})")

# -- 4. VIV screen -------------------------------------------------------
viv = sf.viv_screen(model, U_c=1.7, d=50.0, zeta=0.01,
                    marine_growth_mm=50.0)
worst = int(np.argmax(np.maximum(np.asarray(viv.uc_inline),
                                 np.asarray(viv.uc_crossflow))))
print(f"\nVIV screen: worst member {model.member_names[worst]} "
      f"f_n = {float(viv.f_n_hz[worst]):.2f} Hz, "
      f"V_r = {float(viv.V_r[worst]):.2f}, flag = {viv.flags[worst]}; "
      f"{int((viv.flags != 'ok').sum())} member(s) above onset")

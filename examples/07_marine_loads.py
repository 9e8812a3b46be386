"""Worked example 7: marine loads beyond the reference's Morison+weight.

Three load subsystems the reference tool lists as excluded, on one model:

- appurtenances: two risers and a conductor as hydro-only members —
  they attract Morison drag/inertia (own diameter, Cd/Cm shielding
  factors) through the SAME batched kinematics arrays as the structural
  members, but add no stiffness or weight;
- still-water buoyancy: legs-flooded design assumption (flooded legs
  displace the steel annulus, sealed braces their full volume);
- wave slamming: quasi-static splash-zone impact (DNV-RP-C205 8.6 form)
  on members being crossed by the rising surface.

    python examples/07_marine_loads.py
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
base = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                   F_axial_kN=25100.0, F_shear_kN=2900.0,
                   custom_sw_tonnes=1100.0, sw_mode="custom",
                   t_analysis=0.34)

# -- hang two risers and a conductor on the jacket legs ------------------
conn = np.asarray(model.conn)
z = np.asarray(model.coords)[:, 2]
legs = [e for e in range(model.n_members)
        if model.member_types[e] == "leg" and z[conn[e, 0]] < -5.0][:3]
specs = []
for i, e in enumerate(legs):
    n1, n2 = model.node_names[conn[e, 0]], model.node_names[conn[e, 1]]
    specs.append({"name": f"RISER-{i}", "node1": n1, "node2": n2,
                  "D_mm": 610.0 if i < 2 else 914.0,
                  "cd_mult": 0.8,   # shielded behind the leg
                  "cm_mult": 1.0})
model = sf.add_appurtenances(model, specs)
print(f"model: {model.n_members} structural members "
      f"+ {model.n_appurtenances} appurtenances")

# -- four load configurations, one jitted analysis each ------------------
results = {}
for tag, case in {
    "reference loads": base,
    "+ appurtenances": base,                     # carried by the model
    "+ buoyancy": dataclasses.replace(base, buoyancy="legs-flooded"),
    "+ slamming": dataclasses.replace(base, buoyancy="legs-flooded",
                                      slam_cs=float(np.pi)),
}.items():
    m = sf.default_3leg_jacket() if tag == "reference loads" else model
    r = sf.analyze(m, wave, case, solver="chol")
    results[tag] = r
    tm = np.asarray(r.morison.total_morison) / 1e3
    print(f"{tag:18s}: |F_morison| = {np.linalg.norm(tm):8.1f} kN, "
          f"Rz = {float(r.total_reaction[2])/1e3:9.1f} kN, "
          f"max util = {float(r.utilization.max()):.4f}")

r0, r3 = results["reference loads"], results["+ slamming"]
print(f"\nnet effect of the marine-load stack: "
      f"dRz = {(float(r3.total_reaction[2]) - float(r0.total_reaction[2]))/1e3:+.1f} kN, "
      f"d(max util) = {float(r3.utilization.max()) - float(r0.utilization.max()):+.5f}")

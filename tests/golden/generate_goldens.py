"""Golden-record the reference implementation's numerics for parity tests.

Runs the PUBLIC reference (`/root/reference/JacketAnalysisGUI_v2.py`) headlessly
— its physics classes are GUI-independent — on pinned input cases and dumps
every intermediate and final quantity to JSON.  The test suite then asserts
the TPU-native build matches to 1e-8 relative without needing to import the
reference (or pay its pip-probe import delay) at test time.

Run manually when cases change:  python tests/golden/generate_goldens.py

Note: raschii is not installed in this environment, so the reference runs on
its closed-form Airy fallback (`JacketAnalysisGUI_v2.py:187-196`); goldens
therefore cover the Airy path.  Stokes/Fenton models are validated by physics
residual tests instead (see test_waves.py).
"""
from __future__ import annotations

import json
import pathlib
import subprocess
import sys

import numpy as np

HERE = pathlib.Path(__file__).parent
REF = "/root/reference/JacketAnalysisGUI_v2.py"


def load_reference():
    # Short-circuit the reference's auto-pip so import is instant offline.
    orig = subprocess.check_call
    subprocess.check_call = lambda *a, **k: (_ for _ in ()).throw(
        subprocess.CalledProcessError(1, a[0] if a else "pip"))
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location("refmod", REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        subprocess.check_call = orig
    assert not mod.RASCHII_AVAILABLE
    return mod


def run_case(ref, params):
    """Replicates the computation flow of JacketAnalysisGUI.run_analysis
    (`JacketAnalysisGUI_v2.py:1827-2082`) without the GUI."""
    p = params
    section_leg = ref.TubularSection(p["D_leg"], p["t_leg"], "Leg", p["rho_steel"])
    section_brace = ref.TubularSection(p["D_brace"], p["t_brace"], "Brace", p["rho_steel"])

    nodes, members, fixed, top = ref.create_default_3leg_jacket(47.0)
    structure = ref.CustomJacketStructure(nodes, members, section_leg,
                                          section_brace, fixed, top, p["rho_steel"])

    wave = ref.RaschiiWave(p["H"], p["T"], p["d"], p["U_c"], p["wave_model"], p["N_harm"])
    morison = ref.MorisonCalculator(structure, wave, p["wave_dir"],
                                    p["current_dir"], p["Cd"], p["Cm"], p["rho_water"])

    t = p["t_analysis"]
    mres = morison.compute_all_morison_forces(t)

    # wave-kinematics probe points (for unit parity tests)
    probes = []
    for (x, z, tt) in [(0.0, -5.0, 0.0), (10.0, -20.0, 2.0), (-5.0, -0.5, 4.7),
                       (3.0, 2.0, 1.0), (8.0, -49.0, 9.0)]:
        kin = wave.get_kinematics(x, z, tt)
        probes.append(dict(x=x, z=z, t=tt, **{k: float(v) for k, v in kin.items()}))

    scan = morison.find_critical_phase(36)

    fem = ref.FEMSolver(structure, p["E"], p["nu"])

    n_legs = len(top)
    F_axial_N = p["F_axial_kN"] * 1000.0
    F_shear_N = p["F_shear_kN"] * 1000.0
    M_moment = p["M_moment_kNm"] * 1e6
    M_torsion = p["M_torsion_kNm"] * 1e6
    theta = np.deg2rad(90.0 - p["wave_dir"])
    for node in top:
        fem.apply_nodal_force(node, np.array([
            F_shear_N * np.cos(theta) / n_legs,
            F_shear_N * np.sin(theta) / n_legs,
            -F_axial_N / n_legs,
            M_torsion / n_legs,
            M_moment / n_legs,
            0.0]))

    for node_name, force in mres["nodal_forces"].items():
        fv = np.zeros(6)
        fv[:3] = force[:3]
        fem.apply_nodal_force(node_name, fv)

    g = 9.81
    if p["sw_mode"] == "calculated":
        for member in structure.members:
            geom = structure.get_member_geometry(member)
            w = member["section"].mass_per_m * g
            Fw = w * geom["L"] / 2.0
            i1 = structure.node_index[member["node1"]]
            i2 = structure.node_index[member["node2"]]
            fem.F_global[6 * i1 + 2] -= Fw
            fem.F_global[6 * i2 + 2] -= Fw
    elif p["sw_mode"] == "custom":
        sw = p["custom_sw_tonnes"] * 1000 * g / structure.n_nodes
        for i in range(structure.n_nodes):
            fem.F_global[6 * i + 2] -= sw

    fem.apply_boundary_conditions(structure.get_bottom_nodes())
    U = fem.solve()
    reactions = fem.get_reactions()
    internal = fem.get_member_internal_forces(p["fy"])

    return dict(
        params=p,
        wave=dict(k=wave.k, omega=wave.omega, L=wave.L, c=wave.c,
                  steepness=wave.steepness),
        wave_probes=probes,
        morison=dict(
            total_drag=mres["total_drag"].tolist(),
            total_inertia=mres["total_inertia"].tolist(),
            total_morison=mres["total_morison"].tolist(),
            nodal_forces={k: v[:3].tolist() for k, v in mres["nodal_forces"].items()},
            member_details=[
                dict(member=d["member"], drag_kN=d["drag_kN"],
                     inertia_kN=d["inertia_kN"], total_kN=d["total_kN"],
                     submerged_length=d["submerged_length"])
                for d in mres["member_details"]],
        ),
        phase_scan=dict(
            t=[r["t"] for r in scan["all_phases"]],
            total_kN=[r["total_kN"] for r in scan["all_phases"]],
            drag_kN=[r["drag_kN"] for r in scan["all_phases"]],
            inertia_kN=[r["inertia_kN"] for r in scan["all_phases"]],
            critical_t=scan["critical"]["t"],
            critical_total_kN=scan["critical"]["total_kN"],
        ),
        fem=dict(
            F_global=fem.F_global.tolist(),
            U=U.tolist(),
            reactions={k: v.tolist() for k, v in reactions.items()},
            node_list=structure.node_list,
            internal_forces=[
                {k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
                 for k, v in m.items()} for m in internal],
        ),
    )


DEFAULT = dict(
    E=210000.0, nu=0.3, fy=355.0, rho_steel=7850.0, rho_water=1025.0,
    D_leg=2000.0, t_leg=75.0, D_brace=800.0, t_brace=30.0,
    H=17.038, T=9.4, d=50.0, U_c=1.7,
    wave_dir=38.0, current_dir=38.0, wave_model="Airy", N_harm=10,
    Cd=0.7, Cm=2.0,
    F_axial_kN=25100.0, F_shear_kN=2900.0, M_moment_kNm=0.0, M_torsion_kNm=0.0,
    sw_mode="custom", custom_sw_tonnes=1100.0, t_analysis=0.0,
)

VARIANT = dict(DEFAULT)
VARIANT.update(
    H=9.5, T=11.2, d=50.0, U_c=0.9, wave_dir=115.0, current_dir=240.0,
    M_moment_kNm=15000.0, M_torsion_kNm=4200.0,
    sw_mode="calculated", t_analysis=2.35,
)


def main():
    ref = load_reference()
    for name, params in [("default_case", DEFAULT), ("variant_case", VARIANT)]:
        out = run_case(ref, params)
        path = HERE / f"{name}.json"
        path.write_text(json.dumps(out))
        print(f"wrote {path} ({path.stat().st_size} bytes)")


if __name__ == "__main__":
    main()

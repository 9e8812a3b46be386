"""I/O roundtrip, CSV column parity, auto-generation, report and CLI smoke."""
import json
import subprocess
import sys

import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.models.autogen import (auto_generate_h_braces,
                                                 auto_generate_legs)
from small_fem_solver_tpu.utils.io import (CSV_COLUMNS, export_csv,
                                           load_model, member_force_table,
                                           save_model)


def _run_default():
    model = sf.default_3leg_jacket()
    wave = sf.airy_wave(17.038, 9.4, 50.0, 1.7)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    return model, wave, case, sf.analyze(model, wave, case, solver="chol")


def test_model_json_roundtrip(tmp_path):
    model = sf.default_3leg_jacket()
    p = tmp_path / "jacket.json"
    save_model(p, model, params={"H": 17.038})
    model2, params = load_model(p)
    assert params == {"H": 17.038}
    assert model2.node_names == model.node_names
    assert model2.member_names == model.member_names
    assert model2.member_types == model.member_types
    np.testing.assert_allclose(np.asarray(model2.coords),
                               np.asarray(model.coords))
    np.testing.assert_array_equal(np.asarray(model2.conn),
                                  np.asarray(model.conn))
    assert model2.fixed_node_names() == model.fixed_node_names()
    # roundtripped model analyzes identically
    wave = sf.airy_wave(10.0, 9.4, 50.0)
    case = sf.LoadCase(sw_mode="custom", custom_sw_tonnes=1100.0)
    r1 = sf.analyze(model, wave, case)
    r2 = sf.analyze(model2, wave, case)
    np.testing.assert_allclose(np.asarray(r1.U), np.asarray(r2.U))


def test_csv_columns_match_reference(tmp_path, golden_default):
    """Reference export columns == dict keys of `JacketAnalysisGUI_v2.py:521-532`."""
    assert CSV_COLUMNS == list(golden_default["fem"]["internal_forces"][0].keys())
    model, wave, case, res = _run_default()
    p = tmp_path / "forces.csv"
    export_csv(p, model, res)
    header = p.read_text().splitlines()[0]
    assert header.split(",") == CSV_COLUMNS


def test_member_force_table_matches_golden(golden_default):
    model, wave, case, res = _run_default()
    rows = member_force_table(model, res)
    ref = golden_default["fem"]["internal_forces"]
    for r, g in zip(rows, ref):
        assert r["member"] == g["member"]
        np.testing.assert_allclose(r["von_mises_max_MPa"],
                                   g["von_mises_max_MPa"], rtol=1e-8)
        np.testing.assert_allclose(r["Fx_max_kN"], g["Fx_max_kN"], rtol=1e-8,
                                   atol=1e-9)


def test_autogen_matches_default_legs():
    """On the default geometry the leg auto-generator reproduces the preset
    leg members (`JacketAnalysisGUI_v2.py:771-774`)."""
    from small_fem_solver_tpu.models.presets import default_3leg_jacket_geometry
    nodes, members, fixed, top = default_3leg_jacket_geometry()
    legs_expected = [m["name"] for m in members if m["type"] == "leg"]
    gen = auto_generate_legs(nodes, [])
    assert sorted(m["name"] for m in gen) == sorted(legs_expected)
    # idempotent on existing members
    full = auto_generate_legs(nodes, list(members))
    assert len(full) == len(members)


def test_autogen_h_braces_rings():
    nodes = {"A1": (0, 0, 0), "B1": (1, 0, 0), "C1": (0, 1, 0),
             "A2": (0, 0, 10), "B2": (1, 0, 10), "C2": (0, 1, 10)}
    gen = auto_generate_h_braces(nodes, [])
    names = {m["name"] for m in gen}
    assert names == {"HBrace_A1-B1", "HBrace_B1-C1", "HBrace_C1-A1",
                     "HBrace_A2-B2", "HBrace_B2-C2", "HBrace_C2-A2"}


def test_report_renders(golden_default):
    from small_fem_solver_tpu.utils.report import render_report
    model, wave, case, res = _run_default()
    text = render_report(model, wave, case, res)
    assert "SUPPORT REACTIONS" in text
    assert "CRITICAL MEMBERS" in text
    assert "Maximum utilization" in text
    # reaction totals in the report match the golden values
    g = golden_default
    tot = sum(np.array(v) for v in g["fem"]["reactions"].values())
    assert f"Rz={tot[2]/1000:.1f}kN" in text


def test_plotting(tmp_path):
    from small_fem_solver_tpu.utils.plotting import (plot_phase_scan,
                                                     plot_structure,
                                                     plot_utilization)
    model, wave, case, res = _run_default()
    plot_structure(model, tmp_path / "s.png")
    plot_utilization(model, res, tmp_path / "u.png", wave_dir=38.0,
                     current_dir=38.0)
    D_m = model.sections.D_outer[model.sect_id] / 1000.0
    scan = sf.phase_scan(wave, model.coords, model.conn, D_m, 38.0, 38.0,
                         0.7, 2.0, 1025.0, n_steps=12)
    plot_phase_scan(scan, tmp_path / "p.png")
    # frequency-domain transfer functions + response spectra
    from small_fem_solver_tpu.utils.plotting import plot_transfer
    refined = sf.refine_model(model, 2)
    prep = sf.prepare_condensed(model, refined, 2)
    sea = sf.make_random_sea(6.0, 9.0, 50.0, n_components=12, seed=1)
    tr = sf.spectral_transfer_prepared(prep, sea, case)
    plot_transfer(tr, sea, tmp_path / "h.png",
                  member_names=refined.member_names)
    for f in ("s.png", "u.png", "p.png", "h.png"):
        assert (tmp_path / f).stat().st_size > 10000


def test_cli_run_smoke(tmp_path):
    out_csv = tmp_path / "f.csv"
    out_json = tmp_path / "r.json"
    cmd = [sys.executable, "-m", "small_fem_solver_tpu.cli", "run",
           "--wave-model", "airy", "--csv", str(out_csv),
           "--json-out", str(out_json)]
    env = {"PYTHONPATH": ".", "JAX_PLATFORMS": "cpu"}
    import os
    env = {**os.environ, **env}
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ANALYSIS COMPLETE" in r.stdout
    assert out_csv.exists()
    data = json.loads(out_json.read_text())
    assert "member_forces" in data and len(data["member_forces"]) == 51


def test_cli_marine_growth_increases_loads(tmp_path):
    import os
    env = {**os.environ, "PYTHONPATH": ".", "JAX_PLATFORMS": "cpu"}
    outs = {}
    for label, extra in [("bare", []), ("grown", ["--marine-growth", "100"])]:
        out_json = tmp_path / f"{label}.json"
        cmd = [sys.executable, "-m", "small_fem_solver_tpu.cli", "run",
               "--wave-model", "airy", "--json-out", str(out_json)] + extra
        r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        outs[label] = json.loads(out_json.read_text())
    assert outs["grown"]["max_displacement_mm"] > \
        outs["bare"]["max_displacement_mm"]


def test_cli_pdelta(capsys):
    """'pdelta' prints the second-order amplification diagnostics."""
    import sys
    from small_fem_solver_tpu.cli import main
    argv = sys.argv
    try:
        sys.argv = ["cli", "pdelta", "--wave-model", "airy"]
        main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "P-delta amplification" in out
    assert "largest utilization changes" in out


def test_cli_run_refine(capsys):
    """'run --refine N' routes through the condensed large-mesh solver."""
    import sys
    from small_fem_solver_tpu.cli import main
    argv = sys.argv
    try:
        sys.argv = ["cli", "run", "--refine", "4"]
        main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "chain condensation" in out
    assert "Nodes: 174, Members: 204" in out
    assert "ANALYSIS COMPLETE" in out


def test_cli_spectral_fatigue(capsys):
    """'fatigue --spectrum jonswap' runs the irregular-sea realization and
    prints both damage estimates."""
    import sys
    from small_fem_solver_tpu.cli import main
    argv = sys.argv
    try:
        sys.argv = ["cli", "fatigue", "--wave-model", "airy",
                    "--spectrum", "jonswap", "--hs", "9.0", "--tp", "9.4",
                    "--sea-steps", "128", "--components", "24",
                    "--scf", "2.0"]
        main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "spectral fatigue screen: JONSWAP" in out
    assert "D rayleigh" in out and "D rainflow" in out


def test_cli_spectral_fatigue_refined(capsys):
    """Spectral fatigue on a refined mesh routes through the prepared
    condensed sea scan."""
    import sys
    from small_fem_solver_tpu.cli import main
    argv = sys.argv
    try:
        sys.argv = ["cli", "fatigue", "--wave-model", "airy",
                    "--spectrum", "pm", "--hs", "7.0", "--tp", "9.0",
                    "--sea-steps", "64", "--components", "16",
                    "--refine", "2"]
        main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "spectral fatigue screen: PM" in out


def test_cli_spectral_response(capsys):
    """'spectral' runs the frequency-domain (linearized) response and
    prints extremes + both closed-form damage estimates."""
    import sys
    from small_fem_solver_tpu.cli import main
    argv = sys.argv
    try:
        sys.argv = ["cli", "spectral", "--hs", "9.0", "--tp", "11.0",
                    "--components", "16", "--refine", "2",
                    "--storm-hours", "6"]
        main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "frequency-domain response: JONSWAP" in out
    assert "MPM util" in out and "D W-L" in out
    assert "base shear" in out


def test_cli_spectral_response_dynamic(capsys):
    """'spectral --dynamic' routes through the CB dynamic transfer."""
    import sys
    from small_fem_solver_tpu.cli import main
    argv = sys.argv
    try:
        sys.argv = ["cli", "spectral", "--hs", "9.0", "--tp", "11.0",
                    "--components", "12", "--refine", "2", "--dynamic",
                    "--damping", "0.03"]
        main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "dynamic CB transfer, zeta=0.03" in out
    assert "MPM util" in out and "base shear" in out


def test_cli_scatter_fatigue(capsys):
    """'fatigue --scatter' accumulates damage over a JSON scatter diagram."""
    import sys
    from small_fem_solver_tpu.cli import main
    argv = sys.argv
    try:
        sys.argv = ["cli", "fatigue", "--wave-model", "airy",
                    "--scatter", '[[4.0, 8.0, 0.5], [8.0, 9.4, 0.1]]',
                    "--sea-steps", "64", "--components", "12",
                    "--refine", "2", "--scf", "2.0"]
        main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "scatter-diagram fatigue (time-domain): 2 sea states" in out
    assert "state Hs=4.0" in out and "state Hs=8.0" in out
    assert "D rainflow" in out


def test_cli_code_check(capsys):
    """'code-check' prints the API RP 2A-WSD unity-check table."""
    import sys
    from small_fem_solver_tpu.cli import main
    argv = sys.argv
    try:
        sys.argv = ["cli", "code-check", "--wave-model", "airy"]
        main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "API RP 2A-WSD member checks" in out
    assert "KL/r" in out and ("all members pass" in out or "WARNING" in out)


def test_cli_joint_check(capsys):
    """'joint-check' prints the API RP 2A-WSD joint unity-check table."""
    import sys
    from small_fem_solver_tpu.cli import main
    argv = sys.argv
    try:
        sys.argv = ["cli", "joint-check", "--wave-model", "airy",
                    "--joint-class", "K", "--gap", "75.0"]
        main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "API RP 2A-WSD simple-joint checks (class=K" in out
    assert "beta" in out and ("all joints pass" in out or "WARNING" in out)


def test_plot_mode_and_pushover(tmp_path):
    import small_fem_solver_tpu as sf
    from small_fem_solver_tpu.ops.pushover import pushover
    from small_fem_solver_tpu.utils.plotting import plot_mode, plot_pushover

    model = sf.default_3leg_jacket()
    modal = sf.modal_analysis(model, n_modes=1, topside_mass_t=1100.0)
    p1 = tmp_path / "mode.png"
    plot_mode(model, modal.mode_shapes[0], str(p1))
    assert p1.exists() and p1.stat().st_size > 10_000

    wave = sf.airy_wave(17.038, 9.4, 50.0, 1.7)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    res = pushover(model, wave, case, lambda_max=14.0, n_lambda=8,
                   n_iter=40)
    p2 = tmp_path / "pushover.png"
    plot_pushover(res, str(p2))
    assert p2.exists() and p2.stat().st_size > 10_000


def test_cli_scatter_fatigue_freq_domain(capsys):
    """'fatigue --scatter --freq-domain' (closed-form, no time march);
    a 4-column heading row prints its heading (regression: the summary
    used to crash unpacking 4-tuples)."""
    import sys
    from small_fem_solver_tpu.cli import main
    argv = sys.argv
    try:
        sys.argv = ["cli", "fatigue",
                    "--scatter", '[[4.0, 8.0, 0.4], [7.0, 9.4, 0.1, 120.0]]',
                    "--components", "10", "--refine", "2",
                    "--freq-domain", "--dynamic"]
        main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "frequency-domain DYNAMIC (CB)" in out
    assert "heading=120 deg" in out
    assert "D W-L" in out


def test_cli_contour_spectral(capsys, tmp_path):
    """'contour --spectral': IFORM states through the FD transfer (one
    device program), MPM utilizations as the response-based check."""
    import sys
    import numpy as np
    from small_fem_solver_tpu.cli import main
    rng = np.random.default_rng(0)
    hs = rng.weibull(1.5, 300) * 3.0 + 0.3
    tp = 5.0 + 1.9 * np.sqrt(hs) + rng.normal(0, 0.5, 300)
    p = tmp_path / "climate.json"
    p.write_text(json.dumps([[float(h), float(t)]
                             for h, t in zip(hs, tp)]))
    argv = sys.argv
    try:
        sys.argv = ["cli", "contour", "--scatter", str(p),
                    "--return-years", "50", "--points", "6",
                    "--spectral", "--components", "10", "--refine", "2"]
        main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "IFORM contour" in out
    assert "contour spectral screen (quasi-static, 6 states" in out
    assert "max utilization" in out


def test_cli_save_results_roundtrip(tmp_path, capsys):
    """--save-results persists the full result pytree as npz on the run
    and spectral commands; sf.load_results rebuilds it."""
    import sys
    from small_fem_solver_tpu.cli import main
    argv = sys.argv
    p1, p2 = tmp_path / "run.npz", tmp_path / "fd.npz"
    try:
        sys.argv = ["cli", "run", "--wave-model", "airy",
                    "--save-results", str(p1)]
        main()
        sys.argv = ["cli", "spectral", "--refine", "2", "--components",
                    "8", "--hs", "6", "--tp", "9",
                    "--save-results", str(p2)]
        main()
    finally:
        sys.argv = argv
    capsys.readouterr()
    r1 = sf.load_results(p1)
    assert type(r1).__name__ == "AnalysisResults"
    assert float(np.asarray(r1.utilization).max()) > 0.1
    r2 = sf.load_results(p2)
    assert type(r2).__name__ == "FreqDomainResponse"
    assert np.isfinite(np.asarray(r2.damage_wl)).all()


def test_cli_pcg_flags(capsys):
    """'run --solver pcg --pcg-precond/--pcg-tol/--pcg-chunk' routes the
    new round-5 solver knobs through analyze() and reproduces the
    Cholesky utilization (the chunked CG dispatch is iterate-identical
    to the single-program loop; see docs/API.md)."""
    import re
    import sys
    from small_fem_solver_tpu.cli import main
    argv = sys.argv

    def max_util(out):
        m = re.search(r"Maximum utilization: ([0-9.]+)%", out)
        assert m, out
        return float(m.group(1))

    try:
        sys.argv = ["cli", "run", "--wave-model", "airy", "--f32",
                    "--solver", "pcg", "--pcg-precond", "two_level",
                    "--pcg-chunk", "50", "--pcg-tol", "1e-9"]
        main()
        u_pcg = max_util(capsys.readouterr().out)
        sys.argv = ["cli", "run", "--wave-model", "airy", "--f32",
                    "--solver", "chol"]
        main()
        u_chol = max_util(capsys.readouterr().out)
    finally:
        sys.argv = argv
    assert abs(u_pcg - u_chol) < 0.02  # percent points

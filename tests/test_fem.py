"""FEM core tests: element stiffness invariants, assembly equivalence,
and full-pipeline parity vs the reference goldens at 1e-8."""
import jax.numpy as jnp
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.ops.assembly import (assemble_bcsr, assemble_dense,
                                               bcsr_matvec, bcsr_to_dense,
                                               build_bcsr_pattern)
from small_fem_solver_tpu.ops.beams import (element_stiffness, local_axes,
                                            transformation_matrices)


def _model():
    return sf.default_3leg_jacket()


def _elem(model, E=210000.0, nu=0.3):
    G = E / (2 * (1 + nu))
    return element_stiffness(model.coords, model.conn, model.sections,
                             model.sect_id, E, G)


def test_local_axes_orthonormal():
    model = _model()
    _, _, dL, L = model.member_geometry()
    R = local_axes(dL, L)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, 1, 2)),
                               np.asarray(eye), atol=1e-12)
    # right-handed: det = +1
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-12)


def test_vertical_member_branch():
    coords = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 10.0],
                        [0.0, 0.0, 10.0], [3.0, 4.0, 10.0]])
    conn = jnp.array([[0, 1], [2, 3]], dtype=jnp.int32)
    dL = coords[conn[:, 1]] - coords[conn[:, 0]]
    L = jnp.linalg.norm(dL, axis=-1)
    R = local_axes(dL, L)
    np.testing.assert_allclose(np.asarray(R[0, 0]), [0, 0, 1], atol=1e-12)
    # reference fallback for perfectly vertical: ly = (0,1,0)? no — z x lx = 0
    # only when lx == +-z exactly; then ly = (0,1,0) (`:377`)
    np.testing.assert_allclose(np.asarray(R[0, 1]), [0, 1, 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, 1, 2)),
                               np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-12)


def test_element_stiffness_symmetric_psd():
    model = _model()
    Kg, K_local, T, L = _elem(model)
    np.testing.assert_allclose(np.asarray(Kg), np.asarray(jnp.swapaxes(Kg, 1, 2)),
                               rtol=1e-10, atol=1e-4)
    # rigid-body translation/rotation produce zero force
    for m in range(0, 51, 10):
        K = np.asarray(Kg[m])
        # translations
        for ax in range(3):
            u = np.zeros(12)
            u[ax] = u[ax + 6] = 1.0
            np.testing.assert_allclose(K @ u, 0.0, atol=np.abs(K).max() * 1e-12)


def test_rigid_body_rotation_zero_force():
    """Small rigid rotation about any axis -> zero element force."""
    model = _model()
    Kg, _, _, _ = _elem(model)
    c1 = np.asarray(model.coords[model.conn[:, 0]]) * 1000.0  # mm
    c2 = np.asarray(model.coords[model.conn[:, 1]]) * 1000.0
    rot = np.array([1e-4, -2e-4, 3e-4])
    for m in [0, 7, 20, 50]:
        u = np.zeros(12)
        u[0:3] = np.cross(rot, c1[m])
        u[3:6] = rot
        u[6:9] = np.cross(rot, c2[m])
        u[9:12] = rot
        f = np.asarray(Kg[m]) @ u
        assert np.abs(f).max() < np.abs(np.asarray(Kg[m])).max() * 1e-10


def test_euler_bernoulli_limit():
    """With shear deformation off, tip deflection of a cantilever matches
    P L^3 / 3 E I."""
    from small_fem_solver_tpu.ops.beams import local_stiffness
    from small_fem_solver_tpu.ops.sections import tube_sections
    sec = tube_sections(jnp.array([800.0]), jnp.array([30.0]))
    E, nu = 210000.0, 0.3
    G = E / (2 * (1 + nu))
    L_mm = jnp.array([7000.0])
    K = np.asarray(local_stiffness(L_mm, sec, jnp.array([0]), E, G,
                                   include_shear=False))[0]
    # clamp node 1, load node 2 in local y
    Kff = K[6:, 6:]
    F = np.zeros(6)
    P = 1e4
    F[1] = P
    u = np.linalg.solve(Kff, F)
    expected = P * 7000.0**3 / (3 * E * float(sec.Iz[0]))
    np.testing.assert_allclose(u[1], expected, rtol=1e-10)


def test_dense_vs_bcsr_assembly():
    model = _model()
    Kg, _, _, _ = _elem(model)
    K_dense = assemble_dense(Kg, model.conn, model.n_dof)
    pattern = build_bcsr_pattern(model.conn, model.n_nodes)
    A = assemble_bcsr(Kg, pattern)
    # atol covers summation-order noise: entries are O(1e10) N/mm, so 1e-4
    # absolute is ~1e-14 relative
    np.testing.assert_allclose(np.asarray(bcsr_to_dense(A)), np.asarray(K_dense),
                               rtol=1e-12, atol=1e-4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=model.n_dof))
    np.testing.assert_allclose(np.asarray(bcsr_matvec(A, x)),
                               np.asarray(K_dense @ x), rtol=1e-10, atol=1e-4)


def test_global_stiffness_matches_reference_spotcheck(golden_default):
    """K itself isn't in the goldens (too big), but K U - F = R is checked in
    the end-to-end test; here check symmetry + PSD of the free block."""
    model = _model()
    Kg, _, _, _ = _elem(model)
    K = np.asarray(assemble_dense(Kg, model.conn, model.n_dof))
    np.testing.assert_allclose(K, K.T, rtol=1e-10, atol=1e-4)
    from small_fem_solver_tpu.ops.solve import free_fixed_dofs
    free, _ = free_fixed_dofs(model.fixed_mask)
    w = np.linalg.eigvalsh(K[np.ix_(free, free)])
    assert w.min() > 0


def test_degenerate_section_euler_bernoulli_fallback():
    """Az=0/Ay=0 sections must fall back to Phi=0 (Euler-Bernoulli), not NaN
    — mirrors the reference's Ay>0/Az>0 guard (JacketAnalysisGUI_v2.py:394)."""
    from small_fem_solver_tpu.ops.beams import local_stiffness
    from small_fem_solver_tpu.ops.sections import tube_sections
    sec = tube_sections(jnp.asarray([800.0]), jnp.asarray([30.0]))
    sec0 = sec._replace(Ay=jnp.zeros_like(sec.Ay),
                        Az=jnp.zeros_like(sec.Az))
    L = jnp.asarray([7000.0])
    sid = jnp.asarray([0])
    K = local_stiffness(L, sec0, sid, 210000.0, 80769.0, include_shear=True)
    assert np.isfinite(np.asarray(K)).all()
    K_eb = local_stiffness(L, sec, sid, 210000.0, 80769.0,
                           include_shear=False)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_eb),
                               rtol=1e-12, atol=0)

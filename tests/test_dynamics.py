"""Modal analysis validation against closed-form beam dynamics."""
import jax.numpy as jnp
import numpy as np
import pytest

import small_fem_solver_tpu as sf
from small_fem_solver_tpu.models.model import build_model
from small_fem_solver_tpu.ops.dynamics import element_mass, modal_analysis


def _cantilever(n_el=16, L=30.0, D=800.0, t=30.0):
    """Vertical cantilever tube, clamped at the base."""
    nodes = {f"N{i}": (0.0, 0.0, i * L / n_el) for i in range(n_el + 1)}
    members = [{"name": f"E{i}", "node1": f"N{i}", "node2": f"N{i+1}",
                "type": "leg"} for i in range(n_el)]
    return build_model(nodes, members, ["N0"], [f"N{n_el}"],
                       leg_section=(D, t), brace_section=(D, t))


def test_mass_matrix_total_mass():
    """Rigid-body translation: 1^T M 1 over x-translations = total mass."""
    model = sf.default_3leg_jacket()
    Mg = element_mass(model.coords, model.conn, model.sections, model.sect_id)
    # per element: ones on both nodes' x-translation
    u = np.zeros(12)
    u[0] = u[6] = 1.0
    m_elems = np.einsum("i,mij,j->m", u, np.asarray(Mg), u)
    mass_per_m = np.asarray(model.sections.mass_per_m[model.sect_id])
    _, _, _, L = model.member_geometry()
    expected = mass_per_m * np.asarray(L) / 1000.0  # tonnes
    np.testing.assert_allclose(m_elems, expected, rtol=1e-10)


def test_cantilever_first_frequency_analytic():
    """f1 = (1.875^2 / 2 pi) sqrt(E I / (rho A L^4)) for a cantilever."""
    L, D, t = 30.0, 800.0, 30.0
    model = _cantilever(n_el=16, L=L, D=D, t=t)
    res = modal_analysis(model, n_modes=4)
    E = 210000e6  # Pa
    sec = model.sections
    I = float(sec.Iy[0]) * 1e-12       # m^4
    A = float(sec.Ax[0]) * 1e-6        # m^2
    rho = 7850.0
    f1 = (1.8751**2 / (2 * np.pi)) * np.sqrt(E * I / (rho * A * L**4))
    # consistent-mass FE slightly overestimates stiffness; shear deformation
    # (in K) softens; expect ~1% agreement at 16 elements
    got = float(res.frequencies_hz[0])
    np.testing.assert_allclose(got, f1, rtol=0.02)
    # first two bending modes are degenerate for a symmetric tube
    np.testing.assert_allclose(float(res.frequencies_hz[1]), got, rtol=1e-6)


def test_jacket_modal_sanity():
    model = sf.default_3leg_jacket()
    res = modal_analysis(model, n_modes=6, topside_mass_t=1100.0)
    f = np.asarray(res.frequencies_hz)
    assert (f > 0).all() and (np.diff(f) >= -1e-9).all()
    # jacket with 1100 t topside: first period in the O(1 s) range
    assert 0.2 < float(res.periods_s[0]) < 5.0
    # heavier deck -> longer period
    res2 = modal_analysis(model, n_modes=2, topside_mass_t=3000.0)
    assert float(res2.periods_s[0]) > float(res.periods_s[0])
    # mode shapes are zero at fixed DOFs
    fixed = np.repeat(np.asarray(model.fixed_mask), 6)
    assert np.abs(np.asarray(res.mode_shapes)[:, fixed]).max() == 0.0
    np.testing.assert_allclose(
        float(res.total_mass_t),
        float(jnp.sum(model.sections.mass_per_m[model.sect_id]
                      * model.member_geometry()[3]) / 1000.0) + 1100.0,
        rtol=1e-10)

"""Section-property unit tests vs closed-form thin-wall formulas and the
reference's derived values (`JacketAnalysisGUI_v2.py:122-160`)."""
import jax.numpy as jnp
import numpy as np
import pytest

from small_fem_solver_tpu.ops.sections import tube_sections, von_mises_8pt


def test_tube_properties_closed_form():
    sec = tube_sections(jnp.array([2000.0, 800.0]), jnp.array([75.0, 30.0]))
    D, t = 2000.0, 75.0
    Di = D - 2 * t
    np.testing.assert_allclose(sec.Ax[0], np.pi / 4 * (D**2 - Di**2), rtol=1e-14)
    np.testing.assert_allclose(sec.Iy[0], np.pi / 64 * (D**4 - Di**4), rtol=1e-14)
    np.testing.assert_allclose(sec.Ix[0], 2 * sec.Iy[0], rtol=1e-14)
    np.testing.assert_allclose(sec.Ay[0], 0.5 * sec.Ax[0], rtol=1e-14)
    np.testing.assert_allclose(sec.Wy[0], sec.Iy[0] / 1000.0, rtol=1e-14)
    np.testing.assert_allclose(sec.mass_per_m[0], sec.Ax[0] / 1e6 * 7850.0, rtol=1e-14)
    np.testing.assert_allclose(sec.D_t_ratio, [2000 / 75, 800 / 30], rtol=1e-14)


def test_von_mises_pure_axial():
    sec = tube_sections(jnp.array([800.0]), jnp.array([30.0]))
    Fx = jnp.array([1e6])  # N
    vm = von_mises_8pt(sec, jnp.array([0]), Fx, Fx * 0, Fx * 0, Fx * 0, Fx * 0, Fx * 0)
    np.testing.assert_allclose(vm[0], 1e6 / float(sec.Ax[0]), rtol=1e-12)


def test_von_mises_pure_shear():
    sec = tube_sections(jnp.array([800.0]), jnp.array([30.0]))
    z = jnp.zeros(1)
    Fy = jnp.array([2e5])
    vm = von_mises_8pt(sec, jnp.array([0]), z, Fy, z, z, z, z)
    tau = 2e5 / float(sec.Ay[0])
    np.testing.assert_allclose(vm[0], np.sqrt(3) * tau, rtol=1e-12)


def test_von_mises_bending_max_at_extreme_fiber():
    """For pure My the max over the 8 points must be |My| R / Iy."""
    sec = tube_sections(jnp.array([800.0]), jnp.array([30.0]))
    z = jnp.zeros(1)
    My = jnp.array([5e8])
    vm = von_mises_8pt(sec, jnp.array([0]), z, z, z, z, My, z)
    np.testing.assert_allclose(vm[0], 5e8 * float(sec.R_outer[0]) / float(sec.Iy[0]),
                               rtol=1e-12)


def test_validate_sections_thin_wall_limit():
    from small_fem_solver_tpu.ops.sections import validate_sections
    ok = tube_sections(jnp.array([2000.0]), jnp.array([75.0]))
    assert validate_sections(ok) == []
    thick = tube_sections(jnp.array([500.0]), jnp.array([100.0]))  # D/t = 5
    msgs = validate_sections(thick)
    assert len(msgs) == 1 and "D/t" in msgs[0]
    with pytest.raises(ValueError):
        validate_sections(thick, strict=True)

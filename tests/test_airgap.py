"""Air-gap screen: Airy crest identity, nonlinear crest lift, surge."""
import jax.numpy as jnp
import numpy as np
import pytest

import small_fem_solver_tpu as sf


def test_airy_crest_is_amplitude():
    """A linear wave's max crest is exactly H/2, anywhere in the footprint."""
    model = sf.default_3leg_jacket()
    wave = sf.airy_wave(10.0, 9.4, 50.0)
    res = sf.air_gap_check(model, wave, wave_dir_deg=38.0)
    np.testing.assert_allclose(float(res.crest_m), 5.0, rtol=1e-5)
    # deck defaults to the top-node elevation (27 m)
    assert res.deck_elevation_m == pytest.approx(27.0)
    np.testing.assert_allclose(float(res.air_gap_m), 22.0, rtol=1e-4)
    assert bool(res.ok)


def test_stokes_crest_above_linear_and_surge():
    """Nonlinear crests ride higher than H/2; surge/tide shift the gap 1:1;
    a low deck fails the screen."""
    model = sf.default_3leg_jacket()
    wave = sf.stokes_wave(17.038, 9.4, 50.0, order=5)
    base = sf.air_gap_check(model, wave, wave_dir_deg=38.0)
    assert float(base.crest_m) > 17.038 / 2 * 1.05
    surged = sf.air_gap_check(model, wave, wave_dir_deg=38.0,
                              surge_m=1.2, tide_m=0.8)
    np.testing.assert_allclose(float(base.air_gap_m) - float(surged.air_gap_m),
                               2.0, atol=1e-9)
    low = sf.air_gap_check(model, wave, deck_elevation_m=11.0)
    assert not bool(low.ok)
    assert float(low.air_gap_m) < 1.5


def test_cli_air_gap(capsys):
    from small_fem_solver_tpu.cli import main
    main(["air-gap", "--surge", "1.0", "--wave-model", "stokes"])
    out = capsys.readouterr().out
    assert "air gap:" in out and "max crest" in out
    main(["air-gap", "--deck-elevation", "9.0"])
    assert "INSUFFICIENT" in capsys.readouterr().out

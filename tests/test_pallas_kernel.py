"""Pallas fused-kernel parity vs the XLA-scan path (interpret mode on CPU;
the compiled kernel is exercised and verified on TPU by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blacklight_tpu import pipeline
from blacklight_tpu.camera import make_camera
from blacklight_tpu.constants import RayIntegrator
from blacklight_tpu.models import formula as formula_model
from blacklight_tpu.ops.pallas_formula import render_formula_dp
from blacklight_tpu.transfer.unpolarized import (
    ImageOptions, integrate_unpolarized)
from blacklight_tpu.utils.config import parse_config

from test_adaptive import CONFIG


@pytest.mark.parametrize("fallback_nan", [True, False])
def test_pallas_matches_scan(tmp_path, fallback_nan):
    cfg = parse_config(CONFIG.format(out=str(tmp_path / "o.npz"), res=8,
                                     max_level=0, num_regions=0, regions=""))
    cfg.ray_integrator = RayIntegrator.dp
    cfg.ray_max_steps = 800
    cfg.ray_tol_abs = 1e-6
    cfg.ray_tol_rel = 1e-6
    cfg.ray_max_retries = 20
    cfg.precision = "float32"
    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    geom, rays, freqs = make_camera(cfg, bh_m=bh_m, bh_a=bh_a,
                                    dtype=jnp.float32)
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)
    fparams = formula_model.formula_params_from_config(cfg)

    def coeff_fn(pos, kcov):
        j, a, _, bad = formula_model.formula_coefficients(
            pos, kcov, rays.momentum_factors, freqs, fparams, geom.cam_x)
        return j, a, bad

    img = integrate_unpolarized(
        rays.positions, rays.directions, rays.momentum_factors, freqs,
        params=params, coeff_fn=coeff_fn,
        opts=ImageOptions(fallback_nan=fallback_nan),
        mass_msun=mass_msun, camera_x=geom.cam_x,
        log_j_scale=float(formula_model.formula_log_j_scale(fparams)))
    I_scan = np.asarray(img["I_nu"][:, 0])

    I_pal, flags, nsamp = render_formula_dp(
        rays.positions, rays.directions, rays.momentum_factors,
        float(np.asarray(freqs)[0]), params, fparams, mass_msun,
        np.asarray(geom.cam_x),
        float(formula_model.formula_log_j_scale(fparams)),
        fallback_nan=fallback_nan, interpret=True)
    I_pal = np.asarray(I_pal)

    assert np.array_equal(np.isnan(I_pal), np.isnan(I_scan))
    assert np.array_equal(np.asarray(flags), np.asarray(img["_flags"]))
    assert np.array_equal(np.asarray(nsamp), np.asarray(img["_n_samples"]))
    scale = np.nanmax(np.abs(I_scan))
    np.testing.assert_allclose(np.nan_to_num(I_pal), np.nan_to_num(I_scan),
                               atol=1e-4 * scale)


def test_pallas_rk4_multifrequency_matches_scan(tmp_path):
    """The widened kernel (fixed-step rk4, several frequencies) matches the
    XLA-scan path - the flagship Pallas number is not a dp/single-frequency
    special case."""
    from blacklight_tpu.ops.pallas_formula import render_formula

    cfg = parse_config(CONFIG.format(out=str(tmp_path / "o.npz"), res=8,
                                     max_level=0, num_regions=0, regions=""))
    cfg.ray_integrator = RayIntegrator.rk4
    cfg.ray_max_steps = 600
    cfg.precision = "float32"
    cfg.image_num_frequencies = 3
    cfg.image_frequency_start = 1.0e11
    cfg.image_frequency_end = 4.0e11
    from blacklight_tpu.constants import FrequencySpacing
    cfg.image_frequency_spacing = FrequencySpacing.log
    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    geom, rays, freqs = make_camera(cfg, bh_m=bh_m, bh_a=bh_a,
                                    dtype=jnp.float32)
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)
    fparams = formula_model.formula_params_from_config(cfg)

    def coeff_fn(pos, kcov):
        j, a, _, bad = formula_model.formula_coefficients(
            pos, kcov, rays.momentum_factors, freqs, fparams, geom.cam_x)
        return j, a, bad

    img = integrate_unpolarized(
        rays.positions, rays.directions, rays.momentum_factors, freqs,
        params=params, coeff_fn=coeff_fn, opts=ImageOptions(),
        mass_msun=mass_msun, camera_x=geom.cam_x,
        log_j_scale=float(formula_model.formula_log_j_scale(fparams)))
    I_scan = np.asarray(img["I_nu"])                      # (B, F)

    I_pal, flags, nsamp = render_formula(
        rays.positions, rays.directions, rays.momentum_factors,
        np.asarray(freqs), params, fparams, mass_msun,
        np.asarray(geom.cam_x),
        float(formula_model.formula_log_j_scale(fparams)),
        integrator="rk4", interpret=True)
    I_pal = np.asarray(I_pal)

    assert I_pal.shape == I_scan.shape
    assert np.array_equal(np.isnan(I_pal), np.isnan(I_scan))
    assert np.array_equal(np.asarray(flags), np.asarray(img["_flags"]))
    assert np.array_equal(np.asarray(nsamp), np.asarray(img["_n_samples"]))
    scale = np.nanmax(np.abs(I_scan))
    np.testing.assert_allclose(np.nan_to_num(I_pal), np.nan_to_num(I_scan),
                               atol=1e-5 * scale, rtol=2e-4)


def test_pallas_rk2_matches_scan(tmp_path):
    from blacklight_tpu.ops.pallas_formula import render_formula

    cfg = parse_config(CONFIG.format(out=str(tmp_path / "o.npz"), res=8,
                                     max_level=0, num_regions=0, regions=""))
    cfg.ray_integrator = RayIntegrator.rk2
    cfg.ray_max_steps = 600
    cfg.precision = "float32"
    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    geom, rays, freqs = make_camera(cfg, bh_m=bh_m, bh_a=bh_a,
                                    dtype=jnp.float32)
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)
    fparams = formula_model.formula_params_from_config(cfg)

    def coeff_fn(pos, kcov):
        j, a, _, bad = formula_model.formula_coefficients(
            pos, kcov, rays.momentum_factors, freqs, fparams, geom.cam_x)
        return j, a, bad

    img = integrate_unpolarized(
        rays.positions, rays.directions, rays.momentum_factors, freqs,
        params=params, coeff_fn=coeff_fn, opts=ImageOptions(),
        mass_msun=mass_msun, camera_x=geom.cam_x,
        log_j_scale=float(formula_model.formula_log_j_scale(fparams)))
    I_scan = np.asarray(img["I_nu"][:, 0])

    I_pal, flags, nsamp = render_formula(
        rays.positions, rays.directions, rays.momentum_factors,
        float(np.asarray(freqs)[0]), params, fparams, mass_msun,
        np.asarray(geom.cam_x),
        float(formula_model.formula_log_j_scale(fparams)),
        integrator="rk2", interpret=True)
    I_pal = np.asarray(I_pal)
    assert np.array_equal(np.isnan(I_pal), np.isnan(I_scan))
    assert np.array_equal(np.asarray(nsamp), np.asarray(img["_n_samples"]))
    scale = np.nanmax(np.abs(I_scan))
    np.testing.assert_allclose(np.nan_to_num(I_pal), np.nan_to_num(I_scan),
                               atol=1e-5 * scale, rtol=2e-4)

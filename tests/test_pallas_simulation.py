"""Fused simulation-kernel parity vs the XLA path (interpret mode on CPU;
the compiled kernel is A/B-verified on TPU by scripts/bench_simulation.py).

Tolerances: the kernel's arccos/arctan2 are float32 polynomials and its
trilinear sum is reassociated, so cell fractions (and hence sampled values)
can differ from the XLA path at the 1e-7 level; image parity is gated at
rtol 2e-4 with identical NaN/flag patterns.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blacklight_tpu import pipeline, read_config
from blacklight_tpu.camera import make_camera
from blacklight_tpu.models.cuts import GeometricCuts
from blacklight_tpu.ops import pallas_simulation as psim
from blacklight_tpu.pipeline_simulation import (
    cut_params_from_config, load_grid, make_simulation_renderer,
    plasma_params_from_config)


def _setup(fixtures_dir, res=512, steps=1024, **overrides):
    cfg = read_config(str(fixtures_dir / "golden_sim_rk4_32.input"))
    cfg.simulation_file = str(fixtures_dir / "mock_small.athdf")
    cfg.camera_resolution = res
    cfg.ray_max_steps = steps
    cfg.precision = "float32"
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def _tile(rays, res, tile=32, row0=240, col0=240):
    """One coherent 32x32 pixel tile straddling the shadow (production
    dispatches image tiles, bench_simulation.py docstring) - exactly one
    kernel block, with plunging rays that terminate within the step
    budget so the I comparison is non-trivial."""
    idx = (np.arange(row0, row0 + tile)[:, None] * res
           + np.arange(col0, col0 + tile)[None, :]).reshape(-1)
    return (np.asarray(rays.positions)[idx],
            np.asarray(rays.directions)[idx],
            np.asarray(rays.momentum_factors)[idx])


def _render_both(cfg, window=psim.WINDOW, brick=psim.BRICK,
                 margin=psim.MARGIN):
    from blacklight_tpu.models import synchrotron

    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    render_fn, geom, rays, freqs, _ = make_simulation_renderer(
        cfg, wavefront=False)
    res = int(cfg.require("camera_resolution"))
    P, D, M = _tile(rays, res)
    ref = render_fn(P, D, M)

    grid, _ = load_grid(cfg, dtype=jnp.float32)
    kg = psim.prepare_kernel_grid(grid, brick=brick)
    assert kg is not None
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)
    sp = psim.sim_kernel_params(cfg, GeometricCuts.from_config(cfg),
                                plasma_params_from_config(cfg),
                                cut_params_from_config(cfg))
    from blacklight_tpu.constants import RayIntegrator
    integ = {RayIntegrator.dp: "dp", RayIntegrator.rk4: "rk4",
             RayIntegrator.rk2: "rk2"}[cfg.require("ray_integrator")]
    nu0 = float(np.asarray(freqs)[0])
    i_img, flags, nsamp, ovf = psim.render_simulation(
        P, D, M, np.asarray(freqs), params, sp, kg, mass_msun,
        np.asarray(geom.cam_x), synchrotron.log_j_scale(nu0),
        integrator=integ, window=window, brick=brick, margin=margin,
        interpret=True, rows=8)
    return ref, (np.asarray(i_img), np.asarray(flags), np.asarray(nsamp),
                 np.asarray(ovf))


@pytest.mark.parametrize("integ", ["rk4", "rk2", "dp"])
def test_kernel_matches_xla(fixtures_dir, integ):
    from blacklight_tpu.constants import RayIntegrator

    # dp steps are adaptive ATTEMPTS; the shadow tile's winding rays need
    # a deeper budget to terminate (the reference default is 7000).
    cfg = _setup(fixtures_dir, steps=2048 if integ == "dp" else 1024,
                 ray_integrator=getattr(RayIntegrator, integ))
    ref, (i_img, flags, nsamp, ovf) = _render_both(cfg)
    # Shadow-straddling tile: the fanning minority may latch overflow,
    # but the coherent majority must stay on the fast path.
    assert ovf.mean() < 0.5, f"overflow fraction {ovf.mean()}"
    I_ref = np.asarray(ref["I_nu"])
    ref_flags = np.asarray(ref["_flags"])
    ref_nsamp = np.asarray(ref["_n_samples"])
    geo_same = (flags == ref_flags) & (nsamp == ref_nsamp)
    if integ == "dp":
        # The dp error controller chaos-amplifies 1-ulp arithmetic
        # differences (compiler FMA contraction) into different
        # accept/reject sequences, so step counts differ ray by ray -
        # exactly why dp parity vs the reference is also statistical
        # (test_simulation_e2e.test_simulation_dp_quadrature_parity).
        # Both integrations satisfy the same tolerances; gate the IMAGE
        # statistically instead.
        ok = ~ovf & ~np.isnan(I_ref[:, 0])
        assert ok.sum() > 100, "too few terminated pixels to compare"
        rel = np.abs(i_img[ok] - I_ref[ok]) \
            / (np.abs(I_ref[ok]) + np.nanmax(np.abs(I_ref)) * 1e-8)
        assert np.nanmax(rel) < 6e-2, f"max rel {np.nanmax(rel)}"
        assert np.nanmean(rel) < 5e-3, f"mean rel {np.nanmean(rel)}"
        return
    # flags / n_samples are geodesic-only, but compiler fusion (FMA
    # contraction) rounds differently between the kernel and the XLA
    # scan, so O(1e-3) of rays sitting exactly on a truncation threshold
    # may flip by one sample; everything else must agree exactly.
    assert geo_same.mean() > 0.99, f"geodesic agreement {geo_same.mean()}"
    ok = ~ovf & geo_same
    np.testing.assert_array_equal(np.isnan(i_img[ok]), np.isnan(I_ref[ok]))
    good = ok[:, None] & ~np.isnan(I_ref)
    assert good.sum() > 100, "too few terminated pixels to compare"
    scale = np.nanmax(np.abs(I_ref))
    np.testing.assert_allclose(i_img[good], I_ref[good],
                               rtol=2e-4, atol=2e-4 * scale)


def test_kernel_multifrequency(fixtures_dir):
    cfg = _setup(fixtures_dir, image_num_frequencies=3,
                 image_frequency_start=1.0e11, image_frequency_end=1.0e12)
    from blacklight_tpu.constants import FrequencySpacing
    cfg.image_frequency_spacing = FrequencySpacing.log
    ref, (i_img, flags, nsamp, ovf) = _render_both(cfg)
    assert ovf.mean() < 0.2
    I_ref = np.asarray(ref["I_nu"])
    assert i_img.shape == I_ref.shape
    good = ~ovf[:, None] & ~np.isnan(I_ref)
    assert good.sum() > 100, "too few terminated pixels to compare"
    scale = np.nanmax(np.abs(I_ref))
    np.testing.assert_allclose(i_img[good], I_ref[good],
                               rtol=2e-4, atol=2e-4 * scale)


def test_kernel_overflow_flags_small_brick(fixtures_dir):
    """A brick too small for the bundle must raise the overflow latch on
    most rays (the host then re-renders them on the exact path) - never
    silently clamp."""
    cfg = _setup(fixtures_dir, steps=256)
    ref, (i_img, flags, nsamp, ovf) = _render_both(
        cfg, window=64, brick=(2, 2), margin=(0, 0))
    assert ovf.mean() > 0.5


def test_phased_matches_single_launch(fixtures_dir):
    """Phased dispatch (carry-io kernel + host compaction between phases)
    reproduces the monolithic launch: geodesic state is carried exactly,
    so flags/n_samples match ray-for-ray and I matches bitwise wherever
    neither scheme latched overflow."""
    cfg = _setup(fixtures_dir, steps=512)
    from blacklight_tpu.models import synchrotron

    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    render_fn, geom, rays, freqs, _ = make_simulation_renderer(
        cfg, wavefront=False)
    res = int(cfg.require("camera_resolution"))
    P, D, M = _tile(rays, res)

    grid, _ = load_grid(cfg, dtype=jnp.float32)
    kg = psim.prepare_kernel_grid(grid)
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)
    sp = psim.sim_kernel_params(cfg, GeometricCuts.from_config(cfg),
                                plasma_params_from_config(cfg),
                                cut_params_from_config(cfg))
    nu0 = float(np.asarray(freqs)[0])
    common = dict(integrator="rk4", rows=8)
    i1, fl1, ns1, ov1 = psim.render_simulation(
        P, D, M, np.asarray(freqs), params, sp, kg, mass_msun,
        np.asarray(geom.cam_x), synchrotron.log_j_scale(nu0),
        interpret=True, **common)
    phase_jit = lambda p, d, m, c, nb, kgrid: psim.render_simulation_phase(
        p, d, m, c, nb, np.asarray(freqs), params, sp, kgrid, mass_msun,
        np.asarray(geom.cam_x), synchrotron.log_j_scale(nu0),
        interpret=True, phase_steps=256, **common)
    i2, fl2, ns2, ov2 = psim.render_simulation_phased(
        P, D, M, np.asarray(freqs), params, sp, kg, mass_msun,
        np.asarray(geom.cam_x), synchrotron.log_j_scale(nu0),
        phase_steps=256, chunk_rays=1024, phase_jit=phase_jit, **common)
    i1, fl1, ns1, ov1, i2, fl2, ns2, ov2 = map(
        np.asarray, (i1, fl1, ns1, ov1, i2, fl2, ns2, ov2))
    ok = ~ov1 & ~ov2
    assert ok.mean() > 0.5
    np.testing.assert_array_equal(fl2[ok], fl1[ok])
    np.testing.assert_array_equal(ns2[ok], ns1[ok])
    np.testing.assert_array_equal(i2[ok], i1[ok])


def test_prepare_kernel_grid_rejects_ineligible(fixtures_dir):
    cfg = _setup(fixtures_dir)
    grid, _ = load_grid(cfg, dtype=jnp.float32)
    import dataclasses
    bad = dataclasses.replace(grid, coords="cks")
    assert psim.prepare_kernel_grid(bad) is None

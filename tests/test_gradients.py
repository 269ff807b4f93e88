"""Differentiability tests: AD vs finite differences, NaN robustness.

New capability over the reference (nothing in the C++ is differentiable):
pixel intensities are differentiable with respect to emission-model
parameters, the GRMHD fields, and the camera rays - including configs where
rays die early, go optically thick, or leave the grid (all of which
produce by-design forward NaNs that must not leak into reverse-mode).
"""

import dataclasses
import pathlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "scripts"))
sys.path.insert(0, str(pathlib.Path(__file__).parent))

from test_adaptive import CONFIG  # noqa: E402

from blacklight_tpu import pipeline  # noqa: E402
from blacklight_tpu.camera import make_camera  # noqa: E402
from blacklight_tpu.models import formula as formula_model  # noqa: E402
from blacklight_tpu.transfer.unpolarized import (  # noqa: E402
    ImageOptions, integrate_unpolarized)
from blacklight_tpu.utils.config import parse_config  # noqa: E402


@pytest.fixture(scope="module")
def formula_setup(tmp_path_factory):
    cfg = parse_config(CONFIG.format(
        out=str(tmp_path_factory.mktemp("grad") / "o.npz"),
        res=4, max_level=0, num_regions=0, regions=""))
    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    geom, rays, freqs = make_camera(cfg, bh_m=bh_m, bh_a=bh_a)
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)
    fparams = formula_model.formula_params_from_config(cfg)
    return cfg, geom, rays, freqs, params, fparams, mass_msun


def make_loss(setup, positions=None):
    cfg, geom, rays, freqs, params, fparams, mass_msun = setup

    def loss(cn0, pos):
        fp = dataclasses.replace(fparams, cn0=cn0)

        def coeff_fn(p, k):
            j, alpha, _, bad = formula_model.formula_coefficients(
                p, k, rays.momentum_factors, freqs, fp, geom.cam_x)
            return j, alpha, bad

        img = integrate_unpolarized(
            pos, rays.directions, rays.momentum_factors, freqs,
            params=params, coeff_fn=coeff_fn,
            opts=ImageOptions(fallback_nan=False),
            mass_msun=mass_msun, camera_x=geom.cam_x,
            log_j_scale=formula_model.formula_log_j_scale(fp))
        return jnp.nansum(img["I_nu"])

    return loss


def test_formula_cn0_gradient_matches_fd(formula_setup):
    """AD gradient of total flux wrt the emission amplitude matches central
    finite differences - at the FULL step count, where rays die long before
    the scan ends (the historical NaN-through-select regime)."""
    cfg, geom, rays, freqs, params, fparams, mass_msun = formula_setup
    loss = make_loss(formula_setup)
    c0 = fparams.cn0
    f = jax.jit(lambda c: loss(c, rays.positions))
    g = jax.jit(jax.grad(lambda c: loss(c, rays.positions)))(jnp.asarray(c0))
    eps = c0 * 1e-4
    fd = (f(jnp.asarray(c0 + eps)) - f(jnp.asarray(c0 - eps))) / (2 * eps)
    assert np.isfinite(g)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)


def test_pallas_cn0_gradient_matches_scan_and_fd(formula_setup):
    """The custom_vjp Pallas kernel's cn0 gradient (in-kernel forward-mode
    tangents, ops/pallas_formula.make_formula_vjp_renderer) agrees with the
    scan path's reverse-mode AD and with central finite differences."""
    from blacklight_tpu.ops.pallas_formula import make_formula_vjp_renderer

    cfg, geom, rays, freqs, params, fparams, mass_msun = formula_setup
    render = make_formula_vjp_renderer(
        freqs, params, fparams, mass_msun, np.asarray(geom.cam_x),
        float(formula_model.formula_log_j_scale(fparams)),
        fallback_nan=False, interpret=True)

    def loss_k(c):
        i_img, _, _ = render(c, rays.positions, rays.directions,
                             rays.momentum_factors)
        return jnp.sum(i_img)

    c0 = jnp.asarray(fparams.cn0, jnp.float32)
    val_k, g_k = jax.jit(jax.value_and_grad(loss_k))(c0)
    assert np.isfinite(float(g_k))

    # Central finite differences through the kernel itself: the tangent
    # must match the kernel's own function tightly.
    f = jax.jit(loss_k)
    eps = float(c0) * 1e-3
    fd = (f(c0 + eps) - f(c0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g_k), float(fd), rtol=1e-3)

    # Scan-path reverse-mode on the same bundle: agreement at the same
    # quadrature level as the forward images (f32 capped-step kernel vs
    # f64 scan, test_pallas_kernel.py).
    loss_s = make_loss(formula_setup)
    g_s = jax.jit(jax.grad(lambda c: loss_s(c, rays.positions)))(c0)
    np.testing.assert_allclose(float(g_k), float(g_s), rtol=2e-2)

    # Pose inputs are stop_gradient on the kernel path (documented): the
    # position cotangent must come back exactly zero, not garbage.
    gp = jax.jit(jax.grad(
        lambda p: jnp.sum(render(c0, p, rays.directions,
                                 rays.momentum_factors)[0])))(rays.positions)
    assert not np.any(np.asarray(gp))


def test_pallas_fit_gradients_match_fd(formula_setup):
    """The multi-parameter fit renderer (cn0, r0, h in-kernel tangents)
    matches central finite differences through the kernel for every
    parameter."""
    from blacklight_tpu.ops.pallas_formula import make_formula_fit_renderer

    cfg, geom, rays, freqs, params, fparams, mass_msun = formula_setup
    fp = dataclasses.replace(fparams, h=0.4)  # h=0 would zero the h grad
    render = make_formula_fit_renderer(
        freqs, params, fp, mass_msun, np.asarray(geom.cam_x),
        float(formula_model.formula_log_j_scale(fp)),
        fallback_nan=False, interpret=True,
        fit_params=("cn0", "r0", "h"))

    theta0 = {"cn0": jnp.asarray(fp.cn0, jnp.float32),
              "r0": jnp.asarray(fp.r0, jnp.float32),
              "h": jnp.asarray(fp.h, jnp.float32)}

    def loss(theta):
        i_img, _, _ = render(theta, rays.positions, rays.directions,
                             rays.momentum_factors)
        return jnp.sum(i_img)

    f = jax.jit(loss)
    g = jax.jit(jax.grad(loss))(theta0)
    for p in theta0:
        eps = float(theta0[p]) * 1e-3
        tp = dict(theta0, **{p: theta0[p] + eps})
        tm = dict(theta0, **{p: theta0[p] - eps})
        fd = (f(tp) - f(tm)) / (2 * eps)
        assert np.isfinite(float(g[p])), p
        np.testing.assert_allclose(float(g[p]), float(fd), rtol=5e-3,
                                   err_msg=p)
        assert float(g[p]) != 0.0, p


def test_formula_camera_gradient_finite(formula_setup):
    """Gradient wrt pixel positions (camera pose) flows through the full
    geodesic integration and stays finite."""
    cfg, geom, rays, freqs, params, fparams, mass_msun = formula_setup
    loss = make_loss(formula_setup)
    g = jax.jit(jax.grad(lambda p: loss(jnp.asarray(fparams.cn0), p)))(
        rays.positions)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


def test_simulation_gradient_with_nan_fallback(tmp_path):
    """Gradient wrt the density field stays finite with fallback_nan=true
    and rays leaving the grid (the reference's NaN-poisoning semantics are
    reproduced via masks, not NaN primals)."""
    import generate_mock_simulation as gen
    from test_loaders import BASE_CONFIG
    from blacklight_tpu.pipeline_simulation import (
        load_grid, make_simulation_coeff_fns)

    # Grid covers the camera sphere (r_max > camera_r) but has an inner
    # hole (r_min = 4 > horizon): plunging rays sample off-grid -> NaN
    # pixels; grazing rays stay finite.
    p = dict(gen.DEFAULTS, r_min=4.0, r_max=60.0)
    fields = gen.make_fields(p)
    gen.write_athena(str(tmp_path / "m.athdf"), fields, p)
    cfg = parse_config(BASE_CONFIG.format(
        fmt="athena", path=str(tmp_path / "m.athdf"), coord="sks",
        out=str(tmp_path / "o.npz")))
    cfg.camera_resolution = 4
    cfg.ray_max_steps = 1200
    cfg.fallback_nan = True
    cfg.cut_omit_out = -1.0

    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    grid0, _ = load_grid(cfg)
    geom, rays, freqs = make_camera(cfg, bh_m=bh_m, bh_a=bh_a)
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)

    def total_flux(scale):
        grid = dataclasses.replace(
            grid0, prim=grid0.prim.at[grid0.ind["rho"]].multiply(scale))
        coeff_fn, cell_fn, log_scale = make_simulation_coeff_fns(
            cfg, grid, geom, freqs, rays.momentum_factors)
        img = integrate_unpolarized(
            rays.positions, rays.directions, rays.momentum_factors, freqs,
            params=params, coeff_fn=coeff_fn, opts=ImageOptions(),
            mass_msun=mass_msun, camera_x=geom.cam_x, log_j_scale=log_scale)
        return jnp.nansum(img["I_nu"]), img["I_nu"]

    (flux, img), g = jax.jit(jax.value_and_grad(total_flux, has_aux=True))(1.0)
    # Some pixels ARE NaN (fallback semantics preserved) ...
    assert np.isnan(np.asarray(img)).any()
    # ... yet the gradient over the finite ones is finite and nonzero
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_pose_gradient_dp_f32_matches_fd():
    """Camera-pose gradients through the dp integrator are finite and
    FD-correct in float32. Regression: the dp controller's
    err**(-0.2) and 1/ds_dlam carried VJP factors that overflow float32
    on parked/exact lanes (x**(-1.2), 1/x^2 at x ~ 1e-300), NaN-poisoning
    every ray's pose gradient even though the forward image was finite
    (ops/geodesic.py). rk4 was unaffected - only dp has the controller."""
    from blacklight_tpu import read_config
    from blacklight_tpu.models import formula as formula_model

    cfg = read_config(str(pathlib.Path(__file__).parent
                          / "fixtures/golden_formula_32.input"))
    cfg.camera_resolution = 4
    cfg.ray_max_steps = 600
    cfg.precision = "float32"
    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    geom, rays, freqs = make_camera(cfg, bh_m=bh_m, bh_a=bh_a,
                                    dtype=jnp.float32)
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)
    fp = formula_model.formula_params_from_config(cfg)

    def loss(pos):
        def coeff_fn(p, k):
            j, a, _, bad = formula_model.formula_coefficients(
                p, k, rays.momentum_factors, freqs, fp, geom.cam_x)
            return j, a, bad

        img = integrate_unpolarized(
            pos, rays.directions, rays.momentum_factors, freqs,
            params=params, coeff_fn=coeff_fn,
            opts=ImageOptions(fallback_nan=False), mass_msun=mass_msun,
            camera_x=geom.cam_x,
            log_j_scale=formula_model.formula_log_j_scale(fp))
        return jnp.nansum(img["I_nu"])

    g = np.asarray(jax.jit(jax.grad(loss))(rays.positions))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0

    # FD correctness in float64 (float32 central differences are pure
    # noise here: the loss's f32 resolution is ~1e-11 while the
    # directional derivative is ~1e-8, and pos + eps*e quantizes at
    # |pos| ~ 1000); reverse and forward mode must also agree.
    geom64, rays64, freqs64 = make_camera(cfg, bh_m=bh_m, bh_a=bh_a,
                                          dtype=jnp.float64)

    def loss64(pos):
        def coeff_fn(p, k):
            j, a, _, bad = formula_model.formula_coefficients(
                p, k, rays64.momentum_factors, freqs64, fp, geom64.cam_x)
            return j, a, bad

        img = integrate_unpolarized(
            pos, rays64.directions, rays64.momentum_factors, freqs64,
            params=params, coeff_fn=coeff_fn,
            opts=ImageOptions(fallback_nan=False), mass_msun=mass_msun,
            camera_x=geom64.cam_x,
            log_j_scale=formula_model.formula_log_j_scale(fp))
        return jnp.nansum(img["I_nu"])

    e = jnp.asarray(np.broadcast_to(
        np.array([0.0, 0.3, -0.2, 0.1]), rays64.positions.shape))
    g64 = jax.jit(jax.grad(loss64))(rays64.positions)
    gd = float(jnp.sum(g64 * e))
    _, jv = jax.jit(lambda p, t: jax.jvp(loss64, (p,), (t,)))(
        rays64.positions, e)
    np.testing.assert_allclose(gd, float(jv), rtol=1e-8)

    f = jax.jit(lambda d: loss64(rays64.positions + d * e))
    eps = 1e-4
    fd = (float(f(jnp.float64(eps))) - float(f(jnp.float64(-eps)))) \
        / (2 * eps)
    np.testing.assert_allclose(gd, fd, rtol=1e-4)


def test_simulation_prim_gradient_finite_f32(tmp_path):
    """d flux / d EVERY grid cell is finite in float32, including floor-
    density cells (rho ~ 1e-8). Regression: kb_tt_tot_cgs used to divide
    by rho_cgs (~1e-25), whose VJP intermediate 1/rho_cgs^2 overflows
    float32 to inf, poisoning the whole-field gradient even when every
    pixel is finite (synchrotron.py fluid_state)."""
    import generate_mock_simulation as gen
    from test_loaders import BASE_CONFIG
    from blacklight_tpu.pipeline_simulation import (
        load_grid, make_simulation_coeff_fns)

    fields = gen.make_fields(gen.DEFAULTS)
    gen.write_athena(str(tmp_path / "m.athdf"), fields, gen.DEFAULTS)
    cfg = parse_config(BASE_CONFIG.format(
        fmt="athena", path=str(tmp_path / "m.athdf"), coord="sks",
        out=str(tmp_path / "o.npz")))
    cfg.camera_resolution = 8
    cfg.ray_max_steps = 300
    cfg.precision = "float32"

    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    grid0, _ = load_grid(cfg)
    geom, rays, freqs = make_camera(cfg, bh_m=bh_m, bh_a=bh_a,
                                    dtype=jnp.float32)
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)

    def total_flux(prim):
        grid = dataclasses.replace(grid0, prim=prim)
        coeff_fn, cell_fn, log_scale = make_simulation_coeff_fns(
            cfg, grid, geom, freqs, rays.momentum_factors)
        img = integrate_unpolarized(
            rays.positions, rays.directions, rays.momentum_factors, freqs,
            params=params, coeff_fn=coeff_fn,
            opts=ImageOptions(fallback_nan=False), mass_msun=mass_msun,
            camera_x=geom.cam_x, log_j_scale=log_scale)
        return jnp.nansum(img["I_nu"])

    g = np.asarray(jax.jit(jax.grad(total_flux))(grid0.prim))
    assert np.isfinite(g).all()
    assert (g != 0).any()


def test_polarized_gradient_matches_fd(fixtures_dir):
    """AD gradient of total Stokes-I flux wrt a density scale through the
    FULL polarized path (coherency transport + tetrad coupling + Faraday
    rotation + admissibility clamps) matches central finite differences.
    The scan body is jax.checkpoint'ed, so backward rematerializes each
    step instead of storing every per-step intermediate."""
    from blacklight_tpu import read_config
    from blacklight_tpu.pipeline_simulation import (
        load_grid, make_simulation_coeff_fns)
    from blacklight_tpu.transfer.polarized import integrate_polarized

    cfg = read_config(str(fixtures_dir / "golden_polarized_rk4_32.input"))
    cfg.simulation_file = str(fixtures_dir / "mock_small.athdf")
    cfg.camera_resolution = 2
    cfg.ray_max_steps = 2000

    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    grid0, _ = load_grid(cfg)
    geom, rays, freqs = make_camera(cfg, bh_m=bh_m, bh_a=bh_a)
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)

    def stokes(scale):
        grid = dataclasses.replace(
            grid0, prim=grid0.prim.at[grid0.ind["rho"]].multiply(scale))
        coeff_fn, cell_fn, log_scale = make_simulation_coeff_fns(
            cfg, grid, geom, freqs, rays.momentum_factors, polarized=True)
        img = integrate_polarized(
            rays.positions, rays.directions, rays.momentum_factors, freqs,
            params=params, coeff_fn=coeff_fn, opts=ImageOptions(),
            mass_msun=mass_msun, camera_x=geom.cam_x,
            camera_u_con=geom.u_con, camera_u_cov=geom.u_cov,
            camera_vert_con_c=geom.vert_con_c, log_j_scale=log_scale)
        return (jnp.nansum(img["I_nu"]) + jnp.nansum(jnp.abs(img["Q_nu"]))
                + jnp.nansum(jnp.abs(img["V_nu"])))

    f = jax.jit(stokes)
    g = jax.jit(jax.grad(stokes))(jnp.asarray(1.0))
    eps = 1e-4
    fd = (f(jnp.asarray(1.0 + eps)) - f(jnp.asarray(1.0 - eps))) / (2 * eps)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-3)


def test_polarized_gradient_rotation_split_finite(fixtures_dir):
    """The Strang-rotation-split coupling mode also has finite, nonzero
    gradients (clamp ladders are where()-sanitized)."""
    from blacklight_tpu import read_config
    from blacklight_tpu.pipeline_simulation import (
        load_grid, make_simulation_coeff_fns)
    from blacklight_tpu.transfer.polarized import integrate_polarized

    cfg = read_config(str(fixtures_dir / "golden_polarized_rk4_32.input"))
    cfg.simulation_file = str(fixtures_dir / "mock_small.athdf")
    cfg.camera_resolution = 2
    cfg.ray_max_steps = 2000

    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    grid0, _ = load_grid(cfg)
    geom, rays, freqs = make_camera(cfg, bh_m=bh_m, bh_a=bh_a)
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)

    def total(scale):
        grid = dataclasses.replace(
            grid0, prim=grid0.prim.at[grid0.ind["rho"]].multiply(scale))
        coeff_fn, cell_fn, log_scale = make_simulation_coeff_fns(
            cfg, grid, geom, freqs, rays.momentum_factors, polarized=True)
        img = integrate_polarized(
            rays.positions, rays.directions, rays.momentum_factors, freqs,
            params=params, coeff_fn=coeff_fn, opts=ImageOptions(),
            mass_msun=mass_msun, camera_x=geom.cam_x,
            camera_u_con=geom.u_con, camera_u_cov=geom.u_cov,
            camera_vert_con_c=geom.vert_con_c, log_j_scale=log_scale,
            rotation_split=True)
        return jnp.nansum(img["I_nu"])

    g = jax.jit(jax.grad(total))(jnp.asarray(1.0))
    assert np.isfinite(float(g)) and float(g) != 0.0

"""End-to-end orchestration: config -> camera -> fused ray trace -> output.

Plays the role of the reference's main() (src/blacklight.cpp:31-273) with the
same per-stage timing report, but the geodesic and radiation stages are a
single fused jitted computation on the formula/unpolarized path.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from blacklight_tpu.constants import ModelType, Physics, RayIntegrator
from blacklight_tpu.camera import make_camera
from blacklight_tpu.models import formula as formula_model
from blacklight_tpu.ops import geodesic
from blacklight_tpu.output import (
    assemble_npz_arrays,
    format_filename,
    validate_output_options,
    write_output,
)
from blacklight_tpu.transfer.unpolarized import ImageOptions, integrate_unpolarized
from blacklight_tpu.utils.errors import BlacklightError, blacklight_warning


def compute_dtype(cfg):
    precision = cfg.precision or "float64"
    if precision == "float32":
        return jnp.float32
    if precision == "float64":
        return jnp.float64
    raise BlacklightError(f"Unknown precision ({precision}) in input file.")


def geodesic_params_from_config(cfg, bh_m: float, bh_a: float) -> geodesic.GeodesicParams:
    integrator = cfg.require("ray_integrator")
    kwargs = {}
    if integrator == RayIntegrator.dp:
        kwargs = dict(ray_tol_abs=cfg.require("ray_tol_abs"),
                      ray_tol_rel=cfg.require("ray_tol_rel"),
                      ray_max_retries=cfg.require("ray_max_retries"))
    from blacklight_tpu.constants import RayTerminate
    ray_terminate = cfg.require("ray_terminate")
    ray_factor = cfg.require("ray_factor") if ray_terminate != RayTerminate.photon \
        else 0.0
    return geodesic.GeodesicParams(
        integrator=integrator, bh_m=bh_m, bh_a=bh_a,
        ray_flat=cfg.require("ray_flat"),
        ray_step=cfg.require("ray_step"),
        ray_max_steps=cfg.require("ray_max_steps"),
        r_terminate=geodesic.terminate_radius(ray_terminate, ray_factor, bh_m, bh_a),
        camera_r=cfg.require("camera_r"),
        r_horizon=geodesic.horizon_radius(bh_m, bh_a),
        **kwargs)


def bh_mass_spin(cfg):
    """(bh_m, bh_a, mass_msun) per model type (geodesic_integrator.cpp:107-116,
    radiation_integrator.cpp:420-431)."""
    model = cfg.require("model_type")
    if model == ModelType.simulation:
        bh_a = cfg.require("simulation_a")
        mass_msun = cfg.require("simulation_m_msun")
    else:
        bh_a = cfg.require("formula_spin")
        mass_msun = cfg.require("formula_mass") * Physics.c ** 2 / Physics.gg_msun
    return 1.0, bh_a, mass_msun


def render_formula_image(cfg, *, positions=None, directions=None,
                         momentum_factors=None, early_exit: bool = True):
    """Unpolarized formula-model image over the root (or given) pixel bundle.

    Returns (image_dict, camera_rays, frequencies, mass_msun).
    """
    dtype = compute_dtype(cfg)
    bh_m, bh_a, mass_msun = bh_mass_spin(cfg)
    geom, rays, frequencies = make_camera(cfg, bh_m=bh_m, bh_a=bh_a, dtype=dtype)
    if positions is None:
        positions = rays.positions
        directions = rays.directions
        momentum_factors = rays.momentum_factors
    params = geodesic_params_from_config(cfg, bh_m, bh_a)
    fparams = formula_model.formula_params_from_config(cfg)
    opts = ImageOptions.from_config(cfg)
    camera_x = geom.cam_x

    def coeff_fn(pos, kcov, mom=momentum_factors):
        j, alpha, _ = formula_model.formula_coefficients(
            pos, kcov, mom, frequencies, fparams, camera_x)
        return j, alpha

    fused = jax.jit(functools.partial(
        integrate_unpolarized, params=params, coeff_fn=coeff_fn, opts=opts,
        mass_msun=mass_msun, camera_x=camera_x, early_exit=early_exit,
        log_j_scale=formula_model.formula_log_j_scale(fparams)))
    image = fused(positions, directions, momentum_factors, frequencies)
    image = jax.tree.map(lambda a: np.asarray(a), image)
    return image, rays, frequencies, mass_msun


def run(cfg, snapshot: Optional[int] = None, quiet: bool = False) -> dict:
    """Full run for one snapshot (formula model path).

    Returns the dict of named output arrays written to disk.
    """
    validate_output_options(cfg)
    model = cfg.require("model_type")
    t0 = time.time()
    if model == ModelType.formula:
        image, rays, frequencies, mass_msun = render_formula_image(cfg)
    else:
        from blacklight_tpu.pipeline_simulation import render_simulation_image
        image, rays, frequencies, mass_msun = render_simulation_image(
            cfg, snapshot=snapshot)
    t_image = time.time() - t0

    n_bad = int(np.sum(image["_flags"]))
    if n_bad > 0:
        blacklight_warning(
            f"{n_bad} out of {len(image['_flags'])} geodesics terminate unexpectedly.")

    rendering = None
    if "rendering" in image:
        # (num_pix, n_img, 3) -> (n_img, 3, num_pix)
        rendering = np.transpose(np.asarray(image["rendering"]), (1, 2, 0))
    arrays = assemble_npz_arrays(cfg, image, mass_msun=mass_msun,
                                 frequencies=frequencies, camera_rays=rays,
                                 rendering=rendering)
    path = format_filename(cfg.require("output_file"), snapshot)
    # npy/raw need the packed (quantities, res, res) image block
    res = cfg.require("camera_resolution")
    packed = None
    from blacklight_tpu.constants import OutputFormat
    if cfg.require("output_format") != OutputFormat.npz:
        packed = np.asarray(image["I_nu"]).reshape(1, res, res) \
            if "I_nu" in image else None
        if "Q_nu" in image:
            packed = np.stack([
                np.asarray(image[k]).reshape(res, res)
                for k in ("I_nu", "Q_nu", "U_nu", "V_nu")])
    write_output(cfg, path, arrays, image_packed=packed)

    if not quiet:
        print("Calculation completed.")
        print(f"Elapsed time:            {time.time() - t0:.6g} s")
        print(f"  Integrating rays+image: {t_image:.6g} s (fused)")
    return arrays

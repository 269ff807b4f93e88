"""Benchmark: rays/s/chip on the 1024^2 formula-model camera (fused
geodesic + unpolarized RT, float32, single chip, pixel-chunked dispatch).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "rays/s", "vs_baseline": N}

Baseline: the reference C++ binary (OpenMP, 4 threads as configured in
input/example_formula.input) renders the same physics at 128^2 in 46.6 s
(40.4 s geodesics + 6.2 s RT; measured on this machine from /root/reference
built with -O3) = 351.5 rays/s. vs_baseline is ours / 351.5.
"""

from __future__ import annotations

import functools
import json
import os
import pathlib
import time

REFERENCE_RAYS_PER_S = 16384 / 46.6  # measured: reference example_formula
RESOLUTION = 1024
CHUNK = 256 * 1024  # rays per device dispatch


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from blacklight_tpu import read_config
    from blacklight_tpu import pipeline
    from blacklight_tpu.camera import make_camera
    from blacklight_tpu.models import formula as formula_model
    from blacklight_tpu.transfer.unpolarized import ImageOptions, integrate_unpolarized

    ref_input = "/root/reference/input/example_formula.input"
    if os.path.exists(ref_input):
        cfg = read_config(ref_input)
    else:
        cfg = read_config(str(pathlib.Path(__file__).parent
                              / "tests/fixtures/golden_formula_32.input"))
    cfg.camera_resolution = RESOLUTION
    cfg.precision = "float32"
    dtype = jnp.float32

    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    geom, rays, frequencies = make_camera(cfg, bh_m=bh_m, bh_a=bh_a, dtype=dtype)
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)
    fparams = formula_model.formula_params_from_config(cfg)
    opts = ImageOptions(fallback_nan=cfg.require("fallback_nan"))
    camera_x = geom.cam_x

    @jax.jit
    def fused_chunk(p, d, m):
        def coeff_fn(pos, kcov):
            j, alpha, _ = formula_model.formula_coefficients(
                pos, kcov, m, frequencies, fparams, camera_x)
            return j, alpha

        return integrate_unpolarized(
            p, d, m, frequencies, params=params, coeff_fn=coeff_fn, opts=opts,
            mass_msun=mass_msun, camera_x=camera_x, early_exit=True,
            log_j_scale=formula_model.formula_log_j_scale(fparams))

    n = RESOLUTION * RESOLUTION

    def render_all():
        outs = []
        for i in range(0, n, CHUNK):
            outs.append(fused_chunk(rays.positions[i:i + CHUNK],
                                    rays.directions[i:i + CHUNK],
                                    rays.momentum_factors[i:i + CHUNK]))
        jax.block_until_ready(outs)
        return outs

    render_all()  # warm up (compile + first run)

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = render_all()
        times.append(time.perf_counter() - t0)
    t = min(times)
    rays_per_s = n / t

    i_nu = np.concatenate([np.asarray(o["I_nu"]) for o in outs])
    assert np.isfinite(np.nanmax(i_nu)), "non-finite image"

    print(json.dumps({
        "metric": f"rays/s/chip formula {RESOLUTION}^2 fused geodesic+RT",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / REFERENCE_RAYS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()

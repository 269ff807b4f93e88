"""Multi-host simulation on one host: two jax processes over localhost.

Exercises parallel/distributed.py for real (SURVEY 4 / 5.8): the workers
handshake via jax.distributed, build the pod mesh, render their pixel
shards of a formula image, and reduce a global-flux gradient across
processes. The test asserts both processes agree and match a
single-process computation.
"""

import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("nproc", [2])
def test_two_process_render_and_gradient(tmp_path, nproc):
    worker = pathlib.Path(__file__).parent / "helpers_multiprocess_worker.py"
    port = _free_port()
    procs = []
    outs = []
    for pid in range(nproc):
        out = tmp_path / f"proc{pid}.npz"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid), str(nproc),
             str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    results = [np.load(o) for o in outs]
    for r in results:
        assert int(r["process_count"]) == nproc
    # Every process sees the same global flux, gradient, and image
    for r in results[1:]:
        np.testing.assert_allclose(r["flux"], results[0]["flux"], rtol=1e-12)
        np.testing.assert_allclose(r["grad"], results[0]["grad"], rtol=1e-12)
        np.testing.assert_allclose(r["image"], results[0]["image"],
                                   rtol=1e-12)

    # ... and they match a single-process computation of the same thing
    import dataclasses

    import jax
    import jax.numpy as jnp

    from blacklight_tpu import pipeline, read_config
    from blacklight_tpu.camera import make_camera
    from blacklight_tpu.models import formula as formula_model
    from blacklight_tpu.transfer.unpolarized import (ImageOptions,
                                                     integrate_unpolarized)

    fixtures = pathlib.Path(__file__).parent / "fixtures"
    cfg = read_config(str(fixtures / "golden_formula_32.input"))
    cfg.camera_resolution = 8
    cfg.ray_max_steps = 600
    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    geom, rays, freqs = make_camera(cfg, bh_m=bh_m, bh_a=bh_a)
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)
    fparams = formula_model.formula_params_from_config(cfg)

    def total_flux(cn0):
        fp = dataclasses.replace(fparams, cn0=cn0)

        def coeff_fn(p, k):
            j, alpha, _, bad = formula_model.formula_coefficients(
                p, k, rays.momentum_factors, freqs, fp, geom.cam_x)
            return j, alpha, bad

        img = integrate_unpolarized(
            rays.positions, rays.directions, rays.momentum_factors, freqs,
            params=params, coeff_fn=coeff_fn,
            opts=ImageOptions(fallback_nan=False), mass_msun=mass_msun,
            camera_x=geom.cam_x, early_exit=False,
            log_j_scale=formula_model.formula_log_j_scale(fp))
        return jnp.sum(img["I_nu"]), img["I_nu"]

    (flux, img), grad = jax.jit(
        jax.value_and_grad(total_flux, has_aux=True))(
            jnp.asarray(fparams.cn0))
    np.testing.assert_allclose(results[0]["flux"], float(flux), rtol=1e-10)
    np.testing.assert_allclose(results[0]["grad"], float(grad), rtol=1e-10)
    np.testing.assert_allclose(results[0]["image"], np.asarray(img),
                               rtol=1e-10)

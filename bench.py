"""Benchmark: rays/s/chip on the 1024^2 formula-model camera (fused
geodesic + unpolarized RT, float32, single chip).

Primary path: the Pallas TPU kernel (ops/pallas_formula.py) - one ray block
per 64x64 image tile lives entirely in VMEM for its full integration.
Before timing, its image is verified against the XLA-scan path; on mismatch
or kernel failure the scan path's number is reported instead.

Scan path dispatches rays in 128x128 image tiles: ray lengths correlate
strongly with image position (photon-ring pixels orbit ~10x longer), so
small spatially coherent bundles let the early-exit while_loop finish each
bundle as soon as ITS longest ray ends instead of the whole image's.

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
TILE = 128  # image tile side; one dispatch per tile


def wait_for_chip(budget_s: float) -> bool:
    """Block until the axon TPU answers a trivial jit, up to budget_s.

    The remote chip is sometimes unavailable for stretches; importing jax
    in THIS process then would hang in the tunnel handshake with no way to
    recover. Probe in short-lived subprocesses instead (each under its own
    timeout) and only let the real bench initialize jax once a probe
    succeeds. Returns True if the chip answered, False if the budget ran
    out (the bench proceeds anyway and fails honestly).
    """
    import subprocess
    import sys

    probe = ("import jax, jax.numpy as jnp;"
             "assert jax.devices()[0].platform != 'cpu';"
             "jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)));"
             "print('CHIP_OK')")
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                text=True, timeout=240)
            if "CHIP_OK" in out.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            print(f"WARNING: TPU chip did not answer within {budget_s:.0f}s "
                  f"({attempt} probes); proceeding anyway.", file=sys.stderr)
            return False
        print(f"chip probe {attempt} failed; retrying...", file=sys.stderr)
        time.sleep(min(120.0, max(0.0, deadline - time.monotonic())))


def main() -> None:
    wait_for_chip(float(os.environ.get("BLACKLIGHT_BENCH_CHIP_WAIT", "1500")))

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
            j, alpha, _, bad = formula_model.formula_coefficients(
                pos, kcov, m, frequencies, fparams, camera_x)
            return j, alpha, bad

        return integrate_unpolarized(
            p, d, m, frequencies, params=params, coeff_fn=coeff_fn, opts=opts,
            mass_msun=mass_msun, camera_x=camera_x, early_exit=True,
            log_j_scale=formula_model.formula_log_j_scale(fparams))

    n = RESOLUTION * RESOLUTION

    # Tile-ordered ray permutation (see module docstring)
    idx = np.arange(n).reshape(RESOLUTION, RESOLUTION)
    order = idx.reshape(RESOLUTION // TILE, TILE, RESOLUTION // TILE,
                        TILE).transpose(0, 2, 1, 3).reshape(-1)
    positions = rays.positions[order]
    directions = rays.directions[order]
    momentum_factors = rays.momentum_factors[order]
    chunk = TILE * TILE

    def render_all():
        outs = []
        for i in range(0, n, chunk):
            outs.append(fused_chunk(positions[i:i + chunk],
                                    directions[i:i + chunk],
                                    momentum_factors[i:i + chunk]))
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

    i_scan = np.concatenate([np.asarray(o["I_nu"])[:, 0] for o in outs])
    assert np.isfinite(np.nanmax(i_scan)), "non-finite image"
    label = "fused geodesic+RT"

    # Pallas kernel path: verify against the scan image, then time it
    try:
        from blacklight_tpu.ops.pallas_formula import render_formula_dp

        T_PAL = 64
        idx = np.arange(n).reshape(RESOLUTION, RESOLUTION)
        order_p = idx.reshape(RESOLUTION // T_PAL, T_PAL,
                              RESOLUTION // T_PAL, T_PAL
                              ).transpose(0, 2, 1, 3).reshape(-1)
        P = np.asarray(rays.positions)[order_p]
        D = np.asarray(rays.directions)[order_p]
        M = np.asarray(rays.momentum_factors)[order_p]
        nu = float(np.asarray(frequencies)[0])
        ljs = float(formula_model.formula_log_j_scale(fparams))
        run_pal = jax.jit(functools.partial(
            render_formula_dp, frequency=nu, params=params, fp=fparams,
            mass_msun=mass_msun, camera_x=np.asarray(geom.cam_x),
            log_j_scale=ljs,
            fallback_nan=cfg.require("fallback_nan")))
        I_pal, _, _ = run_pal(P, D, M)
        jax.block_until_ready(I_pal)
        inv = np.empty(n, int)
        inv[order_p] = np.arange(n)
        i_pal = np.asarray(I_pal)[inv]
        # correctness gate: same NaN set, small relative error on the scan
        # tile ordering's native layout
        i_scan_full = np.empty(n)
        i_scan_full[order] = i_scan
        rel = np.abs(i_pal - i_scan_full) / (np.abs(i_scan_full)
                                             + np.nanmax(i_scan_full) * 1e-6)
        flux_rel = abs(np.nansum(i_pal) - np.nansum(i_scan_full)) \
            / abs(np.nansum(i_scan_full))
        # Photon-ring pixels are chaotic: any two f32 schedules diverge
        # there. Gate on statistics: identical NaN sets, <0.5% of pixels
        # past 1e-3 relative, and matching total flux.
        ok = (np.array_equal(np.isnan(i_pal), np.isnan(i_scan_full))
              and np.mean(np.nan_to_num(rel) > 1e-3) < 5e-3
              and flux_rel < 1e-3)
        if ok:
            # Remote-chip throughput wobbles run to run (tunnel/host
            # contention); take the best of several repeats
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                I_pal, _, _ = run_pal(P, D, M)
                jax.block_until_ready(I_pal)
                times.append(time.perf_counter() - t0)
            t_pal = min(times)
            if n / t_pal > rays_per_s:
                rays_per_s = n / t_pal
                label = "pallas fused geodesic+RT"
    except Exception as exc:  # scan-path number stands, but say why
        import sys
        import traceback
        print(f"WARNING: Pallas kernel path failed ({exc!r}); "
              "reporting the XLA-scan number instead.", file=sys.stderr)
        traceback.print_exc(file=sys.stderr)

    print(json.dumps({
        "metric": f"rays/s/chip formula {RESOLUTION}^2 {label}",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / REFERENCE_RAYS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()

"""Polarized-path A/B benchmark (BASELINE.md protocol).

Renders the golden_polarized_rk4 physics (mock Athena++ grid, rk4
geodesics, 512-step rays, thermal synchrotron, full IQUV) as ONE jit call
per batch size and reports rays/s. Run on the TPU chip:

    python scripts/bench_polarized.py [--steps 512] [--sizes 64,128]

The per-call time at B=4096 vs B=16384 diagnoses whether the scan body is
batch-bound (healthy) or op-overhead-bound (the round-1 pathology:
~25 ms/step fixed cost from (B,F,4,4) tile waste).
"""

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--sizes", default="64,128")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--precision", default="float32")
    ap.add_argument("--no-kernel", action="store_true",
                    help="force the exact XLA streaming path (the fused "
                         "polarized Pallas kernel routes automatically on "
                         "TPU when eligible)")
    ap.add_argument("--ab", action="store_true",
                    help="render each size through BOTH paths and print "
                         "kernel-vs-XLA parity statistics")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.precision == "float64":
        jax.config.update("jax_enable_x64", True)

    from blacklight_tpu import read_config
    from blacklight_tpu.pipeline_simulation import make_simulation_renderer

    fixtures = pathlib.Path(__file__).resolve().parents[1] / "tests/fixtures"
    cfg = read_config(str(fixtures / "golden_polarized_rk4_32.input"))
    cfg.simulation_file = str(fixtures / "mock_small.athdf")
    cfg.precision = args.precision
    cfg.ray_max_steps = args.steps

    if args.ab:
        import numpy as np
        for res in [int(s) for s in args.sizes.split(",")]:
            cfg.camera_resolution = res
            fn_k, geom, rays, frequencies, _ = make_simulation_renderer(cfg)
            fn_x, _, _, _, _ = make_simulation_renderer(cfg, kernel=False)
            img_k = fn_k(rays.positions, rays.directions,
                         rays.momentum_factors)
            img_x = fn_x(rays.positions, rays.directions,
                         rays.momentum_factors)
            fb = np.asarray(img_k.get("_kernel_fallback",
                                      np.zeros(res * res, bool)))
            geo_same = ((np.asarray(img_k["_flags"])
                         == np.asarray(img_x["_flags"]))
                        & (np.asarray(img_k["_n_samples"])
                           == np.asarray(img_x["_n_samples"])))
            stats = {"res": res, "fallback_frac": round(float(fb.mean()), 4),
                     "geo_agree": round(float(geo_same.mean()), 5)}
            i_scale = float(np.nanmax(np.abs(img_x["I_nu"])))
            ok = geo_same
            for k in ("I_nu", "Q_nu", "U_nu", "V_nu"):
                a = np.asarray(img_k[k])[ok]
                b = np.asarray(img_x[k])[ok]
                nan_same = bool((np.isnan(a) == np.isnan(b)).all())
                floor = max(float(np.nanmax(np.abs(b))) * 1e-4,
                            i_scale * 1e-8)
                rel = np.abs(a - b) / (np.abs(b) + floor)
                stats[k] = {"nan_same": nan_same,
                            "max_rel": float(np.nanmax(rel)),
                            "mean_rel": float(np.nanmean(rel))}
            print(json.dumps(stats))
        return

    for res in [int(s) for s in args.sizes.split(",")]:
        cfg.camera_resolution = res
        render_fn, geom, rays, frequencies, mass = make_simulation_renderer(
            cfg, kernel=not args.no_kernel)
        n = res * res
        t0 = time.perf_counter()
        img = render_fn(rays.positions, rays.directions,
                        rays.momentum_factors)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            img = render_fn(rays.positions, rays.directions,
                            rays.momentum_factors)
            times.append(time.perf_counter() - t0)
        t = min(times)
        import numpy as np
        assert np.isfinite(np.nanmax(np.asarray(img["I_nu"]))), "bad image"
        print(json.dumps({
            "B": n, "steps": args.steps, "precision": args.precision,
            "time_s": round(t, 3), "compile_s": round(compile_s, 1),
            "rays_per_s": round(n / t, 1),
            "ms_per_step": round(t / args.steps * 1e3, 3),
        }))


if __name__ == "__main__":
    main()

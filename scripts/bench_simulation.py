"""Simulation-path (thermal synchrotron) throughput benchmark.

BASELINE.md protocol: mock GRMHD grid (default 128x64x64), rk4 geodesics,
2000-step rays, unpolarized thermal RT, 1024^2 camera dispatched in
128x128 tiles. Run on the TPU chip:

    python scripts/bench_simulation.py [--res 1024] [--grid 128,64,64]
"""

import argparse
import json
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--tile", type=int, default=None,
                    help="dispatch tile (default: 32 on the kernel path - "
                         "blocks are then full 32x32 tiles - else 128)")
    ap.add_argument("--kernel", action="store_true",
                    help="use the fused Pallas simulation kernel")
    ap.add_argument("--phased", action="store_true",
                    help="kernel path with phased dispatch (A/B; measured "
                         "SLOWER than monolithic on the remote-tunnel v5e "
                         "- 21.4k vs 43.5k rays/s - see "
                         "pipeline_simulation.KERNEL_PHASED)")
    ap.add_argument("--no-phased", action="store_true",
                    help="(default) monolithic kernel launches")
    ap.add_argument("--phase-steps", type=int, default=None,
                    help="steps per phase (default 512)")
    ap.add_argument("--chunk", type=int, default=None,
                    help="rays per dispatch call (default 16384; phased "
                         "kernel defaults to the full image so survivor "
                         "compaction spans all tiles)")
    ap.add_argument("--phase-chunk", type=int, default=None,
                    help="rays per phase launch (default 65536)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--integrator", choices=["dp", "rk4", "rk2"],
                    default=None, help="override the config's integrator")
    ap.add_argument("--grid", default="128,64,64")
    ap.add_argument("--freqs", type=int, default=1,
                    help="number of image frequencies (true-color = 10)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--precision", default="float32")
    ap.add_argument("--wavefront", action="store_true",
                    help="use the windowed wavefront sampler (measured "
                         "SLOWER than per-step on v5e; A/B only)")
    ap.add_argument("--no-wavefront", action="store_true",
                    help="(default) force the per-step-scan sampler")
    ap.add_argument("--no-batch", action="store_true",
                    help="wavefront without window-batched coefficients "
                         "(A/B baseline)")
    ap.add_argument("--wf-mode", choices=["brick", "dedup"], default=None,
                    help="window-table construction (A/B)")
    ap.add_argument("--wf-window", type=int, default=None)
    ap.add_argument("--wf-brick", default=None,
                    help="BK,BJ,BI brick extents (brick mode)")
    args = ap.parse_args()

    n_r, n_th, n_ph = (int(s) for s in args.grid.split(","))
    mock = f"/tmp/bench_mock_{n_r}x{n_th}x{n_ph}.athdf"
    root = pathlib.Path(__file__).resolve().parents[1]
    if not pathlib.Path(mock).exists():
        subprocess.run(
            [sys.executable, str(root / "scripts/generate_mock_simulation.py"),
             mock, "--n_r", str(n_r), "--n_th", str(n_th),
             "--n_ph", str(n_ph), "--r_min", "1.916", "--r_max", "52.2",
             "--pert_amp", "0.1"], check=True)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.precision == "float64":
        jax.config.update("jax_enable_x64", True)
    import numpy as np

    from blacklight_tpu import read_config
    from blacklight_tpu import pipeline_simulation
    from blacklight_tpu.pipeline_simulation import make_simulation_renderer

    if args.wf_mode:
        pipeline_simulation.WAVEFRONT_MODE = args.wf_mode
    if args.wf_window:
        pipeline_simulation.WAVEFRONT_WINDOW = args.wf_window
    if args.wf_brick:
        pipeline_simulation.WAVEFRONT_BRICK = tuple(
            int(s) for s in args.wf_brick.split(","))

    fixtures = root / "tests/fixtures"
    cfg = read_config(str(fixtures / "golden_sim_rk4_32.input"))
    cfg.simulation_file = mock
    cfg.precision = args.precision
    cfg.ray_max_steps = args.steps
    if args.integrator:
        from blacklight_tpu.constants import RayIntegrator
        cfg.ray_integrator = getattr(RayIntegrator, args.integrator)
    cfg.camera_resolution = args.res
    if args.freqs > 1:
        # true-color style log-spaced band (example_true_color.input)
        cfg.image_num_frequencies = args.freqs
        cfg.image_frequency_start = 1.0e11
        cfg.image_frequency_end = 1.0e12
        from blacklight_tpu.constants import FrequencySpacing
        cfg.image_frequency_spacing = FrequencySpacing.log

    use_wf = args.wavefront and not args.no_wavefront and not args.kernel
    if args.phased and not args.no_phased:
        pipeline_simulation.KERNEL_PHASED = True
    if args.phase_steps:
        pipeline_simulation.KERNEL_PHASE_STEPS = args.phase_steps
    if args.phase_chunk:
        pipeline_simulation.KERNEL_PHASE_CHUNK = args.phase_chunk
    render_fn, geom, rays, frequencies, mass = make_simulation_renderer(
        cfg, wavefront=use_wf, wavefront_batch=not args.no_batch,
        kernel="force" if args.kernel else False)
    res = args.res
    tile = args.tile if args.tile else (32 if args.kernel else 128)
    n = res * res
    idx = np.arange(n).reshape(res, res)
    order = idx.reshape(res // tile, tile, res // tile,
                        tile).transpose(0, 2, 1, 3).reshape(-1)
    if args.kernel and tile == 32:
        # 8x16 pixel patches per 128-ray sublane group (squarer patches
        # than raster rows -> tighter angular bricks, fewer latched rays)
        patch = (np.arange(tile * tile).reshape(4, 8, 2, 16)
                 .transpose(0, 2, 1, 3).reshape(-1))
        order = order.reshape(-1, tile * tile)[:, patch].reshape(-1)
    P = np.asarray(rays.positions)[order]
    D = np.asarray(rays.directions)[order]
    M = np.asarray(rays.momentum_factors)[order]
    # Tile ordering sets per-1024-ray-block coherence; dispatch chunks can
    # be larger (the kernel grids over 1024-ray blocks internally). The
    # phased kernel dispatches the full image in one call so survivor
    # compaction spans all tiles.
    phased_on = (args.kernel and pipeline_simulation.KERNEL_PHASED
                 and (args.integrator or "rk4") in ("rk4", "rk2"))
    chunk = args.chunk or (n if phased_on else 16384)
    chunk = max(tile * tile, chunk)

    def render_all():
        outs = []
        for i in range(0, n, chunk):
            outs.append(render_fn(P[i:i + chunk], D[i:i + chunk],
                                  M[i:i + chunk]))
        return outs

    t0 = time.perf_counter()
    outs = render_all()
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = render_all()
        times.append(time.perf_counter() - t0)
    t = min(times)
    i_img = np.concatenate([np.asarray(o["I_nu"])[:, 0] for o in outs])
    assert np.isfinite(np.nanmax(i_img)), "bad image"
    fallback = sum(int(np.asarray(o["_kernel_fallback"]).sum())
                   for o in outs if "_kernel_fallback" in o)
    print(json.dumps({
        "res": res, "steps": args.steps, "grid": args.grid,
        "integrator": args.integrator or "rk4",
        "freqs": args.freqs, "tile": tile,
        "kernel": args.kernel,
        "phased": args.kernel and pipeline_simulation.KERNEL_PHASED,
        "phase_steps": pipeline_simulation.KERNEL_PHASE_STEPS,
        "chunk": chunk,
        "kernel_fallback_rays": fallback,
        "wavefront": use_wf,
        "wavefront_batch": use_wf and not args.no_batch,
        "wf_mode": pipeline_simulation.WAVEFRONT_MODE if use_wf else None,
        "wf_window": pipeline_simulation.WAVEFRONT_WINDOW,
        "wf_brick": list(pipeline_simulation.WAVEFRONT_BRICK),
        "precision": args.precision, "time_s": round(t, 2),
        "compile_s": round(compile_s, 1),
        "rays_per_s": round(n / t, 1),
    }))


if __name__ == "__main__":
    main()

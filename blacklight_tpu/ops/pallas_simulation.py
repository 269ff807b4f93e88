"""Pallas TPU kernel: fused geodesics + GRMHD sampling + thermal synchrotron
radiative transfer (the simulation model's hot path).

The XLA simulation path is gather-rate-bound: every (ray, step) pays an HBM
gather for its trilinear corners (~5-10 cycles/index on v5e regardless of
row height) plus per-step op dispatch (docs/performance.md). This kernel
keeps a block of rays AND the grid neighborhood they are crossing entirely
in VMEM:

  per (ROWS, 128)-ray block, per W-step window:
    1. each SUBLANE GROUP of 128 rays votes an ANGULAR (BK, BJ) brick of
       (phi, theta) cells around its anchors (phi wraps via a host-padded
       table and a half-turn-shifted frame test, so azimuth-straddling
       bundles stay on the fast path); the radial axis is never bricked -
       it rides whole, as gather-table lanes, so radial motion (the
       dominant fan axis) can never overflow;
    2. ONE async DMA per group of the (nvar, BK, BJ, n_i) angular-line
       slab from HBM to VMEM (the 128-aligned radial axis is the minor
       dim, satisfying Mosaic's slice-tiling rule);
    3. W fused steps: RK step -> compare-count locate against the full
       face/center columns (dynamic-sublane scalar reads; ~0.2 us per
       axis) -> per-(variable, angular line) radial lane-gathers
       (tpu.dynamic_gather along lanes; the 4 angular corners reuse the
       same gathers through shifted (rel_k, rel_j) masks) -> trilinear
       blend -> thermal synchrotron coefficients -> invariant-transfer
       update. No HBM traffic at all. The whole window skeleton measures
       ~0.2 us per step per 1024 rays on v5e.

Any live, on-grid sample whose angular anchor leaves its group's brick
(incoherent bundle, drift past the margins) latches that RAY's overflow
flag and the HOST re-renders exactly those rays on the exact XLA path -
the kernel never silently approximates.

Semantics match the XLA path (grid/sampling.py sample_grid clamped-to-block
trilinear + models/synchrotron.py thermal float32 branch + transfer/
unpolarized.py recurrence) up to two documented reassociations: arccos /
arctan2 come from in-kernel float32 polynomials (Mosaic has no such
primitives; <= 2 ulp, so cell fractions can differ at the 1e-7 level) and
sin/cos of the SKS azimuth use the closed algebraic forms. Parity is gated
by tests/test_pallas_simulation.py (interpret mode) and the A/B check in
scripts/bench_simulation.py.

Scope: single-block SKS-coordinate grids, simulation_interp=true with
clamped-to-block interpolation, ti_te_beta thermal plasma, unpolarized
image_light (any number of frequencies), dp/rk4/rk2 integrators. Everything
else uses the XLA path (pipeline_simulation.py routes).

Reference anchors: geodesics src/geodesic_integrator/geodesics.cpp:418-795;
sampling src/radiation_integrator/simulation_sampling.cpp:352-516, 821-859;
coefficients src/radiation_integrator/simulation_coefficients.cpp:287-556;
transfer src/radiation_integrator/unpolarized.cpp:31-110.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blacklight_tpu.constants import Math, Physics
from blacklight_tpu.ops import geodesic as geo
from blacklight_tpu.ops.geometry import geodesic_rhs_c, renormalize_factor_c
from blacklight_tpu.ops.pallas_formula import _expm1, _radius_c

ROWS = 32            # rays per block = ROWS * 128; per-step control and
                     # op-issue latency amortize over sublanes (per-ray
                     # step cost nearly halves going 8 -> 32 rows), but a
                     # block runs until its SLOWEST ray terminates, and at
                     # 64 rows the ragged-exit penalty of grouping 8 image
                     # tiles outweighs the amortization (35.9k vs 43.5k
                     # rays/s end to end)
LANES = 128
DELTA_TAU_MAX = 100.0
THETA_E_ZERO = 0.01  # reference radiation_integrator.hpp:190

# Window/brick tuning (see module docstring). The brick is ANGULAR only -
# (BK, BJ) cells in (phi, theta) per 128-ray sublane group, with the FULL
# radial axis riding along as gather-table lanes - so radial motion (the
# dominant fan axis: spans up to ~50 cells where angular spans stay < 10)
# can never overflow. MARGIN backs each group's origin off below its
# minimum anchor so angular drift during the window stays inside; overflow
# latches per ray and falls back to the XLA path.
WINDOW = 8
# Compute cost scales with the ACTIVE rel-box (the block's anchor span),
# not the brick extents - the per-line pl.when skips margin lines - but
# the per-window DMA volume DOES scale with the brick, and measured
# end-to-end (12,12) beats both (6,6) (too much overflow fallback) and
# (16,12) (fallback drops 10.4% -> 8.1% but the extra slab bandwidth
# costs more than the fallback saved: 43.5k vs 37.3k rays/s).
BRICK = (12, 12)  # (BK, BJ) angular cells per sublane group
MARGIN = (4, 4)


@dataclasses.dataclass(frozen=True)
class KernelGrid:
    """Host-prepared single-block grid tables for the fused kernel.

    table: (nvar, n_k + BK, n_j, n_i_pad) float32 primitives, phi-padded
      by BK planes (table[:, n_k + t] = table[:, t]) so azimuth-wrapping
      angular bricks are one contiguous DMA, and radially padded to a
      128-lane multiple (Mosaic slices must be 128-aligned on the minor
      dim; the pad cells are never gathered since anchors clamp to
      n_i - 2).
    x?f / x?v: (n_pad, 1) float32 face/center columns (sublane-major for
      the in-kernel scalar compare-count reads).
    """

    table: jnp.ndarray
    x1f: jnp.ndarray
    x1v: jnp.ndarray
    x2f: jnp.ndarray
    x2v: jnp.ndarray
    x3f: jnp.ndarray
    x3v: jnp.ndarray
    n_i: int
    n_j: int
    n_k: int
    n_i_pad: int
    nvar: int
    ind: dict
    bounds: tuple  # (r_lo, r_hi, th_lo, th_hi, ph_lo, ph_hi) floats


def _pad_col(a, extra=0, sentinel=1e30):
    a = np.asarray(a, np.float32)
    n = a.shape[0] + extra
    n_pad = -(-n // 8) * 8
    out = np.full((n_pad, 1), sentinel, np.float32)
    out[:a.shape[0], 0] = a
    return out


def prepare_kernel_grid(grid, brick=BRICK) -> Optional[KernelGrid]:
    """Build the kernel's table/coordinate views from a SimulationGrid.

    Returns None when the grid is ineligible (multi-block, FMKS map,
    slow-light time axis, or non-SKS coordinates).
    """
    if (grid.times is not None or grid.sks_map is not None
            or grid.coords != "sks"):
        return None
    nvar, n_b, n_k, n_j, n_i = grid.prim.shape
    if n_b != 1:
        return None
    bk = brick[0]
    if n_k < bk or n_j < brick[1]:
        return None
    # Build the table ON DEVICE from the already-resident prim: a host
    # round-trip of the snapshot costs minutes over the remote-TPU tunnel.
    prim = grid.prim[:, 0].astype(jnp.float32)            # (nvar, k, j, i)
    tab = jnp.concatenate([prim, prim[:, :bk]], axis=1)   # phi pad
    n_i_pad = -(-n_i // 128) * 128
    if n_i_pad != n_i:
        tab = jnp.concatenate(
            [tab, jnp.zeros(tab.shape[:-1] + (n_i_pad - n_i,),
                            jnp.float32)],
            axis=-1)
    x1f = np.asarray(grid.x1f[0], np.float64)
    x2f = np.asarray(grid.x2f[0], np.float64)
    x3f = np.asarray(grid.x3f[0], np.float64)
    x1v = np.asarray(grid.x1v[0], np.float64)
    x2v = np.asarray(grid.x2v[0], np.float64)
    x3v = np.asarray(grid.x3v[0], np.float64)
    bounds = (float(x1f[0]), float(x1f[-1]), float(x2f[0]), float(x2f[-1]),
              float(x3f[0]), float(x3f[-1]))
    return KernelGrid(
        table=tab,
        x1f=jnp.asarray(_pad_col(x1f, 8)), x1v=jnp.asarray(_pad_col(x1v, 8)),
        x2f=jnp.asarray(_pad_col(x2f, 8)), x2v=jnp.asarray(_pad_col(x2v, 8)),
        x3f=jnp.asarray(_pad_col(x3f, 8)),
        x3v=jnp.asarray(_pad_col(x3v, 8)),
        n_i=n_i, n_j=n_j, n_k=n_k, n_i_pad=n_i_pad, nvar=nvar,
        ind=dict(grid.ind), bounds=bounds)


jax.tree_util.register_pytree_node(
    KernelGrid,
    lambda g: ((g.table, g.x1f, g.x1v, g.x2f, g.x2v, g.x3f, g.x3v),
               (g.n_i, g.n_j, g.n_k, g.n_i_pad, g.nvar,
                tuple(sorted(g.ind.items())), g.bounds)),
    lambda aux, ch: KernelGrid(*ch, n_i=aux[0], n_j=aux[1], n_k=aux[2],
                               n_i_pad=aux[3], nvar=aux[4],
                               ind=dict(aux[5]), bounds=aux[6]))


# ---------------------------------------------------------------------------
# float32 transcendentals Mosaic lacks (atan2 / acos via polynomial atan)

_TAN_PI_8 = 0.4142135623730951
_TAN_3PI_8 = 2.414213562373095


def _atan_c(x):
    """Cephes-style float32 arctangent (~1 ulp over the reals)."""
    sign = jnp.where(x < 0.0, -1.0, 1.0)
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = (~big) & (ax > _TAN_PI_8)
    # range-reduce to |u| <= tan(pi/8)
    safe = jnp.maximum(ax, 1e-30)
    u = jnp.where(big, -1.0 / safe, jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    off = jnp.where(big, 0.5 * math.pi, jnp.where(mid, 0.25 * math.pi, 0.0))
    z = u * u
    y = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
          + 1.99777106478e-1) * z - 3.33329491539e-1) * z * u + u
    return sign * (y + off)


def _atan2_c(y, x):
    """Quadrant-correct float32 atan2 (atan2(0, 0) = 0)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    denom = jnp.maximum(jnp.maximum(ax, ay), 1e-38)
    num = jnp.minimum(ax, ay)
    t = _atan_c(num / denom)
    t = jnp.where(ay > ax, 0.5 * math.pi - t, t)
    t = jnp.where(x < 0.0, math.pi - t, t)
    return jnp.where(y < 0.0, -t, t)


def _acos_c(c):
    c = jnp.clip(c, -1.0, 1.0)
    s = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
    return _atan2_c(s, c)


def _cks_to_sks_c(x, y, z, spin, r=None):
    """CKS -> SKS componentwise (ops/sks.cks_to_sks with in-kernel trig).

    Pass a precomputed Kerr-Schild radius `r` (bitwise `_radius_c` of the
    same point) to skip the hypot + sqrt."""
    if r is None:
        a2 = spin * spin
        rr2 = x * x + y * y + z * z
        r2 = 0.5 * (rr2 - a2 + jnp.hypot(rr2 - a2, 2.0 * spin * z))
        r = jnp.sqrt(r2)
    th = _acos_c(jnp.clip(z / r, -1.0, 1.0))
    ph = _atan2_c(y, x) - _atan_c(spin / r)
    two_pi = 2.0 * math.pi
    ph = jnp.where(ph < 0.0, ph + two_pi, ph)
    ph = jnp.where(ph >= two_pi, ph - two_pi, ph)
    return r, th, ph


# ---------------------------------------------------------------------------
# Shared in-kernel sampling machinery (used by this kernel and the polarized
# kernel, ops/pallas_polarized.py)


def _locate_axis(x, face_ref, center_ref, n_ax, shape):
    """grid/sampling._locate against the full face/center columns via
    dynamic-sublane scalar reads (measured ~0.2 us per axis per
    1024-ray step on v5e even at 129 faces).

    Returns (i, i_m, f) exactly like the XLA _locate.
    """
    idx = jnp.zeros(shape, jnp.int32)
    for t in range(n_ax + 1):
        idx += (face_ref[t, 0] < x).astype(jnp.int32)
    i = jnp.clip(idx - 1, 0, n_ax - 1)
    xv_im1 = jnp.zeros(shape, jnp.float32)
    xv_i = jnp.zeros(shape, jnp.float32)
    xv_ip1 = jnp.zeros(shape, jnp.float32)
    for t in range(n_ax):
        v = center_ref[t, 0]
        xv_im1 = jnp.where(i == t + 1, v, xv_im1)
        xv_i = jnp.where(i == t, v, xv_i)
        xv_ip1 = jnp.where(i == t - 1, v, xv_ip1)
    use_i = (i == 0) | ((i != n_ax - 1) & (x >= xv_i))
    i_m = jnp.where(use_i, i, i - 1)
    lo = jnp.where(use_i, xv_i, xv_im1)
    hi = jnp.where(use_i, xv_ip1, xv_i)
    f = (x - lo) / (hi - lo)
    return i, i_m, f


def _chunk_gather(tab_line, idx, n_chunks):
    """Radial lane gather on a (rows, n_chunks*128) line: Mosaic's dynamic
    gather needs idx.shape == table.shape, so multi-chunk tables gather per
    128-lane chunk with a select-mask accumulate."""
    if n_chunks == 1:
        return jnp.take_along_axis(tab_line, idx, axis=1)
    acc = None
    for c in range(n_chunks):
        part = tab_line[:, 128 * c:128 * (c + 1)]
        idx_c = jnp.clip(idx - 128 * c, 0, 127)
        got = jnp.take_along_axis(part, idx_c, axis=1)
        sel = ((idx >> 7) == c).astype(jnp.float32)
        acc = got * sel if acc is None else acc + got * sel
    return acc


def _gather_corners(scratch, acc_scr, names, var_of, nvar, bk, bj, n_chunks,
                    rows, use, oob, rel_k, rel_j, i_lo, i_hi, cw0, cw1,
                    shape):
    """Per-line predicated corner gathers -> named primitive dict.

    Folds the trilinear corner weights into one (W_lo, W_hi) pair per
    angular line t - each ray has nonzero weight on at most 4 lines - and
    accumulates W_lo * gather(line, i_m) + W_hi * gather(line, i_m + 1)
    into VMEM accumulators. The brick is mostly margin: the block's live
    anchors span a small rel-box, so lines outside it are skipped entirely
    by a scalar pl.when (unpredicated, the gather stage is more than half
    of the kernel's step time). Includes the rho/pgas positivity repair
    (anchor-corner substitution, grid/sampling.py sample_grid).
    """
    big_i = jnp.asarray(10 ** 6, jnp.int32)
    boxed = use & ~oob
    kb_lo = jnp.min(jnp.where(boxed, rel_k, big_i))
    kb_hi = jnp.max(jnp.where(boxed, rel_k, -big_i))
    jb_lo = jnp.min(jnp.where(boxed, rel_j, big_i))
    jb_hi = jnp.max(jnp.where(boxed, rel_j, -big_i))
    acc_scr[...] = jnp.zeros((nvar + 2, rows, LANES), jnp.float32)
    rho_v = var_of["rho"]
    pgas_v = var_of["pgas"]
    for tk in range(bk):
        for tj in range(bj):
            shifts = [(dk, dj)
                      for dk in (0, 1) for dj in (0, 1)
                      if 0 <= tk - dk <= bk - 2
                      and 0 <= tj - dj <= bj - 2]
            if not shifts:
                continue

            @pl.when((tk >= kb_lo) & (tk <= kb_hi + 1)
                     & (tj >= jb_lo) & (tj <= jb_hi + 1))
            def _(tk=tk, tj=tj, shifts=shifts):
                w_lo = None
                w_hi = None
                m_anchor = None
                for dk, dj in shifts:
                    m = ((rel_k == tk - dk)
                         & (rel_j == tj - dj)) \
                        .astype(jnp.float32)
                    if dk == 0 and dj == 0:
                        m_anchor = m
                    t_lo = cw0[(dk, dj)] * m
                    t_hi = cw1[(dk, dj)] * m
                    w_lo = t_lo if w_lo is None else w_lo + t_lo
                    w_hi = t_hi if w_hi is None else w_hi + t_hi
                for vi, nm in enumerate(names):
                    line = scratch[:, var_of[nm], tk, tj, :]
                    glo = _chunk_gather(line, i_lo, n_chunks)
                    ghi = _chunk_gather(line, i_hi, n_chunks)
                    acc_scr[vi] += w_lo * glo + w_hi * ghi
                    if m_anchor is not None:
                        if var_of[nm] == rho_v:
                            acc_scr[nvar] += m_anchor * glo
                        elif var_of[nm] == pgas_v:
                            acc_scr[nvar + 1] += m_anchor * glo
    named = {}
    for vi, nm in enumerate(names):
        acc = acc_scr[vi]
        if nm == "rho":
            acc = jnp.where(acc <= 0.0, acc_scr[nvar], acc)
        elif nm == "pgas":
            acc = jnp.where(acc <= 0.0, acc_scr[nvar + 1], acc)
        named[nm] = acc
    return named


def _window_setup_impl(x1, x2, x3, r, candid, spin, x2f_r, x2v_r, x3f_r,
                       x3v_r, n_j, n_k, bk, bj, mk, mj, rows, shape,
                       off_grid_of, tab_hbm, brick_scr, sem, interpret):
    """Angular anchor vote per sublane group + one angular-line slab DMA
    per group (full radial axis as lanes). Returns (k0v, j0v) per-group
    origin broadcasts.

    Live, not-yet-overflowed, ON-GRID rays vote on the origin: off-grid
    rays' clamped anchors sit at the boundary (a ray skimming the polar
    cutout clamps to j = 0) and would drag the brick away from the
    sampling majority. Only when NO ray in a group is on-grid (the
    approach phase of a camera outside the snapshot) do the clamped
    anchors vote, parking the brick at the entry face. Off-grid samples
    never flag overflow.
    """
    r_v, th, ph = _cks_to_sks_c(x1, x2, x3, spin, r)
    on = candid & ~off_grid_of(r_v, th, ph)
    _, im_j, _ = _locate_axis(th, x2f_r, x2v_r, n_j, shape)
    _, km, _ = _locate_axis(ph, x3f_r, x3v_r, n_k, shape)
    im_j = jnp.clip(im_j, 0, n_j - 2)
    km = jnp.clip(km, 0, n_k - 2)

    big = jnp.asarray(10 ** 6, jnp.int32)
    shift = n_k // 2
    km_s = km - jnp.where(km >= shift, shift, shift - n_k)
    j0s = []
    k0s = []
    for g in range(rows):
        on_g = on[g]
        # where() on i1 vectors does not lower in Mosaic; since
        # on_g is a subset of candid[g], the select is a logical
        # blend.
        use_g = on_g | (candid[g] & jnp.logical_not(jnp.any(on_g)))
        any_g = jnp.any(use_g)
        j_min = jnp.min(jnp.where(use_g, im_j[g], big))
        j0 = jnp.clip(j_min - mj, 0, max(n_j - bj, 0))
        # phi frame: direct span vs half-turn-shifted span
        k_min = jnp.min(jnp.where(use_g, km[g], big))
        k_max = jnp.max(jnp.where(use_g, km[g], -big))
        ks_min = jnp.min(jnp.where(use_g, km_s[g], big))
        ks_max = jnp.max(jnp.where(use_g, km_s[g], -big))
        use_shift = (k_max - k_min) > (ks_max - ks_min)
        k0_raw = jnp.where(use_shift, ks_min + shift, k_min) - mk
        k0 = jnp.where(k0_raw < 0, k0_raw + n_k, k0_raw)
        k0 = jnp.clip(k0, 0, n_k - 1)
        j0s.append(jnp.where(any_g, j0, 0))
        k0s.append(jnp.where(any_g, k0, 0))

    if interpret:
        for g in range(rows):
            brick_scr[g, ...] = tab_hbm[:, pl.ds(k0s[g], bk),
                                        pl.ds(j0s[g], bj), :]
    else:
        copies = [
            pltpu.make_async_copy(
                tab_hbm.at[:, pl.ds(k0s[g], bk),
                           pl.ds(j0s[g], bj), :],
                brick_scr.at[g], sem.at[g])
            for g in range(rows)]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
    k0v = jnp.concatenate(
        [jnp.full((1, LANES), k0s[g], jnp.int32)
         for g in range(rows)])
    j0v = jnp.concatenate(
        [jnp.full((1, LANES), j0s[g], jnp.int32)
         for g in range(rows)])
    return (k0v, j0v)


def spatial_order(positions, block=1024):
    """Group rays into coherent ~sqrt(block) x sqrt(block) camera-plane
    tiles (kernel blocks) by their camera-plane coordinates, with a finer
    sub-key so each 128-ray sublane group is a compact patch.

    The kernel's brick-overflow rate depends directly on this coherence;
    the caller's ray order (raster, adaptive blocks, ...) is otherwise
    arbitrary. (A leading image-radius key - grouping tiles of similar ray
    lifetime to cut the ragged-exit tax - measured SLOWER on v5e:
    same-radius tiles from different quadrants widen the block's active
    anchor box and the predicated gather stage pays for it.)

    Returns a permutation of range(len(positions)).
    """
    q = np.asarray(positions)[:, 1:4]
    q = q - q.mean(axis=0)
    _, vecs = np.linalg.eigh(q.T @ q)
    u = q @ vecs[:, -1]
    v = q @ vecs[:, -2]
    b = len(u)
    g = max(1, int(np.ceil(np.sqrt(b / float(block)))))

    def quant(x, levels):
        span = np.ptp(x)
        if span <= 0.0:
            return np.zeros(len(x), np.int64)
        return np.clip(((x - x.min()) / span * levels)
                       .astype(np.int64), 0, levels - 1)

    ub, vb = quant(u, g), quant(v, g)
    uf, vf = quant(u, 8 * g), quant(v, 4 * g)
    return np.lexsort((vf, uf, vb, ub))


def angular_order(positions, block=1024):
    """Group MID-FLIGHT rays into (phi, theta)-compact runs.

    Used by phased dispatch to re-tile survivor pools between phases: the
    kernel's brick is voted per 128-ray sublane group in (phi, theta)
    cells with the radial axis riding whole, so survivor coherence is
    angular coherence - a camera-plane proxy (spatial_order) decorrelates
    once rays have evolved. phi's +/-pi seam can split a bin pair, but
    seam-straddling groups stay on the fast path via the kernel's
    half-turn-shifted frame test.

    Returns a permutation of range(len(positions)).
    """
    q = np.asarray(positions)
    x, y, z = q[:, 1], q[:, 2], q[:, 3]
    r = np.sqrt(x * x + y * y + z * z) + 1.0e-30
    phi = np.arctan2(y, x)
    cth = z / r
    b = len(phi)
    g = max(1, int(np.ceil(np.sqrt(b / float(block)))))

    def quant(v, levels):
        span = np.ptp(v)
        if span <= 0.0:
            return np.zeros(len(v), np.int64)
        return np.clip(((v - v.min()) / span * levels)
                       .astype(np.int64), 0, levels - 1)

    pb, tb = quant(phi, g), quant(cth, g)
    pf, tf = quant(phi, 8 * g), quant(cth, 8 * g)
    return np.lexsort((tf, pf, tb, pb))


# ---------------------------------------------------------------------------
# Static parameter bundles


@dataclasses.dataclass(frozen=True)
class SimKernelParams:
    """Everything static the kernel closure needs besides GeodesicParams."""

    # plasma (ti_te_beta)
    mu: float
    ne_ni: float
    use_p: bool
    gamma: float
    gamma_i: float
    gamma_e: float
    rat_low: float
    rat_high: float
    thermal_frac: float
    rho_unit: float
    # value cuts (negative = disabled), reference input_reader.hpp:181-194
    cut_rho: tuple = (-1.0, -1.0)
    cut_n_e: tuple = (-1.0, -1.0)
    cut_p_gas: tuple = (-1.0, -1.0)
    cut_theta_e: tuple = (-1.0, -1.0)
    cut_b: tuple = (-1.0, -1.0)
    cut_sigma: tuple = (-1.0, -1.0)
    cut_beta_inverse: tuple = (-1.0, -1.0)
    # geometric cuts (models/cuts.GeometricCuts)
    camera_r: float = 0.0
    omit_near: bool = False
    omit_far: bool = False
    omit_in: float = -1.0
    omit_out: float = -1.0
    midplane_theta: float = 0.0
    midplane_z: float = 0.0
    plane: bool = False
    plane_origin: tuple = (0.0, 0.0, 0.0)
    plane_normal: tuple = (0.0, 0.0, 1.0)
    # sampler fallbacks
    fallback_nan: bool = True
    fallback_rho: float = 0.0
    fallback_pgas: float = 0.0


def sim_kernel_params(cfg, cuts_geo, plasma, cuts_val) -> SimKernelParams:
    return SimKernelParams(
        mu=plasma.mu, ne_ni=plasma.ne_ni, use_p=plasma.use_p,
        gamma=plasma.gamma, gamma_i=plasma.gamma_i, gamma_e=plasma.gamma_e,
        rat_low=plasma.rat_low, rat_high=plasma.rat_high,
        thermal_frac=plasma.thermal_frac,
        rho_unit=cfg.require("simulation_rho_cgs"),
        cut_rho=(cuts_val.rho_min, cuts_val.rho_max),
        cut_n_e=(cuts_val.n_e_min, cuts_val.n_e_max),
        cut_p_gas=(cuts_val.p_gas_min, cuts_val.p_gas_max),
        cut_theta_e=(cuts_val.theta_e_min, cuts_val.theta_e_max),
        cut_b=(cuts_val.b_min, cuts_val.b_max),
        cut_sigma=(cuts_val.sigma_min, cuts_val.sigma_max),
        cut_beta_inverse=(cuts_val.beta_inverse_min,
                          cuts_val.beta_inverse_max),
        camera_r=cuts_geo.camera_r, omit_near=cuts_geo.omit_near,
        omit_far=cuts_geo.omit_far, omit_in=cuts_geo.omit_in,
        omit_out=cuts_geo.omit_out,
        midplane_theta=cuts_geo.midplane_theta,
        midplane_z=cuts_geo.midplane_z, plane=cuts_geo.plane,
        plane_origin=tuple(cuts_geo.plane_origin),
        plane_normal=tuple(cuts_geo.plane_normal),
        fallback_nan=cfg.require("fallback_nan"),
        fallback_rho=cfg.fallback_rho or 0.0,
        fallback_pgas=cfg.fallback_pgas or 0.0)


# ---------------------------------------------------------------------------
# In-kernel physics (componentwise ports of the float32 XLA branches)


def _geometric_keep_c(x, y, z, r, th, sp: SimKernelParams, cam):
    """models/cuts.geometric_keep componentwise (cuts are static)."""
    keep = r <= sp.camera_r
    if sp.omit_near or sp.omit_far:
        dot = x * cam[1] + y * cam[2] + z * cam[3]
        if sp.omit_near:
            keep &= ~(dot > 0.0)
        if sp.omit_far:
            keep &= ~(dot < 0.0)
    if sp.omit_in >= 0.0:
        keep &= ~(r < sp.omit_in)
    if sp.omit_out >= 0.0:
        keep &= ~(r > sp.omit_out)
    if sp.midplane_theta != 0.0:
        off = jnp.abs(th - 0.5 * math.pi)
        if sp.midplane_theta > 0.0:
            keep &= ~(off > sp.midplane_theta)
        else:
            keep &= ~(off < -sp.midplane_theta)
    if sp.midplane_z != 0.0:
        if sp.midplane_z > 0.0:
            keep &= ~(jnp.abs(z) > sp.midplane_z)
        else:
            keep &= ~(jnp.abs(z) < -sp.midplane_z)
    if sp.plane:
        ox, oy, oz = sp.plane_origin
        nx, ny, nz = sp.plane_normal
        keep &= ~((x - ox) * nx + (y - oy) * ny + (z - oz) * nz < 0.0)
    return keep


def _fluid_state_c(x, y, z, r, spin, named, sp: SimKernelParams):
    """models/synchrotron.fluid_state float32 SKS branch, componentwise.

    Returns (n_e_cgs, bb_cgs, sigma, beta_inv, theta_e, kb_tt_e,
    rho_cgs, pgas_cgs, u0..u3 CKS, b0..b3 CKS, b_sq)."""
    rho, pgas = named["rho"], named["pgas"]
    uu1, uu2, uu3 = named["uu1"], named["uu2"], named["uu3"]
    bb1, bb2, bb3 = named["bb1"], named["bb2"], named["bb3"]
    d_unit = sp.rho_unit
    e_unit = d_unit * Physics.c ** 2
    b_unit = math.sqrt(4.0 * Math.pi * e_unit)

    rho_cgs = rho * d_unit
    pgas_cgs = pgas * e_unit
    n_cgs = rho_cgs / (sp.mu * Physics.m_p)
    n_e_cgs = n_cgs / (1.0 + 1.0 / sp.ne_ni)

    # SKS metric scalars at CKS position (ops/sks.sks_metric)
    a2 = spin * spin
    r2 = r * r
    cth = z / r
    cth2 = cth * cth
    sth2 = 1.0 - cth2
    sigma_m = r2 + a2 * cth2
    delta = r2 - 2.0 * r + a2
    w = 2.0 * r / sigma_m
    g_tt = -(1.0 - w)
    g_tr = w
    g_tph = -w * spin * sth2
    g_rr = 1.0 + w
    g_rph = -(1.0 + w) * spin * sth2
    g_thth = sigma_m
    g_phph = (r2 + a2 + w * a2 * sth2) * sth2
    gi_tt = -(1.0 + w)
    gi_tr = w
    gi_rph = spin / sigma_m

    # normal-frame velocity (ops/sks.normal_frame_velocity)
    uu0 = jnp.sqrt(1.0 + g_rr * uu1 * uu1 + 2.0 * g_rph * uu1 * uu3
                   + g_thth * uu2 * uu2 + g_phph * uu3 * uu3)
    lapse = 1.0 / jnp.sqrt(-gi_tt)
    shift1 = -gi_tr / gi_tt
    shift3 = -gi_rph / gi_tt
    ut = uu0 / lapse
    ur = uu1 - shift1 * uu0 / lapse
    uth = uu2
    uph = uu3 - shift3 * uu0 / lapse

    def lower(vt, vr, vth, vph):
        return (g_tt * vt + g_tr * vr + g_tph * vph,
                g_tr * vt + g_rr * vr + g_rph * vph,
                g_thth * vth,
                g_tph * vt + g_rph * vr + g_phph * vph)

    ucov_t, ucov_r, ucov_th, ucov_ph = lower(ut, ur, uth, uph)
    bt = ucov_r * bb1 + ucov_th * bb2 + ucov_ph * bb3
    br = (bb1 + bt * ur) / ut
    bth = (bb2 + bt * uth) / ut
    bph = (bb3 + bt * uph) / ut
    bcov_t, bcov_r, bcov_th, bcov_ph = lower(bt, br, bth, bph)
    b_sq = bcov_t * bt + bcov_r * br + bcov_th * bth + bcov_ph * bph

    bb_cgs = jnp.sqrt(jnp.maximum(b_sq, 1e-30)) * b_unit
    dfloor = 1e-15
    sigma = b_sq / jnp.maximum(rho, dfloor)
    beta_inv = b_sq / jnp.maximum(2.0 * pgas, dfloor)

    # ti_te_beta electron temperature (float32 branch)
    u_b = 1.0 / (1.0 + beta_inv ** 2)
    tti_tte = sp.rat_high * u_b + sp.rat_low * (1.0 - u_b)
    kb_tt_tot = (sp.mu * Physics.m_p * Physics.c ** 2) \
        * (pgas / jnp.maximum(rho, dfloor))
    if sp.use_p:
        kb_tt_e = (1.0 + sp.ne_ni) / (tti_tte + sp.ne_ni) * kb_tt_tot
    else:
        kb_tt_e = (1.0 + sp.ne_ni) * kb_tt_tot / (sp.gamma - 1.0)
        kb_tt_e = kb_tt_e / (tti_tte / (sp.gamma_i - 1.0)
                             + sp.ne_ni / (sp.gamma_e - 1.0))
    theta_e = kb_tt_e / (Physics.m_e * Physics.c ** 2)

    # SKS -> CKS spatial Jacobian with algebraic sin/cos(phi)
    # (ops/sks.sks_to_cks_vector; cph/sph as in pallas_formula)
    sth = jnp.sqrt(jnp.maximum(sth2, 0.0))
    rho_s = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-30)) \
        * jnp.sqrt(r2 + a2)
    cph = (x * r + y * spin) / rho_s
    sph = (y * r - x * spin) / rho_s

    def to_cks(vr, vth, vph):
        vx = sth * cph * vr + cth * (r * cph - spin * sph) * vth \
            + sth * (-r * sph - spin * cph) * vph
        vy = sth * sph * vr + cth * (r * sph + spin * cph) * vth \
            + sth * (r * cph - spin * sph) * vph
        vz = cth * vr - r * sth * vth
        return vx, vy, vz

    ux, uy, uz = to_cks(ur, uth, uph)
    bx, by, bz = to_cks(br, bth, bph)
    return dict(n_e=n_e_cgs, bb_cgs=bb_cgs, sigma=sigma, beta_inv=beta_inv,
                theta_e=theta_e, kb_tt_e=kb_tt_e, rho_cgs=rho_cgs,
                pgas_cgs=pgas_cgs, u=(ut, ux, uy, uz), b=(bt, bx, by, bz),
                b_sq=b_sq)


def _value_keep_c(st, sp: SimKernelParams):
    """models/synchrotron.value_cuts componentwise."""
    keep = None

    def apply(keep, v, lohi):
        lo, hi = lohi
        if lo >= 0.0:
            k = ~(v < lo)
            keep = k if keep is None else keep & k
        if hi >= 0.0:
            k = ~(v > hi)
            keep = k if keep is None else keep & k
        return keep

    keep = apply(keep, st["rho_cgs"], sp.cut_rho)
    keep = apply(keep, st["n_e"], sp.cut_n_e)
    keep = apply(keep, st["pgas_cgs"], sp.cut_p_gas)
    keep = apply(keep, st["theta_e"], sp.cut_theta_e)
    keep = apply(keep, st["bb_cgs"], sp.cut_b)
    keep = apply(keep, st["sigma"], sp.cut_sigma)
    keep = apply(keep, st["beta_inv"], sp.cut_beta_inverse)
    return keep


def _pitch_angle_c(st, k0, k1, k2, k3):
    """models/synchrotron.pitch_angle float32 branch (invariant form)."""
    ut, ux, uy, uz = st["u"]
    bt, bx, by, bz = st["b"]
    u_dot_k = ut * k0 + ux * k1 + uy * k2 + uz * k3
    b_dot_k = bt * k0 + bx * k1 + by * k2 + bz * k3
    b_sq = st["b_sq"]
    denom = u_dot_k * u_dot_k * jnp.maximum(b_sq, 1e-16)
    cos2 = jnp.minimum(b_dot_k * b_dot_k / denom, 1.0)
    sin2 = 1.0 - cos2
    sin_b = jnp.sqrt(jnp.maximum(sin2, 0.0))
    return sin_b, u_dot_k


def _thermal_j_alpha_c(nu_cgs, nu0, st, sin_b, sp: SimKernelParams):
    """models/synchrotron.thermal_coefficients float32 branch, unpolarized
    (j_i scaled by e^2/(c nu0^2), alpha via Kirchhoff with the overflow
    trap), componentwise at one frequency."""
    theta_e = st["theta_e"]
    nu_c = (Physics.e / (2.0 * Math.pi * Physics.m_e * Physics.c)) \
        * st["bb_cgs"]
    nu_s = (2.0 / 9.0) * nu_c * theta_e * theta_e * sin_b
    nu_s = jnp.maximum(nu_s, 1e-12)
    xx = jnp.minimum(nu_cgs / nu_s, 1e20)
    lx = jnp.log(jnp.maximum(xx, 1e-38))
    xx_1_3 = jnp.exp(lx * (1.0 / 3.0))
    xx_1_2 = jnp.sqrt(xx)
    xx_1_6 = jnp.sqrt(xx_1_3)
    coefficient = sp.thermal_frac * st["n_e"] * nu_c \
        * (nu0 / nu_cgs) ** 2 * jnp.exp(-xx_1_3)
    var_a = Math.sqrt2 * Math.pi / 27.0 * sin_b
    var_b = 2.0 ** (11.0 / 12.0)
    var_c = xx_1_2 + var_b * xx_1_6
    j_i = coefficient * var_a * var_c * var_c

    hnu_kt = jnp.minimum(
        Physics.h * nu_cgs / jnp.maximum(st["kb_tt_e"], 1e-18), 87.0)
    log_k = (2.0 * math.log(Physics.e) + math.log(Physics.c)
             - math.log(2.0 * Physics.h) - 2.0 * math.log(nu0))
    kirchhoff = _expm1(hnu_kt) * math.exp(log_k)
    alpha_i = j_i * kirchhoff
    trap = jnp.isinf(1.0 / (alpha_i * alpha_i))
    alpha_i = jnp.where(trap, 0.0, alpha_i)
    # The XLA path's sqrt(xx) is NaN for nu_cgs < 0 (unphysical superluminal
    # data), poisoning the pixel; the log-space cbrt here stays finite, so
    # report the condition explicitly for parity.
    neg = nu_cgs < 0.0
    return j_i, alpha_i, neg


# ---------------------------------------------------------------------------
# Kernel factory


def _make_kernel(params: geo.GeodesicParams, sp: SimKernelParams, kg_meta,
                 nus, mass_msun, camera_x, log_j_scale,
                 integrator="rk4", window=WINDOW, brick=BRICK,
                 margin=MARGIN, interpret=False, ablate=(), rows=ROWS,
                 unroll=True, carry_io=False, phase_windows=None):
    """Build the fused kernel closure. kg_meta = (n_i, n_j, n_k, n_i_pad,
    nvar, ind, bounds) - static ints/floats only; the table/coordinate
    arrays arrive as refs.

    carry_io: phased-dispatch mode (render_simulation_phased). The kernel
    additionally reads per-ray carried state (packed masks, r_mid_prev,
    n_samp, raw I and attenuation per frequency) plus a scalar absolute
    step base, runs phase_windows windows, and writes the carried state
    back out - so the host can compact away finished rays between phases
    instead of every block paying for its slowest ray (rk4/rk2 only)."""
    n_i, n_j, n_k, n_i_pad, nvar, ind, bounds = kg_meta
    spin, mass, flat = params.bh_a, params.bh_m, params.ray_flat
    x_unit = Physics.gg_msun * mass_msun / (Physics.c * Physics.c)
    nus = tuple(float(v) for v in nus)
    nf = len(nus)
    nu0 = nus[0]
    i_scales = [math.exp(log_j_scale + 3.0 * math.log(nu)) for nu in nus]
    max_steps = params.ray_max_steps
    cam = tuple(float(v) for v in np.asarray(camera_x))
    # Kerr-Schild radius of the camera (the parking point for invalid
    # samples), precomputed on host so the kernel can skip the per-step
    # radius recompute inside the CKS->SKS conversion.
    _d = cam[1] * cam[1] + cam[2] * cam[2] + cam[3] * cam[3] - spin * spin
    r_cam = float(np.float32(math.sqrt(
        0.5 * (_d + math.hypot(_d, 2.0 * spin * cam[3])))))
    bk, bj = brick
    mk, mj = margin
    n_chunks = n_i_pad // 128
    n_windows = -(-max_steps // window)
    if carry_io:
        if integrator == "dp":
            raise ValueError("carry_io phased mode supports rk4/rk2 only")
        n_windows = phase_windows
    r_lo, r_hi, th_lo, th_hi, ph_lo, ph_hi = bounds
    shape = (rows, LANES)
    names = ["rho", "pgas", "uu1", "uu2", "uu3", "bb1", "bb2", "bb3"]
    var_of = {nm: int(ind[nm]) for nm in names}

    def rhs(x0, x1, x2, x3, p0, p1, p2, p3):
        return geodesic_rhs_c(x1, x2, x3, p0, p1, p2, p3, spin, mass,
                              flat=flat, with_distance=False)

    def locate_axis(x, face_ref, center_ref, n_ax):
        return _locate_axis(x, face_ref, center_ref, n_ax, shape)

    def kernel(*refs):
        (x0r, x1r, x2r, x3r, p0r, p1r, p2r, p3r, momr), refs = \
            refs[:9], refs[9:]
        if carry_io:
            nbase_r = refs[0]
            masksr, rmidr, nsampr = refs[1:4]
            i_inr = refs[4:4 + nf]
            a_inr = refs[4 + nf:4 + 2 * nf]
            refs = refs[4 + 2 * nf:]
        (x1f_r, x1v_r, x2f_r, x2v_r, x3f_r, x3v_r, tab_hbm), \
            out_and_scratch = refs[:7], refs[7:]
        i_outs = out_and_scratch[:nf]
        flag_out, nsamp_out, ovf_out = out_and_scratch[nf:nf + 3]
        out_and_scratch = out_and_scratch[nf + 3:]
        if carry_io:
            pos_outs = out_and_scratch[:7]      # x0-x3, p1-p3
            masks_out, rmid_out = out_and_scratch[7:9]
            iraw_outs = out_and_scratch[9:9 + nf]
            araw_outs = out_and_scratch[9 + nf:9 + 2 * nf]
            out_and_scratch = out_and_scratch[9 + 2 * nf:]
        brick_scr, acc_scr, sem = out_and_scratch

        x0, x1, x2, x3 = x0r[:], x1r[:], x2r[:], x3r[:]
        p0, p1, p2, p3 = p0r[:], p1r[:], p2r[:], p3r[:]
        mom = momr[:]
        f32 = x0.dtype
        zero = jnp.zeros(shape, f32)
        i_false = jnp.zeros(shape, jnp.int32)

        r0 = _radius_c(x1, x2, x3, spin)
        if carry_io:
            # Carried state: masks pack (alive, trunc, flag, bad, ovf)
            # bits; positions/momenta arrive through the ordinary ray
            # columns (the host rebuilds them per phase).
            n_base = nbase_r[0, 0]
            masks0 = masksr[:]
            state0 = dict(
                w=jnp.zeros((), jnp.int32),
                x0=x0, x1=x1, x2=x2, x3=x3, p1=p1, p2=p2, p3=p3,
                r=r0,
                alive=masks0 & 1, trunc=(masks0 >> 1) & 1,
                flag=(masks0 >> 2) & 1, bad=(masks0 >> 3) & 1,
                ovf=(masks0 >> 4) & 1,
                r_mid_prev=rmidr[:], n_samp=nsampr[:],
            )
            for f_i in range(nf):
                state0[f"I{f_i}"] = i_inr[f_i][:]
                state0[f"A{f_i}"] = a_inr[f_i][:]
        else:
            n_base = jnp.zeros((), jnp.int32)
            # Padding rays (prep() parks them at x1 = 1e3) start DEAD so
            # they never vote on brick origins; real rays never start
            # there (the camera is interior to it by construction).
            alive0 = (x1 != 1.0e3).astype(jnp.int32)
            state0 = dict(
                w=jnp.zeros((), jnp.int32),
                x0=x0, x1=x1, x2=x2, x3=x3, p1=p1, p2=p2, p3=p3,
                # Kerr-Schild radius of the current position, carried
                # across steps (each step's r_new is the next step's r) so
                # the step-size/termination radius is never recomputed.
                r=r0,
                alive=alive0, trunc=i_false, flag=i_false,
                bad=i_false, ovf=i_false,
                r_mid_prev=zero, n_samp=jnp.zeros(shape, jnp.int32),
            )
            if integrator == "dp":
                state0["h"] = -params.ray_step * r0
                state0["num_retry"] = jnp.zeros(shape, jnp.int32)
                state0["prev_fail"] = i_false
            for f_i in range(nf):
                state0[f"I{f_i}"] = zero
                # attenuation exp(-tau) carried multiplicatively: each
                # step multiplies by exp(-delta_tau) (= 1 - em, already
                # computed) instead of accumulating tau and paying an exp
                # per frequency per step
                state0[f"A{f_i}"] = jnp.ones(shape, f32)

        def sks_of(cx, cy, cz, r=None):
            return _cks_to_sks_c(cx, cy, cz, spin, r)

        def off_grid_of(r, th, ph):
            return ((r < r_lo) | (r > r_hi) | (th < th_lo) | (th > th_hi)
                    | (ph < ph_lo) | (ph > ph_hi))

        def sample_update(s, out_tr, valid, mx0, mx1, mx2, mx3,
                          mk0, mk1, mk2, mk3, h, scratch, origins,
                          r_mid=None):
            """Global locate, per-group angular-line corner gathers,
            thermal coefficients, RT.

            Returns (bad_acc, ovf_acc) int32 masks; mutates out_tr."""
            k0v, j0v = origins        # (R, LANES) per-group broadcasts
            # Invalid samples park at possibly-horizon states; evaluate at
            # the camera instead (values discarded via `valid`).
            sx0 = jnp.where(valid, mx0, cam[0])
            sx1 = jnp.where(valid, mx1, cam[1])
            sx2 = jnp.where(valid, mx2, cam[2])
            sx3 = jnp.where(valid, mx3, cam[3])
            sk0 = jnp.where(valid, mk0, -1.0)
            sk1 = jnp.where(valid, mk1, 1.0)
            sk2 = jnp.where(valid, mk2, 0.0)
            sk3 = jnp.where(valid, mk3, 0.0)
            if "sks" in ablate:  # timing ablation only - wrong values
                r = jnp.abs(sx1) + 2.0
                th = jnp.abs(sx2) * 0.01 + 1.5
                ph = jnp.abs(sx3) * 0.01 + 3.0
            else:
                # The step body already computed the midpoint radius
                # (bitwise the same _radius_c chain the conversion would
                # run); parked samples sit at the camera, whose radius is
                # a host constant.
                r_pre = None if r_mid is None \
                    else jnp.where(valid, r_mid, r_cam)
                r, th, ph = sks_of(sx1, sx2, sx3, r_pre)
            off_grid = off_grid_of(r, th, ph)
            use = valid & ~off_grid

            if "locate" in ablate:  # timing ablation only - wrong values
                im_i = jnp.clip(sx1.astype(jnp.int32), 0, n_i - 1)
                im_j = jnp.clip(sx2.astype(jnp.int32), 0, n_j - 1)
                km = jnp.clip(sx3.astype(jnp.int32), 0, n_k - 1)
                f_i = f_j = f_k = r - r
            else:
                _, im_i, f_i = locate_axis(r, x1f_r, x1v_r, n_i)
                _, im_j, f_j = locate_axis(th, x2f_r, x2v_r, n_j)
                _, km, f_k = locate_axis(ph, x3f_r, x3v_r, n_k)

            # Global anchor clamps (sample_grid lines 286-288), then
            # group-relative angular offsets; out-of-brick live samples
            # latch the per-RAY overflow: that ray's transfer is
            # unreliable from here on (the host re-renders exactly those
            # rays on the XLA path), but its geodesic - which sampling
            # never feeds back into - keeps integrating, and the latch
            # removes it from future origin votes so one fanning outlier
            # cannot drag the brick away from the coherent majority.
            im_i = jnp.clip(im_i, 0, n_i - 2)
            im_j = jnp.clip(im_j, 0, n_j - 2)
            km = jnp.clip(km, 0, n_k - 2)
            rel_j = im_j - j0v
            rel_k = km - k0v
            rel_k = rel_k + jnp.where(rel_k < 0, n_k, 0)   # phi wrap
            oob = ((rel_j < 0) | (rel_j > bj - 2)
                   | (rel_k < 0) | (rel_k > bk - 2))
            ovf_acc = (use & oob).astype(jnp.int32)
            rel_j = jnp.clip(rel_j, 0, bj - 2)
            rel_k = jnp.clip(rel_k, 0, bk - 2)

            i_lo = im_i
            i_hi = im_i + 1

            w_i1 = f_i
            w_i0 = 1.0 - f_i
            w_j1 = f_j
            w_j0 = 1.0 - f_j
            w_k1 = f_k
            w_k0 = 1.0 - f_k
            if "weights" in ablate:  # timing ablation only - wrong values
                cw0 = {key: w_i0 for key in
                       ((0, 0), (0, 1), (1, 0), (1, 1))}
                cw1 = {key: w_i1 for key in
                       ((0, 0), (0, 1), (1, 0), (1, 1))}
            else:
                # (dk, dj) corner weights for di = 0 / 1
                # (grid/sampling._CORNER_ORDER trilinear terms)
                cw0 = {(0, 0): w_k0 * w_j0 * w_i0,
                       (0, 1): w_k0 * w_j1 * w_i0,
                       (1, 0): w_k1 * w_j0 * w_i0,
                       (1, 1): w_k1 * w_j1 * w_i0}
                cw1 = {(0, 0): w_k0 * w_j0 * w_i1,
                       (0, 1): w_k0 * w_j1 * w_i1,
                       (1, 0): w_k1 * w_j0 * w_i1,
                       (1, 1): w_k1 * w_j1 * w_i1}

            if "gather" in ablate:  # timing ablation only - wrong values
                named = {nm: f_i + 0.1 for nm in names}
            else:
                named = _gather_corners(
                    scratch, acc_scr, names, var_of, nvar, bk, bj, n_chunks,
                    rows, use, oob, rel_k, rel_j, i_lo, i_hi, cw0, cw1,
                    shape)
            fb = {"rho": sp.fallback_rho, "pgas": sp.fallback_pgas,
                  "uu1": 0.0, "uu2": 0.0, "uu3": 0.0,
                  "bb1": 0.0, "bb2": 0.0, "bb3": 0.0}
            for nm in names:
                named[nm] = jnp.where(off_grid, fb[nm], named[nm])
            nan_mask = off_grid if sp.fallback_nan \
                else jnp.zeros(shape, bool)

            # coefficients (pipeline_simulation.make_simulation_coeff_fns)
            if "keep" in ablate:  # timing ablation only - wrong values
                keep_geo = valid
            else:
                keep_geo = _geometric_keep_c(sx1, sx2, sx3, r, th, sp, cam)
            if "fluid" in ablate:  # timing ablation only - wrong values
                one = named["rho"] + 1.0
                st = dict(n_e=one, bb_cgs=one, sigma=one, beta_inv=one,
                          theta_e=one, kb_tt_e=one, rho_cgs=one,
                          pgas_cgs=one, u=(one, one, one, one),
                          b=(one, one, one, one), b_sq=one)
                keep_val = None
                sin_b = 0.5 * one
                u_dot_k = -one
            else:
                st = _fluid_state_c(sx1, sx2, sx3, r, spin, named, sp)
                keep_val = _value_keep_c(st, sp)
                sin_b, u_dot_k = _pitch_angle_c(st, sk0, sk1, sk2, sk3)
            b_zero = ((named["bb1"] == 0.0) & (named["bb2"] == 0.0)
                      & (named["bb3"] == 0.0))
            keep = keep_geo & ~b_zero
            if keep_val is not None:
                keep = keep & keep_val
            coeff_bad = nan_mask & keep_geo

            bad_acc = jnp.zeros(shape, jnp.int32)
            for f_i_, nu in enumerate(nus):
                nu_cgs = -u_dot_k * nu * mom
                if "coeff" in ablate:  # timing ablation - wrong values
                    j, alpha, neg = nu_cgs, st["n_e"], nan_mask
                else:
                    j, alpha, neg = _thermal_j_alpha_c(nu_cgs, nu0, st,
                                                       sin_b, sp)
                j = jnp.where(keep, j, 0.0)
                alpha = jnp.where(keep, alpha, 0.0)
                nfin = ~(jnp.isfinite(j) & jnp.isfinite(alpha)) \
                    | (neg & keep)
                cbad = coeff_bad | nfin
                j = jnp.where(cbad, 0.0, j)
                alpha = jnp.where(cbad, 0.0, alpha)
                bad_acc = bad_acc | (valid & cbad).astype(jnp.int32)

                if "rt" in ablate:  # timing ablation only - wrong values
                    out_tr[f"I{f_i_}"] = s[f"I{f_i_}"] + j
                    out_tr[f"A{f_i_}"] = s[f"A{f_i_}"] + alpha
                    continue
                dl_cgs = jnp.where(valid, -h, 0.0) * (x_unit / nu) / mom
                pos_alpha = alpha > 0.0
                ss = j / jnp.where(pos_alpha, alpha, 1.0)
                delta_tau = alpha * dl_cgs
                atten = s[f"A{f_i_}"]
                thin = delta_tau <= DELTA_TAU_MAX
                em = -_expm1(-delta_tau)
                contrib = jnp.where(
                    pos_alpha, jnp.where(thin, ss * em, ss), j * dl_cgs)
                out_tr[f"I{f_i_}"] = s[f"I{f_i_}"] \
                    + jnp.where(valid, contrib * atten, 0.0)
                # exp(-delta_tau) = 1 - em (already computed); optically
                # thick steps zero the attenuation permanently (the
                # reference's dtau = inf saturation, unpolarized.cpp:98-110)
                att_fac = jnp.where(valid & pos_alpha,
                                    jnp.where(thin, 1.0 - em, 0.0), 1.0)
                out_tr[f"A{f_i_}"] = atten * att_fac
            return bad_acc, ovf_acc

        def rk_step(s, n_abs, origins):
            """One rk4/rk2 step + fused sampling/transfer (port of
            pallas_formula body_rk4 with the simulation sample_update)."""
            x0, x1, x2, x3 = s["x0"], s["x1"], s["x2"], s["x3"]
            p1, p2, p3 = s["p1"], s["p2"], s["p3"]
            live = n_abs < max_steps
            s_alive = (s["alive"] > 0) & live
            s_trunc = s["trunc"] > 0
            s_flag = s["flag"] > 0
            r = s["r"]
            h = jnp.where(s_alive,
                          -params.ray_step * (r - params.r_horizon), 0.0)

            comps = (x0, x1, x2, x3, p1, p2, p3)

            def at(base, k, w):
                return [base[ci] + (w * h) * k[ci] for ci in range(7)]

            k1 = rhs(x0, x1, x2, x3, p0, p1, p2, p3)
            if integrator == "rk4":
                if "rhs1" in ablate:  # timing ablation - wrong values
                    k2 = k3 = k4 = k1
                else:
                    y2 = at(comps, k1, 0.5)
                    k2 = rhs(y2[0], y2[1], y2[2], y2[3], p0,
                             y2[4], y2[5], y2[6])
                    y3 = at(comps, k2, 0.5)
                    k3 = rhs(y3[0], y3[1], y3[2], y3[3], p0,
                             y3[4], y3[5], y3[6])
                    y4 = at(comps, k3, 1.0)
                    k4 = rhs(y4[0], y4[1], y4[2], y4[3], p0,
                             y4[4], y4[5], y4[6])
                y_end = [comps[ci] + h * (k1[ci] / 6.0 + k2[ci] / 3.0
                                          + k3[ci] / 3.0 + k4[ci] / 6.0)
                         for ci in range(7)]
                y_mid = [0.5 * (comps[ci] + y_end[ci]) for ci in range(7)]
            else:  # rk2 (Heun)
                yf = at(comps, k1, 1.0)
                k2 = rhs(yf[0], yf[1], yf[2], yf[3], p0, yf[4], yf[5], yf[6])
                y_end = [comps[ci] + 0.5 * h * (k1[ci] + k2[ci])
                         for ci in range(7)]
                y_mid = at(comps, k1, 0.5)

            if "renorm" in ablate:  # timing ablation only - wrong values
                e1, e2, e3 = y_end[4], y_end[5], y_end[6]
            else:
                fac = renormalize_factor_c(y_end[1], y_end[2], y_end[3], p0,
                                           y_end[4], y_end[5], y_end[6],
                                           spin, mass, flat=flat)
                e1, e2, e3 = y_end[4] * fac, y_end[5] * fac, y_end[6] * fac
            r_new = _radius_c(y_end[1], y_end[2], y_end[3], spin)
            if "mid" in ablate:  # timing ablation only - wrong values
                m1, m2, m3 = e1, e2, e3
                r_mid = r_new
            else:
                facm = renormalize_factor_c(y_mid[1], y_mid[2], y_mid[3], p0,
                                            y_mid[4], y_mid[5], y_mid[6],
                                            spin, mass, flat=flat)
                m1, m2, m3 = y_mid[4] * facm, y_mid[5] * facm, y_mid[6] * facm
                r_mid = _radius_c(y_mid[1], y_mid[2], y_mid[3], spin)

            have_prev = s["n_samp"] > 0
            trunc_now = have_prev & (
                ((r_mid > params.camera_r) & (r_mid > s["r_mid_prev"]))
                | (r_mid < params.r_terminate))
            trunc = s_trunc | (s_alive & trunc_now)
            valid = s_alive & ~trunc

            terminate = ((r_new > params.camera_r) & (r_new > r)) \
                | (r_new < params.r_terminate)
            is_last = n_abs == max_steps - 1
            flag = s_flag | (s_alive & ~terminate & is_last)
            alive = (s["alive"] > 0) & ~(s_alive & terminate)

            out_tr = {}
            bad_acc, ovf_acc = sample_update(
                s, out_tr, valid, y_mid[0], y_mid[1], y_mid[2], y_mid[3],
                p0, m1, m2, m3, h, brick_scr, origins, r_mid=r_mid)

            park = ~alive
            upd = s_alive

            def sel(pv, nv, ov):
                return jnp.where(park, pv, jnp.where(upd, nv, ov))

            return dict(
                w=s["w"],
                x0=sel(0.0, y_end[0], x0), x1=sel(1.0e3, y_end[1], x1),
                x2=sel(0.0, y_end[2], x2), x3=sel(0.0, y_end[3], x3),
                p1=sel(1.0, e1, p1), p2=sel(0.0, e2, p2),
                p3=sel(0.0, e3, p3),
                r=sel(1.0e3, r_new, r),
                alive=alive.astype(jnp.int32),
                trunc=((live & trunc)
                       | (jnp.logical_not(live) & s_trunc))
                .astype(jnp.int32),
                flag=flag.astype(jnp.int32),
                bad=s["bad"] | bad_acc,
                ovf=s["ovf"] | ovf_acc,
                r_mid_prev=jnp.where(valid, r_mid, s["r_mid_prev"]),
                n_samp=s["n_samp"] + valid.astype(jnp.int32),
                **out_tr,
            )

        def dp_step(s, n_abs, origins):
            """One Dormand-Prince attempt + fused sampling/transfer (port
            of pallas_formula's dp body: reference error control,
            geodesics.cpp:39-323, with the sample-density h cap replacing
            dense-output subdivision)."""
            x0, x1, x2, x3 = s["x0"], s["x1"], s["x2"], s["x3"]
            p1, p2, p3 = s["p1"], s["p2"], s["p3"]
            live = n_abs < max_steps
            s_alive = (s["alive"] > 0) & live
            s_trunc = s["trunc"] > 0
            s_flag = s["flag"] > 0
            s_prev_fail = s["prev_fail"] > 0
            r = s["r"]

            def rhs_d(a0, a1, a2, a3, b0, b1, b2, b3):
                return geodesic_rhs_c(a1, a2, a3, b0, b1, b2, b3, spin,
                                      mass, flat=flat, with_distance=True)

            A = geo._DP_A
            B5, B4, B4M = geo._DP_B5, geo._DP_B4, geo._DP_B4M
            k = [None] * 7
            k[0] = rhs_d(x0, x1, x2, x3, p0, p1, p2, p3)
            ds_dlam = jnp.abs(k[0][7]) + 1e-30
            h_cap = params.ray_step * r / ds_dlam
            h = -jnp.minimum(jnp.abs(s["h"]), h_cap)

            comps = (x0, x1, x2, x3, p1, p2, p3)

            def add_stage(base, weights, stages, scale):
                out = []
                for ci in range(7):
                    acc = None
                    for q in stages:
                        wq = float(weights[q])
                        if wq == 0.0:
                            continue
                        term = (wq * scale) * k[q][ci]
                        acc = term if acc is None else acc + term
                    out.append(base[ci] if acc is None else base[ci] + acc)
                return out

            for i in range(1, 7):
                ysub = add_stage(comps, A[i], range(i), h)
                k[i] = rhs_d(ysub[0], ysub[1], ysub[2], ysub[3], p0,
                             ysub[4], ysub[5], ysub[6])

            y5 = add_stage(comps, B5, range(7), h)
            y4 = add_stage(comps, B4, range(7), h)
            y4m = add_stage(comps, B4M, range(7), h)

            err = jnp.zeros(shape, jnp.float32)
            for ci in range(7):
                ya = jnp.maximum(jnp.abs(comps[ci]), jnp.abs(y5[ci]))
                sc = params.ray_tol_abs + params.ray_tol_rel * ya
                err = jnp.maximum(err, jnp.abs(y5[ci] - y4[ci]) / sc)

            accept = err <= 1.0
            err_safe = jnp.maximum(err, 1e-30)
            fac_ideal = geo._DP_ERR_FACTOR * err_safe ** (-geo._DP_ERR_POWER)
            fac_rej = jnp.maximum(
                jnp.where(jnp.isfinite(err), fac_ideal, geo._DP_MIN_FACTOR),
                geo._DP_MIN_FACTOR)
            fac_acc = jnp.clip(fac_ideal, geo._DP_MIN_FACTOR,
                               geo._DP_MAX_FACTOR)
            fac_acc = jnp.where(err == 0.0, geo._DP_MAX_FACTOR, fac_acc)
            fac_acc = jnp.where(s_prev_fail, jnp.minimum(fac_acc, 1.0),
                                fac_acc)
            h_next = h * jnp.where(accept, fac_acc, fac_rej)

            num_retry = jnp.where(accept, 0, s["num_retry"] + 1)
            retry_exceeded = num_retry > params.ray_max_retries
            flag = s_flag | (s_alive & retry_exceeded)
            dead_from_retry = s_alive & retry_exceeded

            fac = renormalize_factor_c(y5[1], y5[2], y5[3], p0,
                                       y5[4], y5[5], y5[6], spin, mass,
                                       flat=flat)
            e1, e2, e3 = y5[4] * fac, y5[5] * fac, y5[6] * fac
            r_new = _radius_c(y5[1], y5[2], y5[3], spin)

            facm = renormalize_factor_c(y4m[1], y4m[2], y4m[3], p0,
                                        y4m[4], y4m[5], y4m[6], spin, mass,
                                        flat=flat)
            m1, m2, m3 = y4m[4] * facm, y4m[5] * facm, y4m[6] * facm
            r_mid = _radius_c(y4m[1], y4m[2], y4m[3], spin)

            have_prev = s["n_samp"] > 0
            trunc_now = have_prev & (
                ((r_mid > params.camera_r) & (r_mid > s["r_mid_prev"]))
                | (r_mid < params.r_terminate))
            trunc = s_trunc | (s_alive & accept & trunc_now)
            valid = s_alive & accept & ~trunc & ~retry_exceeded

            terminate = ((r_new > params.camera_r) & (r_new > r)) \
                | (r_new < params.r_terminate)
            is_last = n_abs == max_steps - 1
            flag = flag | (s_alive & accept & ~terminate & is_last)
            alive = (s["alive"] > 0) & ~(s_alive & accept & terminate) \
                & ~dead_from_retry

            out_tr = {}
            bad_acc, ovf_acc = sample_update(
                s, out_tr, valid, y4m[0], y4m[1], y4m[2], y4m[3],
                p0, m1, m2, m3, h, brick_scr, origins, r_mid=r_mid)

            park = ~alive
            step_taken = s_alive & accept

            def sel(pv, nv, ov):
                return jnp.where(park, pv, jnp.where(step_taken, nv, ov))

            return dict(
                w=s["w"],
                x0=sel(0.0, y5[0], x0), x1=sel(1.0e3, y5[1], x1),
                x2=sel(0.0, y5[2], x2), x3=sel(0.0, y5[3], x3),
                p1=sel(1.0, e1, p1), p2=sel(0.0, e2, p2),
                p3=sel(0.0, e3, p3),
                r=sel(1.0e3, r_new, r),
                h=jnp.where(s_alive, h_next, s["h"]),
                num_retry=jnp.where(s_alive, num_retry, s["num_retry"]),
                prev_fail=((s_alive & ~accept)
                           | (jnp.logical_not(s_alive) & s_prev_fail))
                .astype(jnp.int32),
                alive=alive.astype(jnp.int32),
                trunc=((live & trunc)
                       | (jnp.logical_not(live) & s_trunc))
                .astype(jnp.int32),
                flag=flag.astype(jnp.int32),
                bad=s["bad"] | bad_acc,
                ovf=s["ovf"] | ovf_acc,
                r_mid_prev=jnp.where(valid, r_mid, s["r_mid_prev"]),
                n_samp=s["n_samp"] + valid.astype(jnp.int32),
                **out_tr,
            )

        def window_setup(s):
            """Angular anchor vote per sublane group, one angular-line
            slab DMA per group (full radial axis as lanes)."""
            if "window" in ablate:  # timing ablation only - wrong values
                zero_v = jnp.zeros((rows, LANES), jnp.int32)
                return (zero_v, zero_v)
            candid = (s["alive"] > 0) & (s["ovf"] == 0)
            return _window_setup_impl(
                s["x1"], s["x2"], s["x3"], s["r"], candid, spin,
                x2f_r, x2v_r, x3f_r, x3v_r, n_j, n_k, bk, bj, mk, mj,
                rows, shape, off_grid_of, tab_hbm, brick_scr, sem,
                interpret)

        def cond(s):
            return (s["w"] < n_windows) & jnp.any(s["alive"] > 0)

        def outer(s):
            origins = window_setup(s)
            base = n_base + s["w"] * window

            step_fn = dp_step if integrator == "dp" else rk_step

            if unroll:
                # Unroll the window: Mosaic's loop-carry handling costs
                # ~10x the step's actual arithmetic (round-5 ablation:
                # the fully-ablated skeleton ran 26.7 of the full 55.3
                # ms/block), so carries should only cross the outer
                # while_loop boundary, once per window.
                for t in range(window):
                    s = step_fn(s, base + t, origins)
            else:
                def inner(t, st):
                    return step_fn(st, base + t, origins)

                s = jax.lax.fori_loop(0, window, inner, s)
            s = dict(s)
            s["w"] = s["w"] + 1
            return s

        s = jax.lax.while_loop(cond, outer, state0)
        poison = s["bad"] > 0
        if sp.fallback_nan:
            poison = poison | (s["flag"] > 0)
        for f_i in range(nf):
            i_outs[f_i][:] = jnp.where(poison, jnp.nan,
                                       s[f"I{f_i}"] * i_scales[f_i])
        flag_out[:] = s["flag"]
        nsamp_out[:] = s["n_samp"]
        ovf_out[:] = s["ovf"]
        if carry_io:
            for oi, key in enumerate(("x0", "x1", "x2", "x3",
                                      "p1", "p2", "p3")):
                pos_outs[oi][:] = s[key]
            masks_out[:] = (s["alive"] + 2 * s["trunc"] + 4 * s["flag"]
                            + 8 * s["bad"] + 16 * s["ovf"])
            rmid_out[:] = s["r_mid_prev"]
            for f_i in range(nf):
                iraw_outs[f_i][:] = s[f"I{f_i}"]
                araw_outs[f_i][:] = s[f"A{f_i}"]

    return kernel


def render_simulation(positions, directions, momentum_factors, frequencies,
                      params: geo.GeodesicParams, sp: SimKernelParams,
                      kg: KernelGrid, mass_msun: float, camera_x,
                      log_j_scale: float, integrator: str = "rk4",
                      window: int = WINDOW, brick=BRICK, margin=MARGIN,
                      interpret: bool = False, ablate=(), rows=ROWS,
                      unroll: bool = True):
    """Fused Pallas render of a ray bundle against a prepared grid.

    Returns (I_nu (B, F) - or (B,) for scalar frequency -, flags (B,) bool,
    n_samples (B,), overflow (B,) bool). overflow=True means THAT RAY's
    anchor left its block's brick in some window - the caller must
    re-render exactly those rays on the XLA path (their I values are
    unreliable; flags/n_samples are still exact since the geodesic never
    depends on sampled values).
    """
    scalar_freq = np.ndim(frequencies) == 0
    nus = ([float(frequencies)] if scalar_freq
           else [float(v) for v in np.asarray(frequencies)])
    b = positions.shape[0]
    block = rows * LANES
    n_pad = (-b) % block
    dtype = jnp.float32

    def prep(a, pad_row):
        a = jnp.asarray(a, dtype)
        if n_pad:
            padding = jnp.broadcast_to(jnp.asarray(pad_row, dtype),
                                       (n_pad,) + a.shape[1:])
            a = jnp.concatenate([a, padding], axis=0)
        return a

    pos = prep(positions, [0.0, 1.0e3, 0.0, 0.0])
    dirs = prep(directions, [-1.0, -1.0, 0.0, 0.0])
    mom = prep(momentum_factors, 1.0)
    n_blocks = (b + n_pad) // block

    cols = [pos[:, 0], pos[:, 1], pos[:, 2], pos[:, 3],
            dirs[:, 0], dirs[:, 1], dirs[:, 2], dirs[:, 3], mom]
    cols = [c.reshape(n_blocks * rows, LANES) for c in cols]

    kg_meta = (kg.n_i, kg.n_j, kg.n_k, kg.n_i_pad, kg.nvar, kg.ind,
               kg.bounds)
    kernel = _make_kernel(params, sp, kg_meta, nus, mass_msun,
                          np.asarray(camera_x, np.float64), log_j_scale,
                          integrator=integrator, window=window,
                          brick=brick, margin=margin, interpret=interpret,
                          ablate=ablate, rows=rows, unroll=unroll)

    nf = len(nus)
    bk, bj = brick
    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [ray_spec] * 9 + [row_spec] * 6 \
        + [pl.BlockSpec(memory_space=pltpu.ANY)]
    out_shape = (
        [jax.ShapeDtypeStruct((n_blocks * rows, LANES), dtype)] * nf
        + [jax.ShapeDtypeStruct((n_blocks * rows, LANES), jnp.int32)] * 3)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[ray_spec] * (nf + 3),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((rows, kg.nvar, bk, bj, kg.n_i_pad), jnp.float32),
            pltpu.VMEM((kg.nvar + 2, rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((rows,))],
        # The angular-line tables exceed the default 16 MB scoped-VMEM
        # budget at production brick sizes; v5e has ~120 MB usable
        # (probed by scripts/bench_pallas_probe.py vmem_ceiling).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*cols, kg.x1f, kg.x1v, kg.x2f, kg.x2v, kg.x3f, kg.x3v, kg.table)
    imgs = [o.reshape(-1)[:b] for o in outs[:nf]]
    flags = outs[nf].reshape(-1)[:b].astype(bool)
    nsamp = outs[nf + 1].reshape(-1)[:b]
    ovf = outs[nf + 2].reshape(-1)[:b].astype(bool)
    i_img = imgs[0] if scalar_freq else jnp.stack(imgs, axis=-1)
    return i_img, flags, nsamp, ovf


def render_simulation_phase(positions, directions, momentum_factors,
                            carry, n_base, frequencies,
                            params: geo.GeodesicParams, sp: SimKernelParams,
                            kg: KernelGrid, mass_msun: float, camera_x,
                            log_j_scale: float, integrator: str = "rk4",
                            window: int = WINDOW, brick=BRICK,
                            margin=MARGIN, interpret: bool = False,
                            rows=ROWS, phase_steps: int = 512):
    """One carry-io phase launch (see render_simulation_phased).

    positions/directions columns already reflect the carried ray state
    (p0 and momentum factors are constants of motion). carry is a dict
    {masks (B,) int32 packed alive|trunc|flag|bad|ovf, r_mid_prev (B,),
    n_samp (B,), I (B, F), A (B, F)}; B must be a multiple of
    rows * LANES. n_base is the absolute step index this phase starts at
    (dynamic - one executable serves every phase).

    Returns (i_img (B, F) poisoned+scaled, flags, nsamp, ovf,
    new_pos (B, 4), new_dir_p (B, 3), new_carry).
    """
    if phase_steps % window:
        raise ValueError("phase_steps must be a multiple of window")
    nus = [float(v) for v in np.asarray(frequencies)]
    nf = len(nus)
    b = positions.shape[0]
    block = rows * LANES
    if b % block:
        raise ValueError("phased launches take pre-padded bundles")
    n_blocks = b // block
    dtype = jnp.float32

    def col(a):
        return jnp.asarray(a).reshape(n_blocks * rows, LANES)

    pos = jnp.asarray(positions, dtype)
    dirs = jnp.asarray(directions, dtype)
    cols = [col(pos[:, m]) for m in range(4)] \
        + [col(dirs[:, m]) for m in range(4)] \
        + [col(jnp.asarray(momentum_factors, dtype))]
    carry_cols = [col(jnp.asarray(carry["masks"], jnp.int32)),
                  col(jnp.asarray(carry["r_mid_prev"], dtype)),
                  col(jnp.asarray(carry["n_samp"], jnp.int32))]
    for f_i in range(nf):
        carry_cols.append(col(jnp.asarray(carry["I"][:, f_i], dtype)))
    for f_i in range(nf):
        carry_cols.append(col(jnp.asarray(carry["A"][:, f_i], dtype)))
    nbase = jnp.asarray(n_base, jnp.int32).reshape(1, 1)

    kg_meta = (kg.n_i, kg.n_j, kg.n_k, kg.n_i_pad, kg.nvar, kg.ind,
               kg.bounds)
    kernel = _make_kernel(params, sp, kg_meta, nus, mass_msun,
                          np.asarray(camera_x, np.float64), log_j_scale,
                          integrator=integrator, window=window,
                          brick=brick, margin=margin, interpret=interpret,
                          rows=rows, carry_io=True,
                          phase_windows=phase_steps // window)

    bk, bj = brick
    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [ray_spec] * 9 + [smem_spec] + [ray_spec] * (3 + 2 * nf) \
        + [row_spec] * 6 + [pl.BlockSpec(memory_space=pltpu.ANY)]
    fshape = jax.ShapeDtypeStruct((n_blocks * rows, LANES), dtype)
    ishape = jax.ShapeDtypeStruct((n_blocks * rows, LANES), jnp.int32)
    out_shape = [fshape] * nf + [ishape] * 3 \
        + [fshape] * 7 + [ishape, fshape] + [fshape] * (2 * nf)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[ray_spec] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((rows, kg.nvar, bk, bj, kg.n_i_pad), jnp.float32),
            pltpu.VMEM((kg.nvar + 2, rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((rows,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*cols, nbase, *carry_cols,
      kg.x1f, kg.x1v, kg.x2f, kg.x2v, kg.x3f, kg.x3v, kg.table)

    def flat(o):
        return o.reshape(-1)

    i_img = jnp.stack([flat(outs[f_i]) for f_i in range(nf)], axis=-1)
    flags = flat(outs[nf]).astype(bool)
    nsamp = flat(outs[nf + 1])
    ovf = flat(outs[nf + 2]).astype(bool)
    st = outs[nf + 3:]
    new_pos = jnp.stack([flat(st[m]) for m in range(4)], axis=-1)
    new_dir_p = jnp.stack([flat(st[4 + m]) for m in range(3)], axis=-1)
    new_carry = {
        "masks": flat(st[7]), "r_mid_prev": flat(st[8]),
        "n_samp": nsamp,
        "I": jnp.stack([flat(st[9 + f_i]) for f_i in range(nf)], axis=-1),
        "A": jnp.stack([flat(st[9 + nf + f_i]) for f_i in range(nf)],
                       axis=-1),
    }
    return i_img, flags, nsamp, ovf, new_pos, new_dir_p, new_carry


def render_simulation_phased(positions, directions, momentum_factors,
                             frequencies, params: geo.GeodesicParams,
                             sp: SimKernelParams, kg: KernelGrid,
                             mass_msun: float, camera_x,
                             log_j_scale: float, integrator: str = "rk4",
                             window: int = WINDOW, brick=BRICK,
                             margin=MARGIN, rows=ROWS,
                             phase_steps: int = 512,
                             chunk_rays: int = 16384, phase_jit=None):
    """Phased-dispatch render: like render_simulation, but the step budget
    is split into phases of phase_steps and finished/overflowed rays are
    compacted away between phases.

    A kernel block runs until its SLOWEST ray terminates (the while cond
    is any(alive)), so a monolithic launch pays sum-of-block-maxima of
    the ray step counts while useful work is the mean (~1.4x waste on the
    BASELINE mock workload, scripts/bench_raggedness.py). Compacting
    survivors every phase_steps bounds that tax to the final phase.
    Overflow-latched rays are also dropped at phase boundaries - the
    caller re-renders them on the XLA path anyway - so (unlike
    render_simulation) their flags/n_samples outputs here are NOT exact;
    callers must take those from the fallback render too.

    One executable serves all phases and chunks: every launch is
    chunk_rays rays (the survivor pool is re-tiled by spatial_order and
    padded), and the phase's absolute step base rides in SMEM.

    phase_jit: optional pre-jitted render_simulation_phase closure (the
    pipeline passes one so repeated bundles share it).

    Returns (i_img (B, F), flags, nsamp, ovf) like render_simulation.
    """
    b = positions.shape[0]
    nus = np.asarray(frequencies)
    nf = len(nus)
    if phase_jit is None:
        phase_jit = jax.jit(
            lambda p, d, m, c, nb, kgrid: render_simulation_phase(
                p, d, m, c, nb, nus, params, sp, kgrid, mass_msun,
                np.asarray(camera_x), log_j_scale, integrator=integrator,
                window=window, brick=brick, margin=margin, rows=rows,
                phase_steps=phase_steps))

    max_steps = params.ray_max_steps
    n_phases = -(-max_steps // phase_steps)

    # Working pool (float32 host arrays)
    cur_pos = np.asarray(positions, np.float32)
    cur_dir = np.asarray(directions, np.float32)
    cur_mom = np.asarray(momentum_factors, np.float32)
    cur_idx = np.arange(b)
    carry = {"masks": np.ones(b, np.int32),
             "r_mid_prev": np.zeros(b, np.float32),
             "n_samp": np.zeros(b, np.int32),
             "I": np.zeros((b, nf), np.float32),
             "A": np.ones((b, nf), np.float32)}

    out_i = np.full((b, nf), np.nan, np.float32)
    out_flags = np.zeros(b, bool)
    out_nsamp = np.zeros(b, np.int64)
    out_ovf = np.zeros(b, bool)

    pad_pos = np.array([0.0, 1.0e3, 0.0, 0.0], np.float32)
    pad_dir = np.array([-1.0, -1.0, 0.0, 0.0], np.float32)

    for phase in range(n_phases):
        nb = len(cur_idx)
        n_pad = (-nb) % chunk_rays
        if n_pad:
            cur_pos = np.concatenate(
                [cur_pos, np.broadcast_to(pad_pos, (n_pad, 4))])
            cur_dir = np.concatenate(
                [cur_dir, np.broadcast_to(pad_dir, (n_pad, 4))])
            cur_mom = np.concatenate([cur_mom, np.ones(n_pad, np.float32)])
            carry = {k: np.concatenate(
                [v, np.zeros((n_pad,) + v.shape[1:], v.dtype)])
                for k, v in carry.items()}
        # Dispatch every chunk of the phase asynchronously, then fetch all
        # results in ONE batched device_get: a per-chunk np.asarray would
        # serialize a blocking transfer per output array per chunk, which
        # on a high-latency backend (the remote axon tunnel) costs far
        # more than the kernel time itself.
        launched = []
        for i in range(0, nb + n_pad, chunk_rays):
            sl = slice(i, i + chunk_rays)
            csl = {k: v[sl] for k, v in carry.items()}
            launched.append(phase_jit(cur_pos[sl], cur_dir[sl],
                                      cur_mom[sl], csl,
                                      phase * phase_steps, kg))
        fetched = jax.device_get(launched)
        ii = np.concatenate([f[0] for f in fetched])[:nb]
        fl = np.concatenate([f[1] for f in fetched])[:nb]
        ns = np.concatenate([f[2] for f in fetched])[:nb]
        ov = np.concatenate([f[3] for f in fetched])[:nb]
        npos = np.concatenate([f[4] for f in fetched])[:nb]
        ndirp = np.concatenate([f[5] for f in fetched])[:nb]
        nc = {k: np.concatenate([f[6][k] for f in fetched])[:nb]
              for k in carry}

        alive = (nc["masks"] & 1).astype(bool)
        done = ~alive | ov | (phase == n_phases - 1)
        di = cur_idx[done]
        out_i[di] = ii[done]
        out_flags[di] = fl[done]
        out_nsamp[di] = ns[done]
        out_ovf[di] = ov[done]
        keep = ~done
        if not keep.any():
            break
        cur_idx = cur_idx[keep]
        cur_pos = npos[keep]
        cur_dir = np.concatenate([cur_dir[:nb][keep][:, :1],
                                  ndirp[keep]], axis=1)
        cur_mom = cur_mom[:nb][keep]
        carry = {k: v[keep] for k, v in nc.items()}
        # Re-tile the survivor pool: positions have evolved, so the
        # original camera-plane ordering no longer bounds the brick span.
        # Sort by the coordinates the brick actually spans - (phi, theta)
        # angles - not a camera-plane PCA proxy: mid-flight survivors from
        # different image tiles can be angular neighbors and vice versa.
        order = angular_order(cur_pos, block=rows * LANES)
        cur_idx = cur_idx[order]
        cur_pos = cur_pos[order]
        cur_dir = cur_dir[order]
        cur_mom = cur_mom[order]
        carry = {k: v[order] for k, v in carry.items()}

    i_img = jnp.asarray(out_i[:, 0] if nf == 1 and np.ndim(
        np.asarray(frequencies)) == 0 else out_i)
    return (i_img, jnp.asarray(out_flags), jnp.asarray(out_nsamp),
            jnp.asarray(out_ovf))

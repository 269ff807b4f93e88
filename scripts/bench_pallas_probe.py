"""Probe Mosaic/Pallas primitives for the fused simulation kernel design.

Measures, inside real TPU Pallas kernels:
  1. one-hot MXU matmul expansion: slots (R,128) -> one-hot (R*128, cap)
     @ table (cap, P) -> per-ray columns, including the relayout back to
     (R,128) per-variable tiles;
  2. dynamic per-lane gather (take_along_axis) from a lane-replicated
     (cap, 128) VMEM table, if Mosaic lowers it at all;
  3. raw relayout cost (R,128) <-> (R*128, 1);
  4. VMEM ceiling: largest allocatable scratch.

Each probe repeats its op STEPS times inside a fori_loop so per-call
overhead amortizes; results print as one JSON line per probe.
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8          # sublane rows per ray block -> R*128 rays
LANES = 128
STEPS = 256    # inner repetitions per kernel call


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def probe_onehot_matmul(cap, p_cols, interpret=False):
    """One-hot expansion via MXU: build (R*128, cap) one-hot from slots,
    matmul against (cap, p_cols) table, fold trilinear on the matmul
    output layout, reduce back to one (R,128) tile."""

    def kernel(slot_ref, table_ref, out_ref):
        def body(n, acc):
            slot = slot_ref[:] + n % 3          # perturb to defeat CSE
            slot_col = slot.reshape(R * LANES, 1)
            iota = jax.lax.broadcasted_iota(jnp.int32, (R * LANES, cap), 1)
            oh = (iota == slot_col).astype(jnp.float32)
            cols = jnp.dot(oh, table_ref[:],
                           preferred_element_type=jnp.float32)
            v = cols[:, 0] + 0.5 * cols[:, 1]
            return acc + v.reshape(R, LANES)

        out_ref[:] = jax.lax.fori_loop(0, STEPS, body,
                                       jnp.zeros((R, LANES), jnp.float32))

    slots = jnp.asarray(
        np.random.randint(0, cap, size=(R, LANES)), jnp.int32)
    table = jnp.asarray(np.random.rand(cap, p_cols), jnp.float32)
    fn = jax.jit(lambda s, t: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(s, t))
    dt, _ = timeit(fn, slots, table)
    per_step_us = dt / STEPS * 1e6
    return {"probe": f"onehot_matmul cap={cap} p={p_cols}",
            "us_per_step_per_1024rays": round(per_step_us, 3)}


def probe_dynamic_gather(cap, n_gathers, interpret=False):
    """Per-lane sublane gather from a lane-replicated (cap, 128) table."""

    def kernel(slot_ref, table_ref, out_ref):
        def body(n, acc):
            slot = (slot_ref[:] + n) % cap
            v = acc
            for g in range(n_gathers):
                idx = (slot + g) % cap
                v = v + jnp.take_along_axis(table_ref[:], idx, axis=0)
            return v

        out_ref[:] = jax.lax.fori_loop(0, STEPS, body,
                                       jnp.zeros((R, LANES), jnp.float32))

    slots = jnp.asarray(
        np.random.randint(0, cap, size=(R, LANES)), jnp.int32)
    table = jnp.asarray(np.random.rand(cap, LANES), jnp.float32)
    fn = jax.jit(lambda s, t: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(s, t))
    dt, _ = timeit(fn, slots, table)
    per_step_us = dt / STEPS * 1e6
    return {"probe": f"dyn_gather cap={cap} gathers={n_gathers}",
            "us_per_step_per_1024rays": round(per_step_us, 3)}


def probe_lane_gather(n_gathers, interpret=False):
    """Mosaic-supported form: take_along_axis(tab (8,128), idx (8,128),
    axis=1) - per-sublane gather along lanes (tpu.dynamic_gather axis 1).
    Each sublane-group of 128 rays selects from its own 128-cell table."""

    def kernel(slot_ref, table_ref, out_ref):
        def body(n, acc):
            slot = (slot_ref[:] + n) % LANES
            v = acc
            for g in range(n_gathers):
                idx = (slot + g) % LANES
                v = v + jnp.take_along_axis(table_ref[:], idx, axis=1)
            return v

        out_ref[:] = jax.lax.fori_loop(0, STEPS, body,
                                       jnp.zeros((R, LANES), jnp.float32))

    slots = jnp.asarray(
        np.random.randint(0, LANES, size=(R, LANES)), jnp.int32)
    table = jnp.asarray(np.random.rand(R, LANES), jnp.float32)
    fn = jax.jit(lambda s, t: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(s, t))
    dt, _ = timeit(fn, slots, table)
    per_step_us = dt / STEPS * 1e6
    return {"probe": f"lane_gather gathers={n_gathers}",
            "us_per_step_per_1024rays": round(per_step_us, 3)}


def probe_layout(form, interpret=False):
    """Layout-move feasibility probes for the per-group brick design:
    dma      - 8 per-group slab DMAs (sem array), no reshape;
    reshape  - value reshape (bk,bj,bi,nvar) -> (cap,nvar);
    transpose- value transpose (cap,nvar) -> (nvar,cap);
    minor    - value reshape (nvar,bk,bj,bi) -> (nvar,cap);
    """
    bk, bj, bi, nvar = 4, 4, 8, 8
    cap = bk * bj * bi

    if form == "dma":
        def kernel(tab_hbm, o_ref, out_ref, scratch, sem):
            def body(w, acc):
                for g in range(R):
                    pltpu.make_async_copy(
                        tab_hbm.at[pl.ds(o_ref[0] + g + w % 2, bk),
                                   pl.ds(0, bj), pl.ds(0, bi), :],
                        scratch.at[g], sem.at[g]).start()
                for g in range(R):
                    pltpu.make_async_copy(
                        tab_hbm.at[pl.ds(o_ref[0] + g + w % 2, bk),
                                   pl.ds(0, bj), pl.ds(0, bi), :],
                        scratch.at[g], sem.at[g]).wait()
                return acc + scratch[0, 0, 0, 0, 0]
            out_ref[:] = jax.lax.fori_loop(
                0, STEPS // 8, body, jnp.zeros((R, LANES), jnp.float32))
        scratch_shapes = [pltpu.VMEM((R, bk, bj, bi, nvar), jnp.float32),
                          pltpu.SemaphoreType.DMA((R,))]
        tab = jnp.asarray(np.random.rand(32, bj, bi, nvar), jnp.float32)
        args = (tab, jnp.zeros((1,), jnp.int32))
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.SMEM)]
    elif form == "reshape":
        def kernel(x_ref, out_ref):
            def body(w, acc):
                flat = (x_ref[:] + w).reshape(R, cap, nvar)
                return acc + flat[:, :LANES, 0]
            out_ref[:] = jax.lax.fori_loop(
                0, STEPS, body, jnp.zeros((R, LANES), jnp.float32))
        scratch_shapes = []
        args = (jnp.asarray(np.random.rand(R, bk, bj, bi, nvar),
                            jnp.float32),)
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    elif form == "transpose":
        def kernel(x_ref, out_ref):
            def body(w, acc):
                t = jnp.transpose(x_ref[:] + w, (1, 0))  # (nvar, cap)
                row = t[0:1, :LANES]
                return acc + jnp.broadcast_to(row, (R, LANES))
            out_ref[:] = jax.lax.fori_loop(
                0, STEPS, body, jnp.zeros((R, LANES), jnp.float32))
        scratch_shapes = []
        args = (jnp.asarray(np.random.rand(cap, nvar), jnp.float32),)
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    else:  # minor
        def kernel(x_ref, out_ref):
            def body(w, acc):
                flat = (x_ref[:] + w).reshape(nvar, cap)
                row = flat[0:1, :LANES]
                return acc + jnp.broadcast_to(row, (R, LANES))
            out_ref[:] = jax.lax.fori_loop(
                0, STEPS, body, jnp.zeros((R, LANES), jnp.float32))
        scratch_shapes = []
        args = (jnp.asarray(np.random.rand(nvar, bk, bj, bi), jnp.float32),)
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]

    fn = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*a))
    dt, _ = timeit(fn, *args)
    per_step_us = dt / STEPS * 1e6
    return {"probe": f"layout_{form}",
            "us_per_step_per_1024rays": round(per_step_us, 3)}


def probe_brick_reshape(bk, bj, bi, nvar=8, interpret=False):
    """DMA a (bk,bj,bi,nvar) slab from HBM per sublane-group, then view one
    variable as a (8, bk*bj*bi) gather table - the reshape Mosaic must
    support for the per-group brick design."""
    cap = bk * bj * bi

    def kernel(tab_hbm, o_ref, out_ref, scratch, sem):
        def body(w, acc):
            for g in range(R):
                copy = pltpu.make_async_copy(
                    tab_hbm.at[pl.ds(o_ref[0] + g + w % 2, bk),
                               pl.ds(0, bj), pl.ds(0, bi), :],
                    scratch.at[g], sem.at[g])
                copy.start()
            for g in range(R):
                pltpu.make_async_copy(
                    tab_hbm.at[pl.ds(o_ref[0] + g + w % 2, bk),
                               pl.ds(0, bj), pl.ds(0, bi), :],
                    scratch.at[g], sem.at[g]).wait()
            flat = scratch[:].reshape(R, cap, nvar)
            acc2 = acc
            for v in range(nvar):
                tab_v = flat[:, :, v]        # (8, cap)
                acc2 = acc2 + tab_v[:, :LANES]
            return acc2

        out_ref[:] = jax.lax.fori_loop(0, STEPS // 8, body,
                                       jnp.zeros((R, LANES), jnp.float32))

    tab = jnp.asarray(np.random.rand(32, bj, bi, nvar), jnp.float32)
    orig = jnp.zeros((1,), jnp.int32)
    fn = jax.jit(lambda t, o: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, bk, bj, bi, nvar), jnp.float32),
                        pltpu.SemaphoreType.DMA((R,))],
        interpret=interpret,
    )(t, o))
    dt, _ = timeit(fn, tab, orig)
    per_win_us = dt / (STEPS // 8) * 1e6
    return {"probe": f"brick_dma_reshape {bk}x{bj}x{bi}",
            "us_per_window_per_1024rays": round(per_win_us, 3)}


def probe_group_window(bk=4, bj=4, nvar=8, interpret=False):
    """Full window skeleton of the angular-line-table design: per-sublane
    -group anchor mins -> per-group DMA of an (nvar, bk, bj, 128) slab
    (radial axis = lanes, 128-aligned) -> static line-slice tables ->
    masked lane gathers for all 8 trilinear corners of every variable."""
    n_k, n_j, n_i = 32, 16, 128
    W = 8

    def kernel(tab_hbm, kk_ref, jj_ref, ii_ref, out_ref, scratch, sem):
        kk, jj, ii = kk_ref[:], jj_ref[:], ii_ref[:]

        def window(w, acc):
            k0s = []
            j0s = []
            for g in range(R):
                k0s.append(jnp.clip(jnp.min(kk[g] + w % 2) - 1, 0,
                                    n_k - bk))
                j0s.append(jnp.clip(jnp.min(jj[g]) - 1, 0, n_j - bj))
            for g in range(R):
                pltpu.make_async_copy(
                    tab_hbm.at[:, pl.ds(k0s[g], bk), pl.ds(j0s[g], bj), :],
                    scratch.at[g], sem.at[g]).start()
            for g in range(R):
                pltpu.make_async_copy(
                    tab_hbm.at[:, pl.ds(k0s[g], bk), pl.ds(j0s[g], bj), :],
                    scratch.at[g], sem.at[g]).wait()
            k0v = jnp.concatenate(
                [jnp.full((1, LANES), k0s[g], jnp.int32) for g in range(R)])
            j0v = jnp.concatenate(
                [jnp.full((1, LANES), j0s[g], jnp.int32) for g in range(R)])
            rel_k = jnp.clip(kk - k0v, 0, bk - 2)
            rel_j = jnp.clip(jj - j0v, 0, bj - 2)

            def step(n, acc2):
                i_m = jnp.clip(ii + n, 0, n_i - 2)
                tot = acc2
                for v in range(nvar):
                    g_lo = {}
                    g_hi = {}
                    for tk in range(bk):
                        for tj in range(bj):
                            tab = scratch[:, v, tk, tj, :]   # (8, 128)
                            g_lo[(tk, tj)] = jnp.take_along_axis(
                                tab, i_m, axis=1)
                            g_hi[(tk, tj)] = jnp.take_along_axis(
                                tab, i_m + 1, axis=1)
                    for dk in (0, 1):
                        for dj in (0, 1):
                            acc_c = jnp.zeros((R, LANES), jnp.float32)
                            acc_c2 = jnp.zeros((R, LANES), jnp.float32)
                            for tk in range(bk - 1):
                                for tj in range(bj - 1):
                                    m = ((rel_k == tk) & (rel_j == tj)) \
                                        .astype(jnp.float32)
                                    acc_c += m * g_lo[(tk + dk, tj + dj)]
                                    acc_c2 += m * g_hi[(tk + dk, tj + dj)]
                            tot = tot + acc_c + 0.5 * acc_c2
                return tot

            return jax.lax.fori_loop(0, W, step, acc)

        out_ref[:] = jax.lax.fori_loop(0, STEPS // W, window,
                                       jnp.zeros((R, LANES), jnp.float32))

    tab = jnp.asarray(np.random.rand(nvar, n_k, n_j, n_i), jnp.float32)
    kk = jnp.asarray(np.random.randint(1, n_k - bk, (R, LANES)), jnp.int32)
    jj = jnp.asarray(np.random.randint(1, n_j - bj, (R, LANES)), jnp.int32)
    ii = jnp.asarray(np.random.randint(0, n_i - W - 2, (R, LANES)),
                     jnp.int32)
    fn = jax.jit(lambda t, a, b, c: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, nvar, bk, bj, n_i), jnp.float32),
            pltpu.SemaphoreType.DMA((R,))],
        interpret=interpret,
    )(t, a, b, c))
    dt, _ = timeit(fn, tab, kk, jj, ii)
    per_step_us = dt / STEPS * 1e6
    return {"probe": f"group_window bk={bk} bj={bj}",
            "us_per_step_per_1024rays": round(per_step_us, 3)}


def probe_scalar_col_read(n_vals, interpret=False):
    """Compare-count locate against an (n,1) COLUMN of faces via dynamic
    sublane scalar reads face_ref[off + t, 0] (the form the simulation
    kernel's locate uses)."""

    def kernel(x_ref, faces_ref, off_ref, out_ref):
        def body(n, acc):
            x = x_ref[:] + 0.001 * n
            off = off_ref[0] + n % 2
            idx = jnp.zeros((R, LANES), jnp.int32)
            for t in range(n_vals):
                idx += (faces_ref[off + t, 0] < x).astype(jnp.int32)
            return acc + idx.astype(jnp.float32)

        out_ref[:] = jax.lax.fori_loop(0, STEPS, body,
                                       jnp.zeros((R, LANES), jnp.float32))

    x = jnp.asarray(np.random.rand(R, LANES), jnp.float32)
    faces = jnp.asarray(np.sort(np.random.rand(n_vals + 8, 1), axis=0),
                        jnp.float32)
    off = jnp.zeros((1,), jnp.int32)
    fn = jax.jit(lambda a, f, o: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, f, o))
    dt, _ = timeit(fn, x, faces, off)
    per_step_us = dt / STEPS * 1e6
    return {"probe": f"scalar_col_read n={n_vals}",
            "us_per_step_per_1024rays": round(per_step_us, 3)}


def probe_relayout(n_round_trips, interpret=False):
    """(R,128) -> (R*128, 1) -> (R,128) reshape round trips."""

    def kernel(x_ref, out_ref):
        def body(n, acc):
            v = acc + 1.0
            for _ in range(n_round_trips):
                col = v.reshape(R * LANES, 1)
                v = (col + 1.0).reshape(R, LANES)
            return v

        out_ref[:] = jax.lax.fori_loop(0, STEPS, body, x_ref[:])

    x = jnp.asarray(np.random.rand(R, LANES), jnp.float32)
    fn = jax.jit(lambda a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x))
    dt, _ = timeit(fn, x)
    per_step_us = dt / STEPS * 1e6
    return {"probe": f"relayout x{n_round_trips}",
            "us_per_step_per_1024rays": round(per_step_us, 3)}


def probe_compare_count(n_vals, interpret=False):
    """Compare-count locate against an n_vals face array via fori_loop of
    scalar broadcasts (faces in SMEM-ish VMEM row)."""

    def kernel(x_ref, faces_ref, out_ref):
        def body(n, acc):
            x = x_ref[:] + 0.001 * n

            def inner(m, idx):
                return idx + (faces_ref[0, m] < x).astype(jnp.int32)

            idx = jax.lax.fori_loop(
                0, n_vals, inner, jnp.zeros((R, LANES), jnp.int32))
            return acc + idx.astype(jnp.float32)

        out_ref[:] = jax.lax.fori_loop(0, STEPS, body,
                                       jnp.zeros((R, LANES), jnp.float32))

    x = jnp.asarray(np.random.rand(R, LANES), jnp.float32)
    faces = jnp.asarray(np.sort(np.random.rand(1, n_vals)), jnp.float32)
    fn = jax.jit(lambda a, f: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, faces))
    dt, _ = timeit(fn, x, faces)
    per_step_us = dt / STEPS * 1e6
    return {"probe": f"compare_count n={n_vals}",
            "us_per_step_per_1024rays": round(per_step_us, 3)}


def probe_broadcast_compare(n_vals, interpret=False):
    """Vectorized compare-count: broadcast (R*128,1) against (1,n) row."""

    def kernel(x_ref, faces_ref, out_ref):
        def body(n, acc):
            x = (x_ref[:] + 0.001 * n).reshape(R * LANES, 1)
            cmp = (faces_ref[0:1, :] < x).astype(jnp.float32)
            idx = jnp.sum(cmp, axis=1)
            return acc + idx.reshape(R, LANES)

        out_ref[:] = jax.lax.fori_loop(0, STEPS, body,
                                       jnp.zeros((R, LANES), jnp.float32))

    x = jnp.asarray(np.random.rand(R, LANES), jnp.float32)
    faces = jnp.asarray(np.sort(np.random.rand(1, n_vals)), jnp.float32)
    fn = jax.jit(lambda a, f: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, faces))
    dt, _ = timeit(fn, x, faces)
    per_step_us = dt / STEPS * 1e6
    return {"probe": f"broadcast_compare n={n_vals}",
            "us_per_step_per_1024rays": round(per_step_us, 3)}


def probe_vmem_ceiling(interpret=False):
    """Largest VMEM scratch that compiles + runs."""
    ok = 0
    for mb in (8, 16, 32, 64, 96, 120):
        n = mb * 1024 * 1024 // 4 // LANES

        def kernel(x_ref, out_ref, scratch):
            scratch[0, :] = x_ref[0, :]
            out_ref[:] = x_ref[:] + scratch[0, 0]

        try:
            fn = jax.jit(lambda a: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((n, LANES), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024),
                interpret=interpret,
            )(a))
            x = jnp.ones((R, LANES), jnp.float32)
            jax.block_until_ready(fn(x))
            ok = mb
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": f"vmem {mb}MB", "error": str(e)[:200]}))
            break
    return {"probe": "vmem_ceiling", "mb": ok}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    interpret = False
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        interpret = True

    probes = []
    if args.only in (None, "vmem"):
        probes.append(functools.partial(probe_vmem_ceiling, interpret))
    if args.only in (None, "matmul"):
        for cap in (256, 512, 1024):
            probes.append(functools.partial(
                probe_onehot_matmul, cap, 48, interpret))
    if args.only in (None, "gather"):
        for ng in (8, 48):
            probes.append(functools.partial(
                probe_dynamic_gather, 512, ng, interpret))
    if args.only in (None, "lane"):
        for ng in (8, 64):
            probes.append(functools.partial(
                probe_lane_gather, ng, interpret))
    if args.only in (None, "brickdma"):
        probes.append(functools.partial(
            probe_brick_reshape, 4, 4, 8, 8, interpret))
    if args.only in (None, "layout"):
        for form in ("dma", "reshape", "transpose", "minor"):
            probes.append(functools.partial(probe_layout, form, interpret))
    if args.only in (None, "groupwin"):
        probes.append(functools.partial(probe_group_window, 4, 4, 8,
                                        interpret))
        probes.append(functools.partial(probe_group_window, 6, 6, 8,
                                        interpret))
    if args.only in (None, "scalarcol"):
        probes.append(functools.partial(probe_scalar_col_read, 17,
                                        interpret))
        probes.append(functools.partial(probe_scalar_col_read, 129,
                                        interpret))
    if args.only in (None, "relayout"):
        probes.append(functools.partial(probe_relayout, 1, interpret))
        probes.append(functools.partial(probe_relayout, 8, interpret))
    if args.only in (None, "locate"):
        probes.append(functools.partial(probe_compare_count, 17, interpret))
        probes.append(functools.partial(probe_compare_count, 129, interpret))
        probes.append(functools.partial(
            probe_broadcast_compare, 17, interpret))
        probes.append(functools.partial(
            probe_broadcast_compare, 129, interpret))

    for p in probes:
        try:
            print(json.dumps(p()))
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if len(msg) > 1200:
                msg = msg[:200] + " ... " + msg[-1000:]
            print(json.dumps({"probe": repr(p), "error": msg}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()

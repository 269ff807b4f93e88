"""Per-sample host transcription of the reference's interblock sampling.

Direct scalar-loop re-derivation of CalculateSimulationSampling's
interblock branch (simulation_sampling.cpp:505-552), FindNearbyInds
(:1068-1321), and InterpolateAdvanced (:1365-1386), used as an
independent cross-check of the table-driven device sampler
(grid/sampling.py + grid/amr.py) in tests/test_amr.py.
"""
import numpy as np


def cdiv2(x):
    return int(x / 2) if x >= 0 else -((-x) // 2)


def find_nearby(levels, locs, n_i, n_j, n_k, n3lev, periodic, b, k, j, i,
                k_c, j_c, i_c, x3, x2, x1, x1v_b, x2v_b, x3v_b):
    n_b = len(levels)
    level = levels[b]
    li, lj, lk = locs[b]
    upper_i = i > n_i // 2
    upper_j = j > n_j // 2
    upper_k = k > n_k // 2
    i_safe = max(min(i, n_i - 1), 0)
    j_safe = max(min(j, n_j - 1), 0)
    k_safe = max(min(k, n_k - 1), 0)
    if i == i_safe and j == j_safe and k == k_safe:
        return (b, k, j, i)

    x1_off = True
    x2_off = True
    x3_off = True
    for ba in range(n_b):
        la = levels[ba]
        ia, ja, ka = locs[ba]
        if x1_off and i != i_safe:
            same = la == level and ia == (li - 1 if i == -1 else li + 1) \
                and ja == lj and ka == lk
            coarse = la == level - 1 \
                and ia == (cdiv2(li - 1) if i == -1 else cdiv2(li + 1)) \
                and ja == cdiv2(lj) and ka == cdiv2(lk)
            fine = la == level + 1 \
                and ia == (li * 2 - 1 if i == -1 else li * 2 + 2) \
                and ja == (lj * 2 + 1 if upper_j else lj * 2) \
                and ka == (lk * 2 + 1 if upper_k else lk * 2)
            if same or coarse or fine:
                x1_off = False
        if x2_off and j != j_safe:
            same = la == level and ia == li \
                and ja == (lj - 1 if j == -1 else lj + 1) and ka == lk
            coarse = la == level - 1 and ia == cdiv2(li) \
                and ja == (cdiv2(lj - 1) if j == -1 else cdiv2(lj + 1)) \
                and ka == cdiv2(lk)
            fine = la == level + 1 \
                and ia == (li * 2 + 1 if upper_i else li * 2) \
                and ja == (lj * 2 - 1 if j == -1 else lj * 2 + 2) \
                and ka == (lk * 2 + 1 if upper_k else lk * 2)
            if same or coarse or fine:
                x2_off = False
        if x3_off and k != k_safe:
            same = la == level and ia == li and ja == lj \
                and ka == (lk - 1 if k == -1 else lk + 1)
            coarse = la == level - 1 and ia == cdiv2(li) and ja == cdiv2(lj) \
                and ka == (cdiv2(lk - 1) if k == -1 else cdiv2(lk + 1))
            fine = la == level + 1 \
                and ia == (li * 2 + 1 if upper_i else li * 2) \
                and ja == (lj * 2 + 1 if upper_j else lj * 2) \
                and ka == (lk * 2 - 1 if k == -1 else lk * 2 + 2)
            if same or coarse or fine:
                x3_off = False
        if x3_off and periodic and k == -1 and lk == 0:
            same = la == level and ia == li and ja == lj \
                and ka == n3lev[la] - 1
            coarse = la == level - 1 and ia == cdiv2(li) and ja == cdiv2(lj) \
                and ka == n3lev[la] - 1
            fine = la == level + 1 \
                and ia == (li * 2 + 1 if upper_i else li * 2) \
                and ja == (lj * 2 + 1 if upper_j else lj * 2) \
                and ka == n3lev[la] - 1
            if same or coarse or fine:
                x3_off = False
        if x3_off and periodic and k == n_k and lk == n3lev[level] - 1:
            same = la == level and ia == li and ja == lj and ka == 0
            coarse = la == level - 1 and ia == cdiv2(li) and ja == cdiv2(lj) \
                and ka == 0
            fine = la == level + 1 \
                and ia == (li * 2 + 1 if upper_i else li * 2) \
                and ja == (lj * 2 + 1 if upper_j else lj * 2) and ka == 0
            if same or coarse or fine:
                x3_off = False
    if i == i_safe:
        x1_off = False
    if j == j_safe:
        x2_off = False
    if k == k_safe:
        x3_off = False
    if x1_off:
        i = i_safe
    if x2_off:
        j = j_safe
    if x3_off:
        k = k_safe

    # same level
    lvl = level
    lis = li if i == i_safe else li - 1 if i == -1 else li + 1
    ljs = lj if j == j_safe else lj - 1 if j == -1 else lj + 1
    lks = lk if k == k_safe else lk - 1 if k == -1 else lk + 1
    if periodic and k == -1 and lk == 0:
        lks = n3lev[lvl] - 1
    if periodic and k == n_k and lk == n3lev[level] - 1:
        lks = 0
    i_s = i if i == i_safe else n_i - 1 if i == -1 else 0
    j_s = j if j == j_safe else n_j - 1 if j == -1 else 0
    k_s = k if k == k_safe else n_k - 1 if k == -1 else 0
    for ba in range(n_b):
        if levels[ba] == lvl and tuple(locs[ba]) == (lis, ljs, lks):
            return (ba, k_s, j_s, i_s)

    # coarser
    lvl = level - 1
    if lvl >= 0:
        lis = cdiv2(li) if i == i_safe else cdiv2(li - 1) if i == -1 \
            else cdiv2(li + 1)
        ljs = cdiv2(lj) if j == j_safe else cdiv2(lj - 1) if j == -1 \
            else cdiv2(lj + 1)
        lks = cdiv2(lk) if k == k_safe else cdiv2(lk - 1) if k == -1 \
            else cdiv2(lk + 1)
        if periodic and k == -1 and lk == 0:
            lks = n3lev[lvl] - 1
        if periodic and k == n_k and lk == n3lev[level] - 1:
            lks = 0
        i_s = (li % 2 * n_i + i) // 2 if i == i_safe else n_i - 1 \
            if i == -1 else 0
        j_s = (lj % 2 * n_j + j) // 2 if j == j_safe else n_j - 1 \
            if j == -1 else 0
        k_s = (lk % 2 * n_k + k) // 2 if k == k_safe else n_k - 1 \
            if k == -1 else 0
        for ba in range(n_b):
            if levels[ba] == lvl and tuple(locs[ba]) == (lis, ljs, lks):
                return (ba, k_s, j_s, i_s)

    # finer
    lvl = level + 1
    max_level = max(levels)
    lis = li * 2 + (0 if i == i_safe else -1 if i == -1 else 1) \
        + (1 if upper_i else 0)
    ljs = lj * 2 + (0 if j == j_safe else -1 if j == -1 else 1) \
        + (1 if upper_j else 0)
    lks = lk * 2 + (0 if k == k_safe else -1 if k == -1 else 1) \
        + (1 if upper_k else 0)
    if periodic and k == -1 and lk == 0 and lvl <= max_level:
        lks = n3lev[lvl] - 1
    if periodic and k == n_k and lk == n3lev[level] - 1:
        lks = 0
    i_s = ((i - n_i // 2) * 2 if upper_i else i * 2) if i == i_safe \
        else n_i - 2 if i == -1 else 0
    j_s = ((j - n_j // 2) * 2 if upper_j else j * 2) if j == j_safe \
        else n_j - 2 if j == -1 else 0
    k_s = ((k - n_k // 2) * 2 if upper_k else k * 2) if k == k_safe \
        else n_k - 2 if k == -1 else 0
    for ba in range(n_b):
        if levels[ba] == lvl and tuple(locs[ba]) == (lis, ljs, lks):
            k_s += 1 if (k < k_c or (k == k_c and x3 > x3v_b[k_c])) else 0
            j_s += 1 if (j < j_c or (j == j_c and x2 > x2v_b[j_c])) else 0
            i_s += 1 if (i < i_c or (i == i_c and x1 > x1v_b[i_c])) else 0
            return (ba, k_s, j_s, i_s)
    raise RuntimeError("Grid interpolation failed.")


def sample_point(grid_np, x1, x2, x3, periodic, n3_root):
    """Returns (vals (nvar,), info) the reference interblock way, or None
    if off grid. grid_np: dict with x1f..x3v (nb, n) float64, prim
    (nvar, nb, nk, nj, ni), levels, locs."""
    x1f, x2f, x3f = grid_np["x1f"], grid_np["x2f"], grid_np["x3f"]
    x1v, x2v, x3v = grid_np["x1v"], grid_np["x2v"], grid_np["x3v"]
    prim = grid_np["prim"]
    levels, locs = grid_np["levels"], grid_np["locs"]
    nvar, n_b, n_k, n_j, n_i = prim.shape
    b = -1
    for bb in range(n_b):
        if (x1f[bb, 0] <= x1 <= x1f[bb, -1]
                and x2f[bb, 0] <= x2 <= x2f[bb, -1]
                and x3f[bb, 0] <= x3 <= x3f[bb, -1]):
            b = bb
            break
    if b < 0:
        return None
    for i in range(n_i):
        if x1f[b, i + 1] >= x1:
            break
    for j in range(n_j):
        if x2f[b, j + 1] >= x2:
            break
    for k in range(n_k):
        if x3f[b, k + 1] >= x3:
            break
    i_m = i if x1 >= x1v[b, i] else i - 1
    j_m = j if x2 >= x2v[b, j] else j - 1
    k_m = k if x3 >= x3v[b, k] else k - 1
    i_p, j_p, k_p = i_m + 1, j_m + 1, k_m + 1
    x1v_flat = x1v.reshape(-1)
    x2v_flat = x2v.reshape(-1)
    x3v_flat = x3v.reshape(-1)

    def nxt(flat, xf, xv, bb, idx, n):
        fi = bb * n + idx
        if fi < flat.size:
            return flat[fi]
        return 2.0 * xf[bb, -1] - xv[bb, -1]  # mirror (final block)

    x1_m = 2.0 * x1f[b, i] - x1v[b, i] if i_m == -1 else x1v[b, i_m]
    x2_m = 2.0 * x2f[b, j] - x2v[b, j] if j_m == -1 else x2v[b, j_m]
    x3_m = 2.0 * x3f[b, k] - x3v[b, k] if k_m == -1 else x3v[b, k_m]
    x1_p = 2.0 * nxt(x1v_flat, x1f, x1v, b, i + 1, n_i) - x1v[b, i] if i_p == n_i \
        else x1v[b, i_p]
    x2_p = 2.0 * nxt(x2v_flat, x2f, x2v, b, j + 1, n_j) - x2v[b, j] if j_p == n_j \
        else x2v[b, j_p]
    x3_p = 2.0 * nxt(x3v_flat, x3f, x3v, b, k + 1, n_k) - x3v[b, k] if k_p == n_k \
        else x3v[b, k_p]
    f_i = (x1 - x1_m) / (x1_p - x1_m)
    f_j = (x2 - x2_m) / (x2_p - x2_m)
    f_k = (x3 - x3_m) / (x3_p - x3_m)

    max_level = max(levels)
    n3lev = [max(n3_root // n_k, 1) << lv for lv in range(max_level + 1)]
    corners = []
    for kk in (k_m, k_p):
        for jj in (j_m, j_p):
            for ii in (i_m, i_p):
                corners.append(find_nearby(
                    levels, locs, n_i, n_j, n_k, n3lev, periodic, b,
                    kk, jj, ii, k, j, i, x3, x2, x1, x1v[b], x2v[b], x3v[b]))
    # order: reference fills [k_m,j_m,i_m],[k_m,j_m,i_p],[k_m,j_p,i_m],...
    vals = np.zeros(nvar)
    w = [(1 - f_k) * (1 - f_j) * (1 - f_i), (1 - f_k) * (1 - f_j) * f_i,
         (1 - f_k) * f_j * (1 - f_i), (1 - f_k) * f_j * f_i,
         f_k * (1 - f_j) * (1 - f_i), f_k * (1 - f_j) * f_i,
         f_k * f_j * (1 - f_i), f_k * f_j * f_i]
    # Reference Array reads are raw strided pointer arithmetic; corner
    # indices can legally step one past a row (fine-level i*2 == n_i) and
    # land in the next row of the SAME contiguous allocation. Replicate by
    # flattening each variable plane.
    prim_flat = prim.reshape(nvar, -1)
    for v in range(nvar):
        tot = 0.0
        for p8, (ba, kk, jj, ii) in enumerate(corners):
            fi = ((ba * n_k + kk) * n_j + jj) * n_i + ii
            tot += w[p8] * float(np.float32(prim_flat[v, min(fi, prim_flat.shape[1]-1)]))
        vals[v] = tot
    return vals, dict(b=b, i=i, j=j, k=k, i_m=i_m, j_m=j_m, k_m=k_m,
                      f_i=f_i, f_j=f_j, f_k=f_k, corners=corners)

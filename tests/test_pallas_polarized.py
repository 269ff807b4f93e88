"""Polarized Pallas kernel: unit parity of the in-kernel physics ports
(CPU, no Pallas) plus a tiny interpret-mode structural run.

The full-size interpret-mode image parity used for the unpolarized kernel
(tests/test_pallas_simulation.py) is impractical here - the polarized
window body is ~10x larger and CPU XLA chokes on the discharged graph -
so correctness splits into
  * these unit tests: each in-kernel float32 port (Mosaic-safe
    transcendentals in the coupling, thermal polarized coefficients,
    pitch angle) against its XLA counterpart on randomized physical
    states, and
  * the on-chip A/B gate: scripts/bench_polarized.py --kernel compares
    the compiled kernel against the exact XLA path on the real TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blacklight_tpu.constants import Physics
from blacklight_tpu.models import synchrotron
from blacklight_tpu.models.synchrotron import PlasmaParams
from blacklight_tpu.ops import pallas_polarized as ppol
from blacklight_tpu.transfer import polarized_coupling as pc


def _rng(seed):
    return np.random.default_rng(seed)


def test_mosaic_trig_shims():
    """_sin_c/_cos_c (range-reduced Cephes polynomials), _sinh_c/_cosh_c
    (exp forms) and _log1p_c match numpy within float32 tolerance over the
    argument ranges the coupling produces."""
    x = np.concatenate([
        np.linspace(-40.0, 40.0, 20001),
        np.geomspace(1e-8, 1e-1, 1000),
        -np.geomspace(1e-8, 1e-1, 1000)]).astype(np.float32)
    xf = jnp.asarray(x)
    np.testing.assert_allclose(np.asarray(ppol._sin_c(xf)), np.sin(x),
                               atol=4e-7)
    np.testing.assert_allclose(np.asarray(ppol._cos_c(xf)), np.cos(x),
                               atol=4e-7)
    y = x[np.abs(x) <= 20.0]
    yf = jnp.asarray(y)
    np.testing.assert_allclose(np.asarray(ppol._sinh_c(yf)), np.sinh(y),
                               rtol=3e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ppol._cosh_c(yf)), np.cosh(y),
                               rtol=3e-6)
    z = np.geomspace(1e-9, 10.0, 5000).astype(np.float32)
    np.testing.assert_allclose(np.asarray(ppol._log1p_c(jnp.asarray(z))),
                               np.log1p(z.astype(np.float64)), rtol=1e-5,
                               atol=1e-9)


def test_coupling_pallas_prims_match_jnp():
    """couple_matter_c with the Mosaic-safe primitive set agrees with the
    jnp default set across the coupling's branch structure (free /
    simple / absorption / matrix, thin / thick, with and without
    rotation)."""
    r = _rng(7)
    n = 4096
    f32 = np.float32

    def mk(lo, hi, signed=False):
        v = np.exp(r.uniform(np.log(lo), np.log(hi), n)).astype(f32)
        if signed:
            v *= r.choice([-1.0, 1.0], n).astype(f32)
        return v

    s0 = mk(1e-8, 1e2)
    pol = r.uniform(0.0, 0.999, n).astype(f32)
    ang1 = r.uniform(0, 2 * np.pi, n)
    ang2 = r.uniform(-1, 1, n)
    s1 = (s0 * pol * np.sqrt(1 - ang2**2) * np.cos(ang1)).astype(f32)
    s2 = (s0 * pol * np.sqrt(1 - ang2**2) * np.sin(ang1)).astype(f32)
    s3 = (s0 * pol * ang2).astype(f32)
    j0 = mk(1e-10, 1e2)
    j1 = (j0 * r.uniform(-0.7, 0.7, n)).astype(f32)
    j3 = (j0 * r.uniform(-0.7, 0.7, n)).astype(f32)
    a_i = mk(1e-10, 1e3)
    a1 = (a_i * r.uniform(-0.7, 0.7, n)).astype(f32)
    a3 = (a_i * r.uniform(-0.7, 0.7, n)).astype(f32)
    rho1 = mk(1e-10, 1e3, signed=True)
    rho3 = mk(1e-10, 1e3, signed=True)
    dl = mk(1e-6, 1e0)
    # Exercise the zero branches too
    for arr in (a_i, a1, a3):
        arr[r.integers(0, n, n // 8)] = 0.0
    zi = r.integers(0, n, n // 8)
    rho1[zi] = 0.0
    rho3[zi] = 0.0

    vals = (s0, s1, s2, s3, j0, j1, j3, a_i, a1, a3, rho1, rho3, dl)
    args = [jnp.asarray(v) for v in vals]
    args64 = [jnp.asarray(np.asarray(v, np.float64)) for v in vals]
    for split in (False, True):
        # The float64 run is ground truth: near-cancelling float32
        # couplings (tau ~ 1e-3 thin steps) amplify 1-ulp differences
        # between jnp and shim transcendentals to ~1e-2 pairwise, but
        # BOTH stay equally close to the float64 value - so gate each
        # float32 variant against truth, not against each other.
        truth = pc.couple_matter_c(*args64, split)
        ref = pc.couple_matter_c(*args, split)
        got = pc.couple_matter_c(*args, split, pm=ppol._PALLAS_PM)
        scale = np.abs(np.asarray(truth[0])) + 1e-12
        for c in range(4):
            err_ref = np.abs(np.asarray(ref[c]) - np.asarray(truth[c])) \
                / scale
            err_got = np.abs(np.asarray(got[c]) - np.asarray(truth[c])) \
                / scale
            m_ref, m_got = np.nanmean(err_ref), np.nanmean(err_got)
            assert m_got < 3.0 * m_ref + 1e-6, \
                f"split={split} comp {c}: mean {m_got} vs jnp {m_ref}"
            x_ref, x_got = np.nanmax(err_ref), np.nanmax(err_got)
            assert x_got < 3.0 * x_ref + 1e-4, \
                f"split={split} comp {c}: max {x_got} vs jnp {x_ref}"


def _plasma():
    return PlasmaParams(model=None, mu=0.5, ne_ni=1.0, use_p=True,
                        gamma=13.0 / 9.0, gamma_i=5.0 / 3.0,
                        gamma_e=4.0 / 3.0, rat_low=1.0, rat_high=10.0,
                        power_frac=0.0, kappa_frac=0.0)


def test_thermal_polarized_coefficients_port():
    """_thermal_polarized_c (in-kernel float32 port with exp-log powers,
    polynomial cos, u^20 tanh form) matches
    models/synchrotron.thermal_coefficients on randomized fluid states."""
    from blacklight_tpu.ops.pallas_simulation import (SimKernelParams,
                                                      sim_kernel_params)

    r = _rng(11)
    n = 2048
    f32 = np.float32
    theta_e = np.exp(r.uniform(np.log(1e-3), np.log(1e2), n)).astype(f32)
    n_e = np.exp(r.uniform(np.log(1e2), np.log(1e8), n)).astype(f32)
    bb = np.exp(r.uniform(np.log(1e-3), np.log(1e3), n)).astype(f32)
    kb_tt_e = (theta_e * Physics.m_e * Physics.c ** 2).astype(f32)
    sin2 = r.uniform(1e-6, 1.0, n).astype(f32)
    sin_b = np.sqrt(sin2).astype(f32)
    cos_b = (np.sqrt(1.0 - sin2)
             * r.choice([-1.0, 1.0], n)).astype(f32)
    nu = np.exp(r.uniform(np.log(1e9), np.log(1e13), n)).astype(f32)
    nu0 = 2.3e11

    plasma = _plasma()
    state = {"theta_e": jnp.asarray(theta_e),
             "kb_tt_e_cgs": jnp.asarray(kb_tt_e),
             "n_e_cgs": jnp.asarray(n_e),
             "bb_cgs": jnp.asarray(bb)}
    ref = synchrotron.thermal_coefficients(
        jnp.asarray(nu)[:, None], nu0, state, jnp.asarray(sin_b),
        jnp.asarray(cos_b), jnp.asarray(sin2), plasma, polarized=True)

    sp = SimKernelParams(
        mu=plasma.mu, ne_ni=plasma.ne_ni, use_p=plasma.use_p,
        gamma=plasma.gamma, gamma_i=plasma.gamma_i, gamma_e=plasma.gamma_e,
        rat_low=plasma.rat_low, rat_high=plasma.rat_high,
        thermal_frac=1.0, rho_unit=1.0e-16)
    st = {"theta_e": jnp.asarray(theta_e),
          "kb_tt_e": jnp.asarray(kb_tt_e),
          "n_e": jnp.asarray(n_e),
          "bb_cgs": jnp.asarray(bb)}
    got = ppol._thermal_polarized_c(
        jnp.asarray(nu), nu0, st, jnp.asarray(sin_b), jnp.asarray(cos_b),
        jnp.asarray(sin2), sp)
    names = ["j_i", "j_q", "j_v", "alpha_i", "alpha_q", "alpha_v",
             "rho_q", "rho_v"]
    for i, nm in enumerate(names):
        ours = np.asarray(got[i], np.float64)
        theirs = np.asarray(ref[nm][:, 0], np.float64)
        scale = np.abs(theirs) + np.nanmax(np.abs(theirs)) * 1e-10
        rel = np.abs(ours - theirs) / scale
        # float32 exp-log powers and the polynomial cos cost ~1e-5
        # relative; rho_v's Bessel-ratio subtraction is the loosest.
        tol = 3e-4 if nm == "rho_v" else 5e-5
        assert np.nanmax(rel) < tol, f"{nm}: max rel {np.nanmax(rel)}"


def test_pitch_angle_port():
    """_pitch_angle_full_c matches models/synchrotron.pitch_angle on
    randomized states (float32 floors differ only below the cut)."""
    r = _rng(3)
    n = 1024
    f32 = np.float32
    ucon = r.normal(size=(n, 4)).astype(f32)
    ucon[:, 0] = np.abs(ucon[:, 0]) + 1.0
    bcon = r.normal(size=(n, 4)).astype(f32)
    b_sq = np.abs(r.normal(size=n)).astype(f32) + 1e-6
    kcov = r.normal(size=(n, 4)).astype(f32)
    kcov[:, 0] = -np.abs(kcov[:, 0]) - 0.1

    state = {"ucon": jnp.asarray(ucon), "bcon": jnp.asarray(bcon),
             "b_sq": jnp.asarray(b_sq)}
    ref = synchrotron.pitch_angle(None, jnp.asarray(kcov), state, 0.0)
    st = {"u": tuple(jnp.asarray(ucon[:, m]) for m in range(4)),
          "b": tuple(jnp.asarray(bcon[:, m]) for m in range(4)),
          "b_sq": jnp.asarray(b_sq)}
    got = ppol._pitch_angle_full_c(st, *(jnp.asarray(kcov[:, m])
                                         for m in range(4)))
    for i, nm in enumerate(["sin_b", "cos_b", "sin2_b", "u_dot_k"]):
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(ref[i]),
                                   rtol=2e-6, atol=2e-6, err_msg=nm)

"""Output formats, output_camera, pinhole camera, deeper adaptive levels."""

import numpy as np
import pytest

from blacklight_tpu import pipeline
from blacklight_tpu.utils.config import parse_config
from blacklight_tpu.utils.errors import BlacklightError

from test_adaptive import CONFIG, make_cfg


def test_npy_output(tmp_path):
    cfg = make_cfg(tmp_path, res=8, max_level=0)
    cfg.output_file = str(tmp_path / "out.npy")
    from blacklight_tpu.constants import OutputFormat
    cfg.output_format = OutputFormat.npy
    arrays = pipeline.run(cfg, quiet=True)
    packed = np.load(tmp_path / "out.npy")
    assert packed.shape == (1, 8, 8)
    np.testing.assert_array_equal(packed[0], arrays["I_nu"])


def test_raw_output(tmp_path):
    cfg = make_cfg(tmp_path, res=8, max_level=0)
    cfg.output_file = str(tmp_path / "out.raw")
    from blacklight_tpu.constants import OutputFormat
    cfg.output_format = OutputFormat.raw
    arrays = pipeline.run(cfg, quiet=True)
    raw = np.fromfile(tmp_path / "out.raw", dtype=np.float64)
    np.testing.assert_array_equal(raw.reshape(8, 8), arrays["I_nu"])


def test_raw_rejects_adaptive(tmp_path):
    cfg = make_cfg(tmp_path, res=16, max_level=1)
    from blacklight_tpu.constants import OutputFormat
    cfg.output_format = OutputFormat.raw
    with pytest.raises(BlacklightError):
        pipeline.run(cfg, quiet=True)


def test_output_camera_positions(tmp_path):
    cfg = make_cfg(tmp_path, res=8, max_level=0)
    cfg.output_camera = True
    arrays = pipeline.run(cfg, quiet=True)
    assert arrays["positions"].shape == (8, 8, 4)
    # Pixel events sit near the camera plane (|x| ~ camera_r)
    r = np.linalg.norm(arrays["positions"][..., 1:], axis=-1)
    assert np.all(np.abs(r - 100.0) < 20.0)


def test_pinhole_camera_renders(tmp_path):
    cfg = make_cfg(tmp_path, res=8, max_level=0)
    from blacklight_tpu.constants import CameraType
    cfg.camera_type = CameraType.pinhole
    cfg.output_camera = True
    arrays = pipeline.run(cfg, quiet=True)
    I = arrays["I_nu"]
    assert np.isfinite(I).all() and np.nanmax(I) > 0.0
    # Pinhole saves directions; all rays originate at one point
    assert arrays["directions"].shape == (8, 8, 4)


def test_adaptive_two_levels(tmp_path):
    """max_level=2: level-2 blocks are children of refined level-1 blocks
    and match a direct 4x-resolution render."""
    cfg = make_cfg(tmp_path, res=16, max_level=2)
    arrays = pipeline.run(cfg, quiet=True)
    assert arrays["adaptive_num_levels"][0] == 2
    locs2 = arrays["adaptive_block_locs_2"]
    locs1 = {tuple(v) for v in arrays["adaptive_block_locs_1"]}
    parents = {(v // 2, u // 2) for v, u in locs2}
    assert parents <= locs1

    cfg64 = make_cfg(tmp_path, res=64, max_level=0)
    full = pipeline.run(cfg64, quiet=True)["I_nu"]
    I2 = arrays["adaptive_I_nu_2"]
    for b in range(min(4, locs2.shape[0])):
        v, u = locs2[b]
        np.testing.assert_allclose(
            I2[b], full[v * 8:(v + 1) * 8, u * 8:(u + 1) * 8], rtol=1e-10)


def test_compilation_cache_host_keyed(tmp_path, monkeypatch):
    """The persistent compile cache is keyed by a per-host CPU fingerprint
    so XLA:CPU AOT entries from one machine are never loaded on another
    (machine-feature mismatch -> SIGILL risk)."""
    from blacklight_tpu.utils import cache

    monkeypatch.setenv("BLACKLIGHT_TPU_CACHE_DIR", str(tmp_path / "xla"))
    used = cache.enable_compilation_cache()
    assert used.startswith(str(tmp_path / "xla"))
    fp = cache._host_fingerprint()
    assert used == str(tmp_path / "xla" / fp)
    assert len(fp) == 12 and fp == cache._host_fingerprint()  # stable
    import os
    assert os.path.isdir(used)
    import jax
    assert jax.config.jax_compilation_cache_dir == used

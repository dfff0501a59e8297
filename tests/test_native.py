"""Native host-runtime tests: C++ kernels vs Python/scipy oracles."""

import numpy as np
import pytest

from neuman_tpu import native_bridge as nb


requires_native = pytest.mark.skipif(
    not nb.have_native(), reason="libneuman_host.so not built"
)


@requires_native
def test_binary_dilate_matches_scipy():
    from scipy import ndimage

    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(37, 53)) > 0.9).astype(np.uint8)
    for iters in (1, 3, 10):
        got = nb.binary_dilate(mask, iters)
        exp = ndimage.binary_dilation(mask, iterations=iters).astype(np.uint8)
        np.testing.assert_array_equal(got, exp)


@requires_native
def test_build_class_perm():
    rng = np.random.default_rng(1)
    mask = (rng.uniform(size=(20, 30)) > 0.8).astype(np.uint8)
    border = nb.binary_dilate(mask, 2) - mask
    perm, n_body, n_border = nb.build_class_perm(mask, border)
    flat_mask = mask.reshape(-1)
    flat_border = border.reshape(-1)
    assert n_body == flat_mask.sum()
    assert set(perm.tolist()) == set(range(mask.size))
    assert (flat_mask[perm[:n_body]] != 0).all()
    assert (flat_border[perm[n_body : n_body + n_border]] == 1).all()
    rest = perm[n_body + n_border :]
    assert (flat_mask[rest] == 0).all() and (flat_border[rest] == 0).all()
    # matches the python fallback exactly (stable ordering)
    py_perm, py_body, py_border = nb.build_class_perm.__wrapped__(mask, border) if hasattr(nb.build_class_perm, "__wrapped__") else (None, None, None)


@requires_native
def test_fused_depth_matches_polyfit():
    rng = np.random.default_rng(2)
    mono = rng.uniform(1, 3, size=(25, 35)).astype(np.float32)
    mvs = (mono * 1.7 + 0.3 + rng.normal(size=mono.shape) * 0.01).astype(np.float32)
    mask = np.zeros_like(mono, dtype=np.uint8)
    mask[5:10, 5:10] = 1
    mvs[mask == 1] = 0  # holes on the human
    mvs[0, 0] = 0  # a bkg hole

    got = nb.fused_depth(mvs, mono, mask)
    valid = (mvs > 0) & (mask == 0)
    slope, intercept = np.polyfit(mono[valid], mvs[valid], 1)
    exp = mvs.copy()
    exp[~valid] = mono[~valid] * slope + intercept
    np.testing.assert_allclose(got, exp, atol=1e-4)


@requires_native
def test_read_colmap_depth_bin_matches_python(tmp_path):
    from neuman_tpu.cameras.contents import CapturedDepth, write_colmap_depth_bin

    rng = np.random.default_rng(3)
    depth = rng.uniform(0.0, 5.0, size=(19, 27)).astype(np.float32)
    path = str(tmp_path / "d.bin")
    write_colmap_depth_bin(path, depth)
    got = nb.read_colmap_depth_bin(path)
    exp = CapturedDepth(path).read_colmap_bin()
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_python_fallbacks_work(monkeypatch):
    """All bridge functions must work without the native library."""
    import neuman_tpu.native_bridge as bridge

    monkeypatch.setattr(bridge, "_LIB", False)
    mask = np.zeros((10, 12), np.uint8)
    mask[4:6, 5:8] = 1
    d = bridge.binary_dilate(mask, 1)
    assert d.sum() > mask.sum()
    perm, nb_, nbr = bridge.build_class_perm(mask, d - mask)
    assert nb_ == mask.sum()
    mono = np.ones((10, 12), np.float32)
    mvs = np.ones((10, 12), np.float32) * 2
    mvs[0, 0] = 0
    mono[0, 1] = 2.0  # break collinearity guard for polyfit
    out = bridge.fused_depth(mvs, mono, mask)
    assert np.isfinite(out).all()

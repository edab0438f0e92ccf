"""Native host-runtime components (native/tpu3d_native.cpp via ctypes).

Skipped when the shared library hasn't been built (``make -C native``); the
Python fallbacks carry the same semantics either way.
"""

import os
import subprocess

import numpy as np
import pytest

from tpu3d import native

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_built() -> bool:
    if native.available():
        return True
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO, "native")],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        return False
    native._TRIED = False  # retry load after build
    return native.available()


pytestmark = pytest.mark.skipif(
    not _ensure_built(), reason="native toolchain unavailable"
)


def test_native_ply_matches_python_ascii(rng, tmp_path):
    from tpu3d.models.ply import save_ply

    pts = rng.normal(size=(500, 3)).astype(np.float32)
    cols = rng.uniform(size=(500, 3)).astype(np.float32)
    path = str(tmp_path / "a.ply")
    save_ply(path, pts, cols)
    out = native.load_ply(path)
    assert out is not None
    p, c = out
    np.testing.assert_allclose(p, pts, atol=1e-4)
    np.testing.assert_allclose(c, cols, atol=1.01 / 255)


def test_native_ply_binary(rng, tmp_path):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    path = str(tmp_path / "b.ply")
    with open(path, "wb") as f:
        f.write(
            b"ply\nformat binary_little_endian 1.0\n"
            b"element vertex 300\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
            b"end_header\n"
        )
        cols = (rng.uniform(size=(300, 3)) * 255).astype(np.uint8)
        for i in range(300):
            f.write(pts[i].tobytes())
            f.write(cols[i].tobytes())
    out = native.load_ply(path)
    assert out is not None
    p, c = out
    np.testing.assert_allclose(p, pts, atol=1e-6)
    np.testing.assert_allclose(c, cols / 255.0, atol=1e-6)  # >1 → /255


def test_native_mask_resize_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    m = (rng.uniform(size=(45, 67)) * 255).astype(np.uint8)
    got = native.resize_mask_nearest_threshold(m, 90, 134)
    exp = cv2.resize(m, (134, 90), interpolation=cv2.INTER_NEAREST)
    exp = np.where(exp > 10, 255, 0).astype(np.uint8)
    assert got is not None
    assert (got == exp).all()


def test_native_missing_file_returns_none():
    assert native.load_ply("/nonexistent/x.ply") is None

import numpy as np
import pytest

from tpu3d.io.robot import Robot
from tpu3d.io.segmentation import (
    get_masks,
    load_masks_from_dir,
    resize_mask_nearest,
)


def _pose(x, y, z, R=None):
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = (x, y, z)
    if R is not None:
        T[:3, :3] = R
    return T


def test_robot_move_logs_mm_and_rpy():
    r = Robot("10.0.0.1", sleep_fn=lambda s: None)
    assert r.connect()
    # 90° yaw about z.
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    assert r.move(_pose(0.1, -0.2, 0.3, Rz), speed=42)
    x, y, z, rpy, speed = r.move_log[-1]
    np.testing.assert_allclose([x, y, z], [100, -200, 300], atol=1e-3)
    np.testing.assert_allclose(rpy, [0, 0, 90], atol=1e-3)
    assert speed == 42


def test_robot_move_gimbal_lock_branch():
    """robot.cpp:46-52: |R(2,0)| >= 0.999 → yaw = 0, roll from -R12/R11."""
    r = Robot("10.0.0.1", sleep_fn=lambda s: None)
    r.connect()
    Ry90 = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    r.move(_pose(0, 0, 0, Ry90))
    _, _, _, rpy, _ = r.move_log[-1]
    assert abs(rpy[1] - 90) < 1e-2  # pitch 90°
    assert rpy[2] == 0.0  # yaw forced to 0


def test_robot_pick_sequence():
    """robot.cpp:81-106: approach → slow descend (speed 10, −1 mm) →
    grip → retract."""
    r = Robot("10.0.0.1", sleep_fn=lambda s: None)
    r.connect()
    assert r.pick(_pose(0.1, 0.2, 0.3), approach_offset_z=-0.1)
    assert len(r.move_log) == 3
    approach, descend, retract = r.move_log
    np.testing.assert_allclose(approach[2], 300 - 100, atol=1e-3)  # z offset
    np.testing.assert_allclose(descend[2], 300 - 1, atol=1e-3)  # −1 mm
    assert descend[4] == 10  # slow approach speed
    np.testing.assert_allclose(retract[:3], approach[:3], atol=1e-6)


def test_robot_requires_connection():
    r = Robot("10.0.0.1", sleep_fn=lambda s: None)
    assert not r.move(_pose(0, 0, 0))
    assert not r.pick(_pose(0, 0, 0), -0.1)


def test_load_masks_from_dir(tmp_path):
    cv2 = pytest.importorskip("cv2")
    # Two masks + one non-image; loaded sorted, binarized at 10.
    m1 = np.zeros((10, 10), np.uint8)
    m1[2:5, 2:5] = 200
    m2 = np.full((10, 10), 9, np.uint8)  # all below threshold → all zero
    cv2.imwrite(str(tmp_path / "b_mask.png"), m2)
    cv2.imwrite(str(tmp_path / "a_mask.png"), m1)
    (tmp_path / "notes.txt").write_text("ignore me")
    masks = load_masks_from_dir(str(tmp_path))
    assert len(masks) == 2
    assert masks[0][3, 3] == 255 and masks[0][0, 0] == 0  # a_mask first
    assert masks[1].max() == 0


def test_get_masks_dispatcher_fallback(tmp_path):
    cv2 = pytest.importorskip("cv2")
    m = np.zeros((8, 8), np.uint8)
    m[1:3, 1:3] = 255
    cv2.imwrite(str(tmp_path / "m.png"), m)
    rgb = np.zeros((8, 8, 3), np.uint8)
    # Unreachable SAM server → directory fallback (segmentation.cpp:54-66).
    masks = get_masks(rgb, "http://127.0.0.1:1/sam2", "q", str(tmp_path))
    assert len(masks) == 1


def test_resize_mask_nearest_roundtrip():
    m = np.zeros((20, 30), np.uint8)
    m[5:10, 10:20] = 255
    out = resize_mask_nearest(m, 40, 60)
    assert out.shape == (40, 60)
    assert out[12, 25] == 255 and out[2, 2] == 0
    same = resize_mask_nearest(m, 20, 30)
    assert same is m  # size match → untouched (pipeline.cpp:39)

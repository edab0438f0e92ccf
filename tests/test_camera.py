"""Camera shim against a fake pyrealsense2 SDK — the path the reference
exercises only on hardware (src/camera.cpp:15-93) finally runs in CI:
connect → intrinsics-before-capture → aligned capture → disconnect."""

import sys
import types

import numpy as np
import pytest


class _Intr:
    fx, fy, ppx, ppy = 616.0, 615.5, 321.2, 239.8


class _VideoProfile:
    def get_intrinsics(self):
        return _Intr()

    # live-frame variant exposes .intrinsics as an attribute
    intrinsics = _Intr()


class _Stream:
    def as_video_stream_profile(self):
        return _VideoProfile()


class _Sensor:
    def get_depth_scale(self):
        return 0.00025  # NOT the 1 mm default — the override must be used


class _Device:
    def first_depth_sensor(self):
        return _Sensor()


class _Profile:
    def get_device(self):
        return _Device()

    def get_stream(self, s):
        return _Stream()


class _Frame:
    def __init__(self, arr):
        self._arr = arr
        self.profile = _Stream()

    def __bool__(self):
        return True

    def get_data(self):
        return self._arr


class _Frames:
    def __init__(self, w, h):
        self._w, self._h = w, h

    def get_color_frame(self):
        return _Frame(np.full((self._h, self._w, 3), 90, np.uint8))

    def get_depth_frame(self):
        return _Frame(np.full((self._h, self._w), 4000, np.uint16))


class _Pipeline:
    def __init__(self, sdk):
        self._sdk = sdk

    def start(self, cfg):
        self._sdk.started += 1
        return _Profile()

    def wait_for_frames(self):
        self._sdk.frames_waited += 1
        return _Frames(self._sdk.width, self._sdk.height)

    def stop(self):
        self._sdk.stopped += 1


class _Align:
    def __init__(self, stream):
        pass

    def process(self, frames):
        return frames


def _fake_sdk(width=320, height=240):
    sdk = types.ModuleType("pyrealsense2")
    sdk.started = 0
    sdk.stopped = 0
    sdk.frames_waited = 0
    sdk.width, sdk.height = width, height
    sdk.pipeline = lambda: _Pipeline(sdk)

    class _Cfg:
        def enable_stream(self, *a):
            pass

    sdk.config = _Cfg
    sdk.stream = types.SimpleNamespace(color="color", depth="depth")
    sdk.format = types.SimpleNamespace(bgr8="bgr8", z16="z16")
    sdk.align = _Align
    return sdk


@pytest.fixture
def fake_rs(monkeypatch):
    sdk = _fake_sdk()
    monkeypatch.setitem(sys.modules, "pyrealsense2", sdk)
    return sdk


def test_connect_serves_intrinsics_before_capture(fake_rs):
    from tpu3d.io.camera import RealSenseCamera

    cam = RealSenseCamera(320, 240)
    assert cam.connect()
    # Reference behavior: K valid right after connect (camera.cpp:84-93),
    # no capture needed.
    K = cam.get_intrinsics()
    assert K[0, 0] == np.float32(616.0)
    assert K[1, 2] == np.float32(239.8)
    # Device depth scale read at connect (camera.cpp:23-24).
    assert cam.depth_scale == 0.00025
    # AE settle burned 30 frames (camera.cpp:30).
    assert fake_rs.frames_waited == 30


def test_capture_and_disconnect(fake_rs):
    from tpu3d.io.camera import RealSenseCamera

    cam = RealSenseCamera(320, 240)
    assert cam.connect()
    out = cam.capture()
    assert out is not None
    rgb, depth = out
    assert rgb.shape == (240, 320, 3) and rgb.dtype == np.uint8
    assert depth.shape == (240, 320) and depth.dtype == np.uint16
    cam.disconnect()
    assert fake_rs.stopped == 1
    assert cam.capture() is None  # disconnected camera yields nothing


def test_connect_without_sdk_fails_cleanly(monkeypatch):
    import builtins

    real_import = builtins.__import__

    def no_rs(name, *a, **k):
        if name == "pyrealsense2":
            raise ImportError("no SDK")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_rs)
    monkeypatch.delitem(sys.modules, "pyrealsense2", raising=False)
    from tpu3d.io.camera import RealSenseCamera

    cam = RealSenseCamera()
    assert cam.connect() is False
    assert np.allclose(cam.get_intrinsics(), np.eye(3))

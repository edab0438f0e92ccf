"""RealSense camera shim (host-side I/O edge).

Mirrors the reference's ``RealSenseCamera`` (src/camera.cpp:15-93): BGR8
color + Z16 depth at the requested size @30fps, device depth scale, a
30-frame auto-exposure settle, depth aligned to color, intrinsics from the
color stream profile. Import of pyrealsense2 is gated — on machines without
the SDK the class raises at connect() just like the reference fails its
pipeline.start, and the pipeline degrades per config (use_camera=false).
"""

from __future__ import annotations

import numpy as np

try:
    import pyrealsense2 as rs  # type: ignore

    _HAS_RS = True
except Exception:
    rs = None
    _HAS_RS = False


class RealSenseCamera:
    def __init__(self, width: int = 1280, height: int = 720):
        self.width = width
        self.height = height
        self.depth_scale = 0.001
        self._pipeline = None
        self._align = None

    def connect(self) -> bool:
        if not _HAS_RS:
            print("RealSense SDK unavailable — cannot connect camera")
            return False
        try:
            self._pipeline = rs.pipeline()
            cfg = rs.config()
            cfg.enable_stream(
                rs.stream.color, self.width, self.height, rs.format.bgr8, 30
            )
            cfg.enable_stream(
                rs.stream.depth, self.width, self.height, rs.format.z16, 30
            )
            profile = self._pipeline.start(cfg)
            sensor = profile.get_device().first_depth_sensor()
            self.depth_scale = float(sensor.get_depth_scale())
            self._align = rs.align(rs.stream.color)
            for _ in range(30):  # AE settle, camera.cpp:30
                self._pipeline.wait_for_frames()
            return True
        except Exception as e:
            print(f"Camera connect failed: {e}")
            return False

    def capture(self):
        """Returns (rgb_bgr u8[H,W,3], depth u16[H,W]) or None on failure."""
        if self._pipeline is None:
            return None
        try:
            frames = self._align.process(self._pipeline.wait_for_frames())
            color = frames.get_color_frame()
            depth = frames.get_depth_frame()
            if not color or not depth:
                return None
            rgb = np.asanyarray(color.get_data()).copy()
            d = np.asanyarray(depth.get_data()).copy()
            self._intrinsics = color.profile.as_video_stream_profile().intrinsics
            return rgb, d
        except Exception as e:
            print(f"Capture failed: {e}")
            return None

    def get_intrinsics(self) -> np.ndarray:
        i = getattr(self, "_intrinsics", None)
        K = np.eye(3, dtype=np.float32)
        if i is not None:
            K[0, 0], K[1, 1] = i.fx, i.fy
            K[0, 2], K[1, 2] = i.ppx, i.ppy
        return K

    def disconnect(self):
        if self._pipeline is not None:
            try:
                self._pipeline.stop()
            finally:
                self._pipeline = None

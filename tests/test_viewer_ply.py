import json
import os

import numpy as np

from tpu3d.models.ply import load_ply, save_ply
from tpu3d.viz.viewer import SceneViewer


def test_ply_roundtrip_with_colors(rng, tmp_path):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    cols = rng.uniform(size=(200, 3)).astype(np.float32)
    path = str(tmp_path / "c.ply")
    save_ply(path, pts, cols)
    p, c = load_ply(path)
    np.testing.assert_allclose(p, pts, atol=1e-4)
    np.testing.assert_allclose(c, cols, atol=1.01 / 255)


def test_ply_missing_file_degrades():
    p, c = load_ply("/nonexistent/x.ply")
    assert p.shape == (0, 3) and c is None


def test_ply_color_normalization(tmp_path):
    """registration.cpp:453: components > 1 → /255."""
    path = str(tmp_path / "n.ply")
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
            "0 0 0 255 128 0\n1 1 1 10 20 30\n"
        )
    p, c = load_ply(path)
    assert p.shape == (2, 3)
    np.testing.assert_allclose(c[0], [1.0, 128 / 255, 0.0], atol=1e-6)


def test_viewer_scene_store_and_exports(rng, tmp_path):
    v = SceneViewer(html_path=str(tmp_path / "scene.html"))
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    v.set_point_cloud("scene", pts)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = (0.1, 0.2, 0.3)
    v.set_pose("pose_0", T)
    v.set_path([[0, 0, 0], [0.1, 0.2, 0.3]])

    html = v.export_html(str(tmp_path / "scene.html"))
    content = open(html).read()
    assert "webgl" in content
    # Embedded scene JSON parses and carries our objects.
    start = content.index("let SCENE = ") + len("let SCENE = ")
    end = content.index(";\n", start)
    scene = json.loads(content[start:end])
    assert "scene" in scene["clouds"]
    assert "pose_0" in scene["poses"]
    assert len(scene["path"]) == 2
    # The page is live: it polls the scene.json sidecar by name.
    assert "scene.json" in content and "fetch(" in content

    png = v.export_png(str(tmp_path / "scene.png"))
    assert png is not None and os.path.getsize(png) > 1000

    v.clear()
    assert "scene" not in json.loads(v._scene_json())["clouds"]


def test_viewer_live_sidecar_tracks_mutations(rng, tmp_path):
    """The reference viewer is a live window (gl_viewer.cpp:145-207): a
    mutation while running must reach an open tab with no user action.
    Here: the watcher re-writes scene.json with a bumped version, which the
    page's fetch-poll (or reload fallback) picks up."""
    import time

    v = SceneViewer(html_path=str(tmp_path / "scene.html"))
    v.start()
    try:
        v.set_point_cloud(
            "first", rng.normal(size=(50, 3)).astype(np.float32)
        )
        deadline = time.time() + 5.0
        while not os.path.exists(v.json_path) and time.time() < deadline:
            time.sleep(0.05)
        s1 = json.loads(open(v.json_path).read())
        assert "first" in s1["clouds"]

        v.set_pose("pose_live", np.eye(4, dtype=np.float32))
        deadline = time.time() + 5.0
        while time.time() < deadline:
            s2 = json.loads(open(v.json_path).read())
            if s2["version"] > s1["version"]:
                break
            time.sleep(0.05)
        assert s2["version"] > s1["version"]
        assert "pose_live" in s2["poses"]
    finally:
        v.stop()


def test_viewer_http_serve(rng, tmp_path):
    """The optional localhost server feeds the page's fetch-poll."""
    import urllib.request

    v = SceneViewer(html_path=str(tmp_path / "scene.html"))
    v.set_point_cloud("srv", rng.normal(size=(10, 3)).astype(np.float32))
    v.export_scene_json(v.json_path)
    v.export_html(v.html_path)
    port = v.serve(port=0)
    try:
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/scene.json", timeout=5
        ).read()
        assert "srv" in json.loads(body)["clouds"]
    finally:
        v.stop()


def test_viewer_lifecycle():
    v = SceneViewer(html_path="/tmp/tpu3d_test_scene.html")
    assert not v.is_running()
    v.start()
    assert v.is_running()
    v.stop()
    assert not v.is_running()


def test_viewer_subsamples_large_clouds(rng):
    v = SceneViewer(max_points=100)
    v.set_point_cloud("big", rng.normal(size=(1000, 3)).astype(np.float32))
    assert len(v._clouds["big"]["points"]) <= 100

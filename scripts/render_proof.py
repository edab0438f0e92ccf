"""Generate the checked-in viewer render proof (docs/viewer_render_proof.png).

Builds the REAL procedural demo fixture (models/procedural.py — byte-parity
with /root/reference/src/pipeline.cpp:212-241), deprojects it to a colored
cloud, exports the live WebGL viewer page, and renders that page's embedded
scene through the page-exact software mirror (viz/softrender.py). The PNG is
the visible artifact that the exported viewer draws the scene — the headless
counterpart of opening /root/reference/src/gl_viewer.cpp's window.

Run: python scripts/render_proof.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main(out_path: str) -> None:
    from tpu3d.models.procedural import generate_box_mask, generate_scene
    from tpu3d.ops.deproject import deproject
    from tpu3d.viz.softrender import render_html, save_png
    from tpu3d.viz.viewer import SceneViewer

    rgb, depth, K = generate_scene(640, 480)
    mask = generate_box_mask(640, 480)
    depth_m = depth.astype(np.float32) / 1000.0
    cloud = deproject(depth_m, rgb, K, clipping_max=2.0)
    pts = np.asarray(cloud.points)[np.asarray(cloud.mask)]
    cols = np.asarray(cloud.colors)[np.asarray(cloud.mask)]
    # Thin for a legible frame (the page draws every point; 1-in-4 here
    # keeps the PNG small while the checkerboard stays recognizable).
    pts, cols = pts[::4], cols[::4]

    v = SceneViewer(html_path=os.path.join("/tmp", "render_proof_scene.html"))
    v.set_point_cloud("scene", pts, colors=cols)
    # Grasp pose at the detected box center (the mask region's centroid).
    box = deproject(
        depth_m * (mask > 0), rgb, K, clipping_max=2.0
    )
    bp = np.asarray(box.points)[np.asarray(box.mask)]
    T = np.eye(4)
    T[:3, 3] = bp.mean(axis=0)
    v.set_pose("grasp", T)
    v.set_path([[0.0, -0.2, 0.5], list(T[:3, 3])])

    html_path = v.export_html(v.html_path)
    img, stats = render_html(html_path, width=640, height=480)
    print(f"rendered: {stats}")
    assert stats["points"] > 0 and stats["pixels"] > 0, "page drew nothing"
    saved = save_png(img, out_path)
    if saved is None:  # no matplotlib — minimal uncompressed PNG fallback
        import struct
        import zlib

        raw = b"".join(
            b"\x00" + img[r].tobytes() for r in range(img.shape[0])
        )

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data))
            )

        with open(out_path, "wb") as f:
            f.write(b"\x89PNG\r\n\x1a\n")
            f.write(
                chunk(
                    b"IHDR",
                    struct.pack(
                        ">IIBBBBB", img.shape[1], img.shape[0], 8, 2, 0, 0, 0
                    ),
                )
            )
            f.write(chunk(b"IDAT", zlib.compress(raw, 9)))
            f.write(chunk(b"IEND", b""))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "docs", "viewer_render_proof.png"
    )
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    main(out)

"""NumPy oracle: behavioral transliteration of the reference CPU numerics.

NOT part of the compute path — this exists solely so the JAX/Pallas ops can
be golden-tested against the reference semantics (SURVEY.md §4: "add real
unit tests per op … with golden values from a NumPy/CPU oracle port of
registration.cpp"). Each function documents the reference source lines it
mirrors. float32 throughout, matching Eigen's f32 types.
"""

from __future__ import annotations

import numpy as np

F = np.float32


def voxel_downsample(points, colors, voxel_size):
    """registration.cpp:29-60 — int-floor voxel keys, per-voxel centroid.

    Returns (points, colors) sorted by voxel key (the reference's hash order
    is unordered; tests compare key-sorted sets).
    """
    points = np.asarray(points, F)
    inv = F(1.0) / F(voxel_size)
    keys = np.floor(points * inv).astype(np.int64)
    grid = {}
    for i in range(len(points)):
        grid.setdefault(tuple(keys[i]), []).append(i)
    out_p, out_c = [], []
    for key in sorted(grid):
        idxs = grid[key]
        acc = np.zeros(3, F)
        for i in idxs:
            acc += points[i]
        out_p.append(acc / F(len(idxs)))
        if colors is not None:
            accc = np.zeros(3, F)
            for i in idxs:
                accc += np.asarray(colors[i], F)
            out_c.append(accc / F(len(idxs)))
    return (
        np.asarray(out_p, F),
        np.asarray(out_c, F) if colors is not None else None,
    )


def find_knn(points, query, k):
    """registration.cpp:63-81 — brute-force k nearest (self included)."""
    d = np.sum((points - query) ** 2, axis=1)
    order = np.argsort(d, kind="stable")
    return order[: min(k, len(points))]


def find_radius_nn(points, query, radius, max_nn):
    """registration.cpp:83-102 — sorted radius neighbors capped at max_nn."""
    d2 = np.sum((points.astype(F) - query.astype(F)) ** 2, axis=1)
    sel = np.where(d2 <= F(radius) ** 2)[0]
    order = sel[np.argsort(d2[sel], kind="stable")]
    return order[:max_nn]


def estimate_normals(points, k=30):
    """registration.cpp:105-130."""
    points = np.asarray(points, F)
    normals = np.zeros_like(points)
    for i in range(len(points)):
        nb = points[find_knn(points, points[i], k)]
        centroid = nb.mean(axis=0, dtype=F)
        diff = nb - centroid
        cov = (diff.T @ diff) / F(len(nb))
        _, vecs = np.linalg.eigh(cov.astype(np.float64))
        n = vecs[:, 0].astype(F)
        if np.dot(n, -points[i]) < 0:
            n = -n
        normals[i] = n
    return normals


def compute_fpfh(points, normals, radius, max_nn=100):
    """registration.cpp:133-201."""
    points = np.asarray(points, F)
    normals = np.asarray(normals, F)
    n = len(points)

    def spfh(i):
        hist = np.zeros(33, F)
        for ni in find_radius_nn(points, points[i], radius, max_nn):
            if ni == i:
                continue
            diff = points[ni] - points[i]
            dist = F(np.linalg.norm(diff))
            if dist < 1e-8:
                continue
            u = normals[i]
            dhat = diff / dist
            v = np.cross(u, dhat)
            w = np.cross(u, v)
            alpha = F(np.dot(v, normals[ni]))
            phi = F(np.dot(u, dhat))
            theta = F(np.arctan2(np.dot(w, normals[ni]), np.dot(u, normals[ni])))
            ba = int(np.clip(int((alpha + 1.0) * 5.5), 0, 10))
            bp = int(np.clip(int((phi + 1.0) * 5.5), 0, 10))
            bt = int(np.clip(int((theta / np.pi + 1.0) * 5.5), 0, 10))
            hist[ba] += 1
            hist[11 + bp] += 1
            hist[22 + bt] += 1
        s = hist.sum(dtype=F)
        return hist / s if s > 0 else hist

    spfhs = np.stack([spfh(i) for i in range(n)])
    fpfhs = np.zeros((n, 33), F)
    for i in range(n):
        f = spfhs[i].copy()
        for ni in find_radius_nn(points, points[i], radius, max_nn):
            if ni == i:
                continue
            dist = F(np.linalg.norm(points[ni] - points[i]))
            if dist < 1e-8:
                continue
            f += spfhs[ni] / dist
        s = f.sum(dtype=F)
        fpfhs[i] = f / s if s > 0 else f
    return fpfhs


def kabsch(src3, tgt3):
    """registration.cpp:248-264 — 3-point (or n-point) Kabsch w/ reflection fix."""
    src3 = np.asarray(src3, np.float64)
    tgt3 = np.asarray(tgt3, np.float64)
    sc, tc = src3.mean(axis=0), tgt3.mean(axis=0)
    H = (src3 - sc).T @ (tgt3 - tc)
    U, _, Vt = np.linalg.svd(H)
    V = Vt.T
    R = V @ U.T
    if np.linalg.det(R) < 0:
        V = V.copy()
        V[:, 2] *= -1
        R = V @ U.T
    t = tc - R @ sc
    return R.astype(F), t.astype(F)


def feature_correspondences(src_feat, tgt_feat):
    """registration.cpp:216-232 — exact per-element squared distance scan."""
    src_feat = np.asarray(src_feat, F)
    tgt_feat = np.asarray(tgt_feat, F)
    out = np.zeros(len(src_feat), np.int64)
    for i in range(len(src_feat)):
        d = np.sum((tgt_feat - src_feat[i]) ** 2, axis=1)
        out[i] = int(np.argmin(d))
    return out


def score_hypothesis(R, t, src_pts, corr_tgt_pts, threshold):
    """registration.cpp:270-282 — inlier count / rmse for one transform."""
    err = np.linalg.norm(src_pts @ R.T + t - corr_tgt_pts, axis=1)
    inl = err < threshold
    fitness = F(inl.sum() / len(src_pts))
    rmse = F(np.sqrt((err[inl] ** 2).sum() / inl.sum())) if inl.any() else F(999.0)
    return inl, fitness, rmse


def icp_refine(
    src_pts,
    tgt_pts,
    tgt_normals,
    T_init,
    distance_threshold,
    max_iterations=200,
    point_to_plane=True,
):
    """registration.cpp:297-414, faithful loop structure."""
    src_pts = np.asarray(src_pts, F)
    tgt_pts = np.asarray(tgt_pts, F)
    T = np.asarray(T_init, F).copy()
    fitness, rmse = F(0.0), F(0.0)
    result_T = T.copy()
    use_p2l = point_to_plane and tgt_normals is not None

    for it in range(max_iterations):
        R, t = T[:3, :3], T[:3, 3]
        P = src_pts @ R.T + t
        d2 = np.sum(
            (P[:, None, :] - tgt_pts[None, :, :]) ** 2, axis=2, dtype=F
        )
        best = np.argmin(d2, axis=1)
        bd = np.sqrt(d2[np.arange(len(P)), best])
        keep = bd <= distance_threshold
        n_corr = int(keep.sum())
        if n_corr < 3:
            break

        if use_p2l:
            p = P[keep]
            q = tgt_pts[best[keep]]
            nn = np.asarray(tgt_normals, F)[best[keep]]
            cross = np.cross(p, nn)
            J = np.concatenate([cross, nn], axis=1).astype(np.float64)
            r = np.sum((p - q) * nn, axis=1).astype(np.float64)
            ATA = J.T @ J
            ATb = J.T @ r
            x = np.linalg.solve(ATA, -ATb)
            a, b, g = x[0], x[1], x[2]

            def rx(th):
                c, s = np.cos(th), np.sin(th)
                return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

            def ry(th):
                c, s = np.cos(th), np.sin(th)
                return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

            def rz(th):
                c, s = np.cos(th), np.sin(th)
                return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

            delta = np.eye(4)
            delta[:3, :3] = rx(a) @ ry(b) @ rz(g)
            delta[:3, 3] = x[3:]
        else:
            dR, dt = kabsch(P[keep], tgt_pts[best[keep]])
            delta = np.eye(4)
            delta[:3, :3] = dR
            delta[:3, 3] = dt

        T = (delta @ T).astype(F)
        prev_rmse = rmse
        rmse = F(np.sqrt((bd[keep] ** 2).sum(dtype=F) / n_corr))
        fitness = F(n_corr / len(src_pts))
        result_T = T.copy()
        if it > 0 and abs(prev_rmse - rmse) < 1e-6:
            break
    return result_T, fitness, rmse


def deproject(depth_m, rgb_bgr, fx, fy, cx, cy, clipping_max):
    """pipeline.cpp:68-84 — CPU loop with config clip."""
    pts, cols = [], []
    h, w = depth_m.shape
    for v in range(h):
        for u in range(w):
            z = F(depth_m[v, u])
            if z <= 0 or z > clipping_max:
                continue
            pts.append([(u - cx) * z / fx, (v - cy) * z / fy, z])
            if rgb_bgr is not None:
                b, g, r = rgb_bgr[v, u]
                cols.append([r / 255.0, g / 255.0, b / 255.0])
    return (
        np.asarray(pts, F).reshape(-1, 3),
        np.asarray(cols, F).reshape(-1, 3) if rgb_bgr is not None else None,
    )


def bilateral_filter(depth, sigma_spatial, sigma_range):
    """cuda/depth_processing.cu:56-155 (the reference's dead-code kernel)."""
    depth = np.asarray(depth, F)
    h, w = depth.shape
    radius = min(int(2.0 * sigma_spatial + 0.5), 5)
    inv_s2 = F(-0.5 / (sigma_spatial * sigma_spatial))
    inv_r2 = F(-0.5 / (sigma_range * sigma_range))
    out = np.zeros_like(depth)
    for y in range(h):
        for x in range(w):
            c = depth[y, x]
            if c <= 0:
                continue
            sw = sv = F(0.0)
            for dy in range(-radius, radius + 1):
                for dx in range(-radius, radius + 1):
                    yy, xx = y + dy, x + dx
                    nb = depth[yy, xx] if 0 <= yy < h and 0 <= xx < w else F(0.0)
                    if nb <= 0:
                        continue
                    rd = nb - c
                    wgt = np.exp(
                        F(dx * dx + dy * dy) * inv_s2 + rd * rd * inv_r2
                    )
                    sw += wgt
                    sv += wgt * nb
            out[y, x] = sv / sw if sw > 0 else c
    return out

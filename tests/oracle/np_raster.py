"""Brute-force float64 numpy rasterizer oracle (per-pixel loop over faces)."""
from __future__ import annotations

import numpy as np


def rasterize_np(verts, faces, attrs, height, width, depth_ascending=True):
    """Exact per-pixel rasterization: for every pixel test every face.

    Returns (attrs_img (H,W,C), depth (H,W), mask (H,W), face_id (H,W)).
    Pixel centers at (x+0.5, y+0.5); smallest depth wins.
    """
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    attrs = np.asarray(attrs, np.float64)
    C = attrs.shape[1]
    img = np.zeros((height, width, C))
    depth = np.full((height, width), np.inf)
    mask = np.zeros((height, width), bool)
    fid = np.full((height, width), -1, np.int64)

    sign = 1.0 if depth_ascending else -1.0
    for f in range(faces.shape[0]):
        i0, i1, i2 = faces[f]
        p0, p1, p2 = verts[i0, :2], verts[i1, :2], verts[i2, :2]
        z0, z1, z2 = verts[i0, 2] * sign, verts[i1, 2] * sign, verts[i2, 2] * sign
        area = (p1[0] - p0[0]) * (p2[1] - p0[1]) - (p2[0] - p0[0]) * (p1[1] - p0[1])
        if abs(area) < 1e-12:
            continue
        xmin = max(int(np.floor(min(p0[0], p1[0], p2[0]))), 0)
        xmax = min(int(np.ceil(max(p0[0], p1[0], p2[0]))), width - 1)
        ymin = max(int(np.floor(min(p0[1], p1[1], p2[1]))), 0)
        ymax = min(int(np.ceil(max(p0[1], p1[1], p2[1]))), height - 1)
        for y in range(ymin, ymax + 1):
            for x in range(xmin, xmax + 1):
                pc = np.array([x + 0.5, y + 0.5])
                w0 = ((p2[0] - p1[0]) * (pc[1] - p1[1])
                      - (pc[0] - p1[0]) * (p2[1] - p1[1])) / area
                w1 = ((p0[0] - p2[0]) * (pc[1] - p2[1])
                      - (pc[0] - p2[0]) * (p0[1] - p2[1])) / area
                w2 = 1.0 - w0 - w1
                if w0 < -1e-7 or w1 < -1e-7 or w2 < -1e-7:
                    continue
                d = w0 * z0 + w1 * z1 + w2 * z2
                if d < depth[y, x]:
                    depth[y, x] = d
                    mask[y, x] = True
                    fid[y, x] = f
                    img[y, x] = w0 * attrs[i0] + w1 * attrs[i1] + w2 * attrs[i2]
    return img, depth * sign, mask, fid

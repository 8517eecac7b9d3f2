"""Visualization helpers: projected 3D bounding boxes, mask overlays,
pose grids.

Reference: lib/vis_utils/image.py (grid_show, draw bboxes) and the demo's
3D-box drawing (core/gdrn_modeling/demo/demo_gdrn.py visualization).
Host-side numpy/cv2 — visualization is not a device workload.
"""

from __future__ import annotations

import numpy as np


def bbox3d_corners(extent: np.ndarray, center: np.ndarray | None = None) -> np.ndarray:
    """8 corners (8, 3) of an axis-aligned box with given extent."""
    ex, ey, ez = np.asarray(extent) * 0.5
    corners = np.array([
        [-ex, -ey, -ez], [ex, -ey, -ez], [ex, ey, -ez], [-ex, ey, -ez],
        [-ex, -ey, ez], [ex, -ey, ez], [ex, ey, ez], [-ex, ey, ez],
    ])
    if center is not None:
        corners = corners + np.asarray(center)
    return corners

_BOX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
              (0, 4), (1, 5), (2, 6), (3, 7)]


def project_pts(pts: np.ndarray, K: np.ndarray, R: np.ndarray, t: np.ndarray):
    pc = pts @ R.T + t.reshape(1, 3)
    uvw = pc @ K.T
    return uvw[:, :2] / np.maximum(uvw[:, 2:], 1e-12)


def draw_pose_bbox(img: np.ndarray, K: np.ndarray, R: np.ndarray,
                   t: np.ndarray, extent: np.ndarray,
                   color=(0, 255, 0), thickness=2,
                   center: np.ndarray | None = None) -> np.ndarray:
    """Draw the projected 3D bounding box of a posed object."""
    import cv2
    out = img.copy()
    uv = project_pts(bbox3d_corners(extent, center), K, R, t)
    # clip: near-zero depths from untrained/garbage poses project to huge
    # coordinates that overflow cv2's C int parsing
    uv = np.clip(np.nan_to_num(uv), -10_000, 10_000).astype(np.int32)
    for a, b in _BOX_EDGES:
        cv2.line(out, (int(uv[a, 0]), int(uv[a, 1])),
                 (int(uv[b, 0]), int(uv[b, 1])), color, thickness)
    # draw axes from centroid
    return out


def overlay_mask(img: np.ndarray, mask: np.ndarray,
                 color=(255, 0, 0), alpha=0.4) -> np.ndarray:
    out = img.astype(np.float32).copy()
    m = mask.astype(bool)
    out[m] = out[m] * (1 - alpha) + np.asarray(color, np.float32) * alpha
    return out.astype(np.uint8)


def grid_show(images, titles=None, out_path=None, cols=4):
    """Tile images into one canvas (reference lib/vis_utils grid_show, file
    output instead of matplotlib windows)."""
    import cv2
    n = len(images)
    cols = min(cols, n)
    rows = (n + cols - 1) // cols
    h = max(im.shape[0] for im in images)
    w = max(im.shape[1] for im in images)
    canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, im in enumerate(images):
        if im.ndim == 2:
            im = np.stack([im] * 3, -1)
        if im.dtype != np.uint8:
            lo, hi = float(im.min()), float(im.max())
            im = ((im - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)
        r, c = divmod(i, cols)
        canvas[r * h:r * h + im.shape[0], c * w:c * w + im.shape[1]] = im[..., :3]
        if titles:
            cv2.putText(canvas, str(titles[i]), (c * w + 4, r * h + 16),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.45, (255, 255, 0), 1)
    if out_path:
        cv2.imwrite(out_path, canvas[..., ::-1])
    return canvas

"""Optical-flow trajectory tracking — SURVEY §2.10 G9, §2.5 W6.

Reference semantics (convml_data/sampling/rect/methods/flow/calc.py:19-207,
pipeline/rect/flow.py:21-95): Shi-Tomasi corners seeded on the first image
of a date group, pyramidal Lucas-Kanade tracking image→image in time order,
``-1`` sentinel for lost points, index→coordinate mapping downstream.

This implementation is numpy-only (the container has no OpenCV): a
structure-tensor Shi-Tomasi corner score and an iterative single-level
Lucas-Kanade solver with bilinear sampling. It plugs into Spark through
:func:`track_image_sequence` — per-group ordered stateful scan
(`windows.sequential_scan` shape): the GROUP (date prefix) is the
parallelism unit exactly like the reference's one-task-per-date-group, and
state (previous frame + live points) never leaves the group.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

INVALID = -1.0  # reference's lost-point sentinel (flow/calc.py:177-194)


def _gradients(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    gy, gx = np.gradient(img.astype(np.float64))
    return gx, gy


def _window_sum(a: np.ndarray, r: int) -> np.ndarray:
    """Box sum over a (2r+1)² window via separable cumsum (no scipy).
    Output shape == input shape (edge-padded)."""
    width = 2 * r + 1
    p = np.pad(a, r, mode="edge")
    c = np.zeros((p.shape[0] + 1, p.shape[1]))
    c[1:] = p.cumsum(0)
    v = c[width:] - c[:-width]
    c2 = np.zeros((v.shape[0], v.shape[1] + 1))
    c2[:, 1:] = v.cumsum(1)
    return c2[:, width:] - c2[:, :-width]


def shi_tomasi_corners(
    img: np.ndarray, max_corners: int = 16, window_radius: int = 2, min_distance: int = 5
) -> np.ndarray:
    """Top-k corners by min-eigenvalue of the structure tensor, with greedy
    min-distance suppression. Returns (k, 2) array of (x, y) floats."""
    gx, gy = _gradients(img)
    ixx = _window_sum(gx * gx, window_radius)
    iyy = _window_sum(gy * gy, window_radius)
    ixy = _window_sum(gx * gy, window_radius)
    tr = ixx + iyy
    det_disc = np.sqrt((ixx - iyy) ** 2 + 4.0 * ixy * ixy)
    lam_min = 0.5 * (tr - det_disc)
    # exclude a border margin (windows must fit)
    m = window_radius + 2
    lam_min[:m, :] = -np.inf
    lam_min[-m:, :] = -np.inf
    lam_min[:, :m] = -np.inf
    lam_min[:, -m:] = -np.inf
    order = np.argsort(lam_min, axis=None)[::-1]
    pts: list[tuple[float, float]] = []
    h, w = lam_min.shape
    for flat in order:
        if len(pts) >= max_corners:
            break
        y, x = divmod(int(flat), w)
        if lam_min[y, x] == -np.inf:
            break
        if all((x - px) ** 2 + (y - py) ** 2 >= min_distance**2 for px, py in pts):
            pts.append((float(x), float(y)))
    return np.array(pts, dtype=np.float64).reshape(-1, 2)


def _bilinear(img: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx, fy = x - x0, y - y0
    h, w = img.shape
    x0c = np.clip(x0, 0, w - 2)
    y0c = np.clip(y0, 0, h - 2)
    v00 = img[y0c, x0c]
    v10 = img[y0c, x0c + 1]
    v01 = img[y0c + 1, x0c]
    v11 = img[y0c + 1, x0c + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v10 * fx * (1 - fy)
        + v01 * (1 - fx) * fy
        + v11 * fx * fy
    )


def lk_track_point(
    img0: np.ndarray,
    img1: np.ndarray,
    x: float,
    y: float,
    window_radius: int = 4,
    iterations: int = 5,
) -> tuple[float, float]:
    """Iterative single-level Lucas-Kanade for one point; returns the new
    (x, y) or (INVALID, INVALID) when the point leaves the frame or the
    normal matrix is ill-conditioned."""
    h, w = img0.shape
    r = window_radius
    gx, gy = _gradients(img0)
    oy, ox = np.mgrid[-r : r + 1, -r : r + 1]
    wx = x + ox.ravel()
    wy = y + oy.ravel()
    if x < r or y < r or x > w - 1 - r or y > h - 1 - r:
        return INVALID, INVALID
    a1 = _bilinear(gx, wx, wy)
    a2 = _bilinear(gy, wx, wy)
    t0 = _bilinear(img0, wx, wy)
    A = np.stack([a1, a2], axis=1)
    ata = A.T @ A
    if np.linalg.cond(ata) > 1e8:
        return INVALID, INVALID
    dx = dy = 0.0
    for _ in range(iterations):
        nx, ny = wx + dx, wy + dy
        if (
            x + dx < r or y + dy < r or x + dx > w - 1 - r or y + dy > h - 1 - r
        ):
            return INVALID, INVALID
        it = _bilinear(img1, nx, ny) - t0
        b = -A.T @ it
        step = np.linalg.solve(ata, b)
        dx += float(step[0])
        dy += float(step[1])
        if abs(step[0]) < 1e-3 and abs(step[1]) < 1e-3:
            break
    nx, ny = x + dx, y + dy
    if nx < 0 or ny < 0 or nx > w - 1 or ny > h - 1:
        return INVALID, INVALID
    return nx, ny


def track_image_sequence(
    frames: DataFrame,
    group_col: str,
    order_col: str,
    image_col: str,
    shape: tuple[int, int],
    max_corners: int = 8,
    window_radius: int = 4,
) -> DataFrame:
    """G9 as a Spark operator: per-group ordered LK tracking.

    ``frames`` carries one row per image: (group, order, image ARRAY<DOUBLE>
    row-major of ``shape``). Corners are seeded on each group's first frame;
    each subsequent frame advances live trajectories (lost → -1 sentinel,
    never revived — reference semantics). Output: one row per (frame ×
    trajectory): (group, order, traj_id, x, y, valid).
    """
    import pandas as pd

    h, w = shape
    gt = frames.schema[group_col].dataType.simpleString()
    ot = frames.schema[order_col].dataType.simpleString()
    schema = (
        f"{group_col} {gt}, {order_col} {ot}, traj_id int, "
        "x double, y double, valid boolean"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        out = []
        prev = None
        pts: np.ndarray | None = None
        for row in pdf.to_dict("records"):
            img = np.asarray(row[image_col], dtype=np.float64).reshape(h, w)
            if prev is None:
                pts = shi_tomasi_corners(img, max_corners=max_corners)
            else:
                new_pts = []
                for x, y in pts:
                    if x == INVALID:
                        new_pts.append((INVALID, INVALID))
                    else:
                        new_pts.append(
                            lk_track_point(prev, img, x, y, window_radius=window_radius)
                        )
                pts = np.array(new_pts, dtype=np.float64).reshape(-1, 2)
            for tid, (x, y) in enumerate(pts):
                out.append(
                    {
                        group_col: row[group_col],
                        order_col: row[order_col],
                        "traj_id": tid,
                        "x": float(x),
                        "y": float(y),
                        "valid": bool(x != INVALID),
                    }
                )
            prev = img
        return pd.DataFrame(
            out, columns=[group_col, order_col, "traj_id", "x", "y", "valid"]
        )

    return frames.groupBy(group_col).applyInPandas(run, schema)

"""G9 optical flow: numpy kernels + the Spark per-group tracking operator.
Property: tracking a rigidly translating smooth pattern recovers the shift."""

from __future__ import annotations

import numpy as np

from convml_data_spark.operators import flow


def _smooth_field(seed: int, n: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((n, n))
    # separable box blur ×3 → smooth blobs with strong corners
    for _ in range(3):
        img = (np.roll(img, 1, 0) + img + np.roll(img, -1, 0)) / 3.0
        img = (np.roll(img, 1, 1) + img + np.roll(img, -1, 1)) / 3.0
    return img * 100.0


def test_corner_detector_finds_distinct_points():
    img = _smooth_field(3)
    pts = flow.shi_tomasi_corners(img, max_corners=10, min_distance=6)
    assert 1 <= len(pts) <= 10
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            assert np.hypot(*(pts[i] - pts[j])) >= 6


def test_lk_recovers_known_translation():
    img0 = _smooth_field(7)
    shift = (2, 1)  # (dx, dy) in pixels
    img1 = np.roll(np.roll(img0, shift[1], axis=0), shift[0], axis=1)
    pts = flow.shi_tomasi_corners(img0, max_corners=6, min_distance=8)
    ok = 0
    for x, y in pts:
        nx, ny = flow.lk_track_point(img0, img1, x, y)
        if nx == flow.INVALID:
            continue
        assert abs((nx - x) - shift[0]) < 0.2
        assert abs((ny - y) - shift[1]) < 0.2
        ok += 1
    assert ok >= 3


def test_track_image_sequence_spark(spark):
    base = _smooth_field(11)
    frames = []
    for g, (dx, dy) in (("g1", (1, 0)), ("g2", (0, 1))):
        for step in range(3):
            img = np.roll(np.roll(base, dy * step, axis=0), dx * step, axis=1)
            frames.append((g, step, [float(v) for v in img.ravel()]))
    df = spark.createDataFrame(frames, "g string, step long, image array<double>")
    out = flow.track_image_sequence(
        df.repartition(4), "g", "step", "image", shape=(64, 64), max_corners=5
    ).collect()
    by_traj: dict = {}
    for r in out:
        by_traj.setdefault((r["g"], r["traj_id"]), {})[r["step"]] = r
    moved = 0
    for (g, _tid), steps in by_traj.items():
        assert set(steps) == {0, 1, 2}
        if not (steps[1]["valid"] and steps[2]["valid"]):
            continue
        dx_want, dy_want = (1, 0) if g == "g1" else (0, 1)
        for s in (1, 2):
            assert abs((steps[s]["x"] - steps[0]["x"]) - dx_want * s) < 0.5
            assert abs((steps[s]["y"] - steps[0]["y"]) - dy_want * s) < 0.5
        moved += 1
    assert moved >= 4  # most trajectories tracked across both groups

"""Long-sequence stability: slot recycling, window aging, mid-run resume.

150 frames of oscillating sweep inside the box scene — enough keyframes to
age seeds out (3-batch lifetime), exercise point-slot recycling, roll the
keyframe recency window, and fix old keyframes in BA.  Halfway through, the
map state is checkpointed and restored into a FRESH handler which must
relocalize and finish the sequence (the resume path real long runs rely on).
"""

import numpy as np
import pytest

from hso_tpu.cameras import PinholeCamera
from hso_tpu.math import se3np
from hso_tpu.pipeline.frame_handler import (
    RESULT_FAILURE,
    STAGE_DEFAULT,
    FrameHandler,
)
from hso_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from hso_tpu.utils.synthetic import BoxScene

N_FRAMES = 150


def trajectory(n: int):
    # brisk oscillating sweep: enough optical flow that the DSO keyframe
    # criterion fires regularly (a crawl would correctly yield few KFs)
    poses = []
    for k in range(n):
        t = k / 18.0
        xi = np.r_[
            0.8 * np.sin(0.8 * t),
            0.12 * np.sin(0.5 * t),
            0.14 * t,
            0.02 * np.sin(0.9 * t),
            -0.05 * np.sin(0.6 * t),
            0.02 * np.sin(0.4 * t),
        ]
        poses.append(se3np.exp(xi))
    return poses


@pytest.fixture(scope="module")
def long_run(tmp_path_factory):
    cam = PinholeCamera(640, 480, 400.0, 400.0, 320.0, 240.0)
    scene = BoxScene(cam, half_width=2.0, half_height=1.5, depth=4.5,
                     seed=3, stepped_back=True)
    poses = trajectory(N_FRAMES)
    ckpt = str(tmp_path_factory.mktemp("ckpt") / "map.npz")

    vo = FrameHandler(cam)
    results = []
    half = N_FRAMES // 2
    for k in range(half):
        results.append(vo.add_image(scene.render(poses[k]), ts=float(k)))
    save_checkpoint(vo, ckpt)
    stats_half = dict(
        n_points=int(vo.points.valid.sum()),
        n_kfs=len(vo.kfs.frames),
    )

    # fresh handler resumes from the checkpoint (no in-memory state carried)
    vo2 = FrameHandler(cam)
    load_checkpoint(vo2, ckpt)
    results2 = []
    for k in range(half, N_FRAMES):
        results2.append(vo2.add_image(scene.render(poses[k]), ts=float(k)))
    return dict(vo=vo, vo2=vo2, results=results, results2=results2,
                stats_half=stats_half, poses=poses)


def test_first_half_stable(long_run):
    results = long_run["results"]
    fails = sum(r.status == RESULT_FAILURE for r in results)
    assert fails == 0, [r.status for r in results]
    assert long_run["stats_half"]["n_kfs"] >= 8


def test_resume_and_second_half(long_run):
    vo2 = long_run["vo2"]
    results2 = long_run["results2"]
    # the first resumed frame may relocalize; after that, tracking must hold
    fails = sum(r.status == RESULT_FAILURE for r in results2[2:])
    assert fails == 0, [r.status for r in results2]
    assert vo2.stage == STAGE_DEFAULT
    assert len(vo2.kfs.frames) > long_run["stats_half"]["n_kfs"]


def test_slots_recycled_not_exhausted(long_run):
    vo2 = long_run["vo2"]
    pts = vo2.points
    # live points stay well below capacity: stale TEMPORARY/UNKNOWN points
    # and dead seeds must be released, not accumulate
    assert pts.valid.sum() < 0.8 * pts.p_max, int(pts.valid.sum())
    # and slots ARE being reused (the free list has churned)
    assert len(pts._free) > 0
    # seeds age out: live seeds bounded by a few keyframe batches of detections
    import numpy as _np

    n_seeds = int(_np.asarray(vo2.seeds["valid"]).sum())
    assert n_seeds < vo2.cfg.n_seeds_max, n_seeds


def test_long_run_drift_bounded(long_run):
    # stitch both halves' trajectories (same world frame via the checkpoint)
    vo, vo2 = long_run["vo"], long_run["vo2"]
    poses_gt = long_run["poses"]
    est = {int(ts): T for ts, T in vo.trajectory}
    est.update({int(ts): T for ts, T in vo2.trajectory})
    frames = sorted(est.keys())
    start = next(
        f for f in frames if np.abs(est[f] - se3np.identity()).max() > 1e-9
    )

    def centers(d, idx):
        return np.stack([se3np.translation(se3np.inv(d[i])) for i in idx])

    idx = [f for f in frames if f >= start]
    c_est = centers(est, idx)
    c_gt = centers({i: poses_gt[i] for i in idx}, idx)
    c_est -= c_est[0]
    c_gt -= c_gt[0]
    len_gt = np.linalg.norm(np.diff(c_gt, axis=0), axis=1).sum()
    len_est = np.linalg.norm(np.diff(c_est, axis=0), axis=1).sum()
    assert len_est > 0.01
    s = len_gt / len_est
    ate = np.linalg.norm(c_est * s - c_gt, axis=1)
    rmse = np.sqrt(np.mean(ate**2))
    # ~3.5 m total path with a mid-run cold resume: bound at ~6% of path
    assert rmse < 0.22, (rmse, ate.max())

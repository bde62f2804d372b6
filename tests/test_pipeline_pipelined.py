"""Pipelined host loop (add_image_pipelined): lag-1 dispatch with the
keyframe map/seed updates landing one frame late (the reference's
asynchronous-mapping-thread semantics).  Must track the same synthetic
sequence as the synchronous loop with comparable accuracy and deliver one
result per frame in order."""

import numpy as np
import pytest

from hso_tpu.cameras import PinholeCamera
from hso_tpu.math import se3np
from hso_tpu.pipeline.frame_handler import (
    RESULT_FAILURE,
    STAGE_DEFAULT,
    FrameHandler,
)
from hso_tpu.utils.synthetic import PlaneScene

from test_pipeline_e2e import make_trajectory


@pytest.fixture(scope="module")
def scene_and_frames():
    cam = PinholeCamera(640, 480, 400.0, 400.0, 320.0, 240.0)
    scene = PlaneScene(cam, z0=2.0, extent=4.0, seed=21)
    poses = make_trajectory(30)
    frames = [scene.render(T) for T in poses]
    return cam, poses, frames


def _centers(traj):
    return {int(ts): se3np.translation(se3np.inv(T)) for ts, T in traj}


def test_pipelined_matches_sync(scene_and_frames):
    cam, poses, frames = scene_and_frames

    vo_s = FrameHandler(cam)
    for k, img in enumerate(frames):
        vo_s.add_image(img, ts=float(k))

    vo_p = FrameHandler(cam)
    results = []
    for k, img in enumerate(frames):
        r = vo_p.add_image_pipelined(img, ts=float(k))
        if r is not None:
            results.append(r)
    results += vo_p.flush()

    # one result per frame, delivered in order, no failures
    assert len(results) == len(frames)
    assert vo_p.stage == STAGE_DEFAULT
    assert not any(r.status == RESULT_FAILURE for r in results)
    assert len(vo_p.kfs.frames) >= 3
    # the trajectory covers every frame exactly once, in order
    ts_seen = [int(ts) for ts, _ in vo_p.trajectory]
    assert ts_seen == sorted(ts_seen)
    assert len(ts_seen) == len(frames)

    # both loops track the same ground truth: compare drift vs GT rather
    # than demanding bitwise equality (the keyframe lag legitimately
    # reorders map updates by one frame)
    cs = _centers(vo_s.trajectory)
    cp = _centers(vo_p.trajectory)
    gt = {k: se3np.translation(se3np.inv(T)) for k, T in enumerate(poses)}
    common = sorted(set(cs) & set(cp))[-20:]

    def ate(est):
        e = np.stack([est[k] for k in common])
        g = np.stack([gt[k] for k in common])
        e = e - e.mean(0)
        g = g - g.mean(0)
        s = np.sum(e * g) / max(np.sum(e * e), 1e-12)
        return float(np.sqrt(np.mean(np.sum((s * e - g) ** 2, -1))))

    a_s, a_p = ate(cs), ate(cp)
    assert a_p < max(2.5 * a_s, 0.05), (a_p, a_s)


def test_pipelined_entered_midstream(scene_and_frames):
    """Switching from the synchronous to the pipelined loop mid-sequence
    (the bench warms synchronously, then times the pipelined segment)."""
    cam, poses, frames = scene_and_frames
    vo = FrameHandler(cam)
    split = 16
    for k in range(split):
        vo.add_image(frames[k], ts=float(k))
    assert vo.stage == STAGE_DEFAULT
    res = []
    for k in range(split, len(frames)):
        r = vo.add_image_pipelined(frames[k], ts=float(k))
        if r is not None:
            res.append(r)
    res += vo.flush()
    assert len(res) == len(frames) - split
    assert not any(x.status == RESULT_FAILURE for x in res)
    ts_seen = [int(ts) for ts, _ in vo.trajectory]
    assert ts_seen == sorted(ts_seen) and len(ts_seen) == len(frames)

"""Relocalization: closest-keyframe selection, blackout recovery, reset_all.

Reference behavior:
  * relocalizeFrame targets map_.getClosestKeyframe(last_frame_), not the
    newest keyframe (/root/reference/src/frame_handler_mono.cpp:113-114,
    src/map.cpp:193-230);
  * prolonged failure falls back to a full resetAll
    (frame_handler_mono.cpp:409-417, frame_handler_base.cpp:140-145).
"""

import numpy as np
import pytest

from hso_tpu.cameras import PinholeCamera
from hso_tpu.math import se3np
from hso_tpu.pipeline.frame_handler import (
    RESULT_FAILURE,
    STAGE_DEFAULT,
    STAGE_FIRST,
    STAGE_RELOC,
    FrameHandler,
)
from hso_tpu.utils.synthetic import PlaneScene


def _cam():
    return PinholeCamera(640, 480, 400.0, 400.0, 320.0, 240.0)


def _pose(x, y=0.0, z=0.0):
    return se3np.exp(np.r_[x, y, z, 0.0, 0.0, 0.0])


def test_closest_keyframe_is_distance_ranked():
    """_closest_keyframe must pick the nearest same-facing keyframe holding
    a pyramid — not simply the last one."""
    from hso_tpu.mapmodel.structures import Frame, empty_obs

    vo = FrameHandler(_cam())
    fake_pyr = {"pyr": (np.zeros((480, 640), np.float32),)}
    for i, x in enumerate((0.0, 0.5, 1.0, 1.5)):
        f = Frame(frame_id=i, timestamp=float(i), T_f_w=_pose(x),
                  data=dict(fake_pyr), obs=empty_obs(8))
        vo.kfs.add(f)
    # query near x=0.4: keyframe 1 (x=0.5) is closest, NOT the last (x=1.5)
    best = vo._closest_keyframe(_pose(0.4))
    assert best is vo.kfs.frames[1]
    # opposite-facing keyframes are excluded even when near
    T_flip = se3np.mul(_pose(0.4), se3np.exp(np.r_[0, 0, 0, 0.0, np.pi, 0.0]))
    vo.kfs.frames[1].T_f_w = se3np.mul(
        se3np.exp(np.r_[0.0, 0, 0, 0.0, np.pi, 0.0]), _pose(0.5)
    )
    best = vo._closest_keyframe(_pose(0.4))
    assert best is not vo.kfs.frames[1]
    # keyframes without pyramids never qualify
    for f in vo.kfs.frames:
        f.data = None
    assert vo._closest_keyframe(_pose(0.4)) is None


@pytest.fixture(scope="module")
def tracked_vo():
    cam = _cam()
    scene = PlaneScene(cam, z0=2.5, extent=4.0, seed=7)
    vo = FrameHandler(cam)
    poses = []
    for k in range(60):
        t = k / 12.0
        poses.append(_pose(0.9 * np.sin(0.7 * t), 0.05 * t, 0.04 * t))
    for k, T in enumerate(poses):
        vo.add_image(scene.render(T), ts=float(k))
    assert vo.stage == STAGE_DEFAULT, vo.stage
    assert len(vo.kfs.frames) >= 3
    return dict(vo=vo, scene=scene, poses=poses, cam=cam)


def test_blackout_recovery(tracked_vo):
    """A short image dropout loses tracking; once images return near the
    same place, relocalization recovers into DEFAULT with a sane pose."""
    vo, scene = tracked_vo["vo"], tracked_vo["scene"]
    T_resume = tracked_vo["poses"][-1]
    black = np.zeros((480, 640), np.uint8)
    for k in range(3):
        vo.add_image(black, ts=100.0 + k)
    assert vo.stage == STAGE_RELOC
    recovered = False
    for k in range(3):
        res = vo.add_image(scene.render(T_resume), ts=110.0 + k)
        if res.status != RESULT_FAILURE and vo.stage == STAGE_DEFAULT:
            recovered = True
            break
    assert recovered
    t_est = se3np.translation(se3np.inv(vo.last_frame.T_f_w))
    t_gt = se3np.translation(se3np.inv(T_resume))
    # monocular scale is free; position must be in the right neighbourhood
    assert np.linalg.norm(t_est - t_gt) < 0.35, (t_est, t_gt)


def test_starvation_triggers_reset(tracked_vo):
    """Feeding failures past RELOC_MAX_FAILURES must wipe the map and
    re-enter the bootstrap stage (resetAll semantics)."""
    vo = tracked_vo["vo"]
    black = np.zeros((480, 640), np.uint8)
    # ensure we are in RELOC first
    for k in range(3):
        vo.add_image(black, ts=200.0 + k)
    assert vo.stage == STAGE_RELOC
    for k in range(vo.RELOC_MAX_FAILURES + 2):
        vo.add_image(black, ts=210.0 + k)
        if vo.stage == STAGE_FIRST:
            break
    assert vo.stage == STAGE_FIRST
    assert len(vo.kfs.frames) == 0
    assert int(vo.points.valid.sum()) == 0
    # a textured image restarts the bootstrap (first frame accepted)
    scene = tracked_vo["scene"]
    vo.add_image(scene.render(_pose(0.0)), ts=300.0)
    assert vo.stage != STAGE_RELOC

"""End-to-end VO inside a multi-depth box scene.

Unlike the textured-plane e2e test, the box interior has large depth
variation (side walls sweeping past vs a distant back wall) and depth
discontinuities — exercising the depth filter across ranges, the inverse-
distance BA with mixed-depth landmarks, and the non-planar (essential
matrix) bootstrap branch.
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
from hso_tpu.utils.synthetic import BoxScene


def make_trajectory(n: int):
    """Lateral sweep with forward motion down the corridor.  The sweep is
    front-loaded (t^0.6) so the two-view bootstrap reaches its 40 px median
    disparity early, then motion relaxes."""
    poses = []
    for k in range(n):
        t = k / max(n - 1, 1)
        s = t ** 0.6
        xi = np.r_[
            1.0 * s,                  # lateral sweep (strong parallax on walls)
            0.08 * np.sin(2.0 * t),
            0.4 * t,                  # forward down the corridor
            0.02 * np.sin(3 * t),
            -0.06 * t,
            0.02 * np.sin(2 * t),
        ]
        poses.append(se3np.exp(xi))
    return poses


@pytest.fixture(scope="module")
def run_vo_box():
    cam = PinholeCamera(640, 480, 400.0, 400.0, 320.0, 240.0)
    scene = BoxScene(cam, half_width=2.0, half_height=1.5, depth=4.5, seed=9,
                     stepped_back=True)
    poses = make_trajectory(36)
    vo = FrameHandler(cam)
    results = [vo.add_image(scene.render(T), ts=float(k))
               for k, T in enumerate(poses)]
    return dict(vo=vo, poses=poses, results=results, scene=scene)


def test_tracks_box_scene(run_vo_box):
    vo = run_vo_box["vo"]
    results = run_vo_box["results"]
    assert vo.stage == STAGE_DEFAULT
    fails = [r.status for r in results if r.status == RESULT_FAILURE]
    assert len(fails) == 0, [r.status for r in results]
    n_m = [r.n_inliers for r in results if r.n_inliers > 0]
    assert np.median(n_m) > 50, n_m


def test_map_spans_depth_range(run_vo_box):
    """Landmarks must cover near (side walls) AND far (back wall) structure,
    not collapse to one plane."""
    vo = run_vo_box["vo"]
    pts = vo.points
    pos = pts.positions(vo.kfs.poses)[pts.valid]
    assert len(pos) > 100
    # depth in the first camera frame (world == first cam): spread over the
    # scene's monocular-scaled depth range
    z = pos[:, 2]
    z = z[(z > 0) & np.isfinite(z)]
    lo, hi = np.percentile(z, [10, 90])
    assert hi / max(lo, 1e-9) > 1.8, (lo, hi)


def test_box_trajectory_accuracy(run_vo_box):
    vo = run_vo_box["vo"]
    poses_gt = run_vo_box["poses"]
    est = {int(ts): T for ts, T in vo.trajectory}
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
    len_est = np.linalg.norm(np.diff(c_est, axis=0), axis=1).sum()
    len_gt = np.linalg.norm(np.diff(c_gt, axis=0), axis=1).sum()
    assert len_est > 0.01
    s = len_gt / len_est
    ate = np.linalg.norm(c_est * s - c_gt, axis=1)
    rmse = np.sqrt(np.mean(ate**2))
    # stress scene (grazing side walls, occlusion edge, fast sweep): this is
    # a robustness gate, not a precision gate — precision is covered by the
    # frontal-plane e2e (rmse < 0.05).  Demand <10% of the ~1.1 m path.
    assert rmse < 0.11, (rmse, ate.max())


def test_ba_pose_writeback_path_tracks():
    """The non-default Config.loba_pose_writeback=True path (the
    reference's semantics, bundle_adjustment.cpp:826-834) must still track
    a short sequence without failures — the default records the tracked
    chain instead (see the config docstring for the measured A/B)."""
    import numpy as np

    from hso_tpu.cameras import PinholeCamera
    from hso_tpu.config import Config
    from hso_tpu.pipeline.frame_handler import FrameHandler
    from hso_tpu.utils.synthetic import PlaneScene
    from test_pipeline_e2e import make_trajectory

    cam = PinholeCamera(640, 480, 400.0, 400.0, 320.0, 240.0)
    scene = PlaneScene(cam, z0=2.0, extent=4.0, seed=21)
    poses = make_trajectory(24)
    vo = FrameHandler(cam, Config(loba_pose_writeback=True))
    n_fail = 0
    for k, T in enumerate(poses):
        r = vo.add_image(scene.render(T), ts=float(k))
        n_fail += r.status == "failure"
    assert vo.stage == "default" and n_fail == 0
    assert len(vo.kfs.frames) >= 3

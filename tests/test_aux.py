import os

import numpy as np

from hso_tpu.utils.trace import PerformanceMonitor


def test_performance_monitor(tmp_path):
    mon = PerformanceMonitor("t", str(tmp_path))
    mon.add_timer("stage_a")
    mon.add_log("n_things")
    mon.init()
    for i in range(3):
        with mon.timing("stage_a"):
            _ = sum(range(1000))
        mon.log("n_things", i * 10)
        mon.update_finished()
    mon.close()
    lines = (tmp_path / "t.csv").read_text().strip().splitlines()
    assert lines[0] == "timer_stage_a,log_n_things"
    assert len(lines) == 4
    vals = [float(x) for x in lines[2].split(",")]
    assert vals[0] >= 0.0 and vals[1] == 10.0


def test_checkpoint_roundtrip(tmp_path):
    """Save/restore mid-run map state; trajectories must agree afterwards."""
    from hso_tpu.cameras import PinholeCamera
    from hso_tpu.pipeline.frame_handler import FrameHandler, STAGE_DEFAULT
    from hso_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from hso_tpu.utils.synthetic import PlaneScene
    from hso_tpu.math import se3np

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline_e2e import make_trajectory

    cam = PinholeCamera(640, 480, 400.0, 400.0, 320.0, 240.0)
    scene = PlaneScene(cam, z0=2.0, extent=4.0, seed=21)
    vo = FrameHandler(cam)
    poses = make_trajectory(30)
    for k, T in enumerate(poses[:19]):
        vo.add_image(scene.render(T), float(k))
    assert vo.stage == STAGE_DEFAULT
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(vo, path)

    vo2 = FrameHandler(cam)
    load_checkpoint(vo2, path)
    assert len(vo2.kfs.frames) == len(vo.kfs.frames)
    assert int(vo2.points.valid.sum()) == int(vo.points.valid.sum())
    np.testing.assert_allclose(vo2.kfs.poses, vo.kfs.poses)

    # resumed handler relocalizes and keeps tracking new frames
    n_ok = 0
    for k in range(19, 24):
        r = vo2.add_image(scene.render(poses[k]), float(k))
        n_ok += r.status in ("frame", "keyframe")
    assert n_ok >= 3, n_ok

"""Render a long synthetic dataset to disk in the reference's layout.

Produces <out>/images/*.png, <out>/times.txt (id + stamp lines),
<out>/groundtruth.txt (TUM format) and <out>/calib.txt (the 3-line Pinhole
calib format of /root/reference/test/cameras/*.txt), so
``scripts/run_dataset.py`` can run it exactly like a EuRoC folder and the ATE
tool can score it (VERDICT r2 item 9: a committed long-sequence accuracy
artifact needs a dataset this image doesn't ship — so we make one).

    python scripts/make_synthetic_dataset.py out=<dir> [n=2200] [seed=3]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def trajectory(n: int):
    """Bounded loopy sweep inside the box: brisk enough for regular
    keyframes, periodic so the camera never leaves the scene."""
    from hso_tpu.math import se3np

    poses = []
    for k in range(n):
        t = k / 18.0
        xi = np.r_[
            0.85 * np.sin(0.8 * t),
            0.14 * np.sin(0.5 * t),
            0.9 * np.sin(0.061 * t) + 0.12 * np.sin(0.35 * t),
            0.025 * np.sin(0.9 * t),
            -0.06 * np.sin(0.6 * t),
            0.02 * np.sin(0.4 * t),
        ]
        poses.append(se3np.exp(xi))
    return poses


def main() -> None:
    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    out = args.get("out")
    if not out:
        print(__doc__)
        sys.exit(1)
    n = int(args.get("n", 2200))
    seed = int(args.get("seed", 3))

    import cv2

    from hso_tpu.cameras import PinholeCamera
    from hso_tpu.math import se3np
    from hso_tpu.utils.synthetic import BoxScene

    w, h, fx, fy, cx, cy = 640, 480, 400.0, 400.0, 320.0, 240.0
    cam = PinholeCamera(w, h, fx, fy, cx, cy)
    scene = BoxScene(cam, half_width=2.0, half_height=1.5, depth=4.5,
                     seed=seed, stepped_back=True)
    poses = trajectory(n)

    img_dir = os.path.join(out, "images")
    os.makedirs(img_dir, exist_ok=True)
    with open(os.path.join(out, "times.txt"), "w") as tf, \
         open(os.path.join(out, "groundtruth.txt"), "w") as gf:
        gf.write("# timestamp tx ty tz qx qy qz qw\n")
        for k, T in enumerate(poses):
            img = scene.render(T)
            cv2.imwrite(os.path.join(img_dir, f"{k:06d}.png"),
                        img.astype(np.uint8))
            ts = k / 30.0
            tf.write(f"{k:06d} {ts:.6f}\n")
            from hso_tpu.io.trajectory import rotation_to_quaternion

            Twc = se3np.inv(T)
            t = se3np.translation(Twc)
            q = rotation_to_quaternion(se3np.rotation(Twc))
            gf.write(f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                     f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n")
            if k % 200 == 0:
                print(f"rendered {k}/{n}", file=sys.stderr)

    with open(os.path.join(out, "calib.txt"), "w") as cf:
        cf.write(f"Pinhole {fx} {fy} {cx} {cy} 0\n")
        cf.write(f"{w} {h}\n")
        cf.write("none\n")
    print(f"dataset written to {out} ({n} frames)")


if __name__ == "__main__":
    main()

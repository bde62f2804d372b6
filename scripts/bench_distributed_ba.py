"""Weak-scaling benchmark of the distributed sliding-window BA.

BASELINE target: ≥80% weak-scaling efficiency at ≥2 hosts for the
observation-sharded Schur BA (keyframe/map-point blocks partitioned,
camera-camera Hessian psum over ICI).  This harness keeps the per-device
observation load constant while growing the mesh, and reports step time and
efficiency per device count.

    python scripts/bench_distributed_ba.py [devices=1,2,4,8] [obs_per_dev=8192]
        [kf=16] [pts=2048] [iters=10] [cpu=1]

On this image only virtual CPU meshes are available
(``--xla_force_host_platform_device_count``) — numbers there validate the
harness and the collective layout, not real ICI bandwidth; run on a real pod
slice for the reportable figure.  Prints one JSON line per device count and
a final summary line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    dev_counts = [int(x) for x in args.get("devices", "1,2,4,8").split(",")]
    obs_per_dev = int(args.get("obs_per_dev", 8192))
    n_kf = int(args.get("kf", 16))
    n_pts = int(args.get("pts", 2048))
    n_iter = int(args.get("iters", 10))

    max_dev = max(dev_counts)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={max_dev}"
    )

    import jax

    if args.get("cpu", "1") != "0":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    )
    from test_local_ba import FOCAL, make_ba_problem

    from hso_tpu.ba.distributed import compute_deltas, make_distributed_ba, shard_obs

    devs = jax.devices()
    print(f"# backend={devs[0].platform} n_devices={len(devs)}", file=sys.stderr)

    results = []
    for nd in dev_counts:
        if nd > len(devs):
            print(f"# skipping {nd} devices (have {len(devs)})", file=sys.stderr)
            continue
        mesh = Mesh(np.array(devs[:nd]), axis_names=("obs",))
        E = obs_per_dev * nd
        prob = make_ba_problem(n_kf=6, n_pts=256, K=n_kf, P=n_pts, E=E,
                               noise_px=0.3, seed=nd)
        deltas = compute_deltas(prob["T_kf"], prob["idist"], prob["obs"], FOCAL)
        step = make_distributed_ba(mesh, n_kf=prob["K"], n_pts=prob["P"],
                                   n_iter=n_iter)
        obs_sh = shard_obs(prob["obs"], mesh)
        run = lambda: step(prob["T_kf"], prob["free"], prob["idist"],
                           prob["point_valid"], obs_sh, *deltas)
        out = run()
        jax.block_until_ready(out)
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            out = run()
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        chi2 = float(out[2])
        results.append((nd, E, dt, chi2))
        print(json.dumps({
            "devices": nd, "obs_total": E, "obs_per_dev": obs_per_dev,
            "step_ms": round(dt * 1e3, 3), "chi2": chi2,
        }))

    if results:
        t1 = results[0][2]
        for nd, E, dt, _ in results:
            eff = t1 / dt
            print(json.dumps({
                "metric": "weak_scaling_efficiency", "devices": nd,
                "value": round(eff, 3),
            }))


if __name__ == "__main__":
    main()

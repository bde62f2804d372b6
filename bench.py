"""Benchmark: whole-pipeline per-frame throughput on one TPU chip.

Headline metric ``pipeline_frames_per_s``: the FULL per-frame tracking path —
image pyramid + Sobel construction, coarse-to-fine 7-DoF photometric
alignment, map reprojection into the cell grid, batched direct feature
matching, motion-only reprojection pose LM, and the complete depth-filter
seed sweep — plus keyframe-amortised work (hybrid feature detection and a
windowed Schur bundle adjustment, executed every KF_EVERY-th frame via
``lax.cond``, the pipeline's realistic keyframe rate).  This mirrors the fps
the reference prints, which is whole-pipeline
(/root/reference/src/frame_handler_base.cpp:121-127).

Honesty protocol:
  * the map (point table, memoized patch sources, depth-filter seed state)
    is built by running the REAL FrameHandler over a bootstrap segment — no
    oracle depths anywhere.  The bootstrap state is committed as
    ``artifacts/bench_boot.npz`` (produced by ``python bench.py --regen``,
    which runs the live bootstrap and snapshots it at a keyframe event) so
    the bench itself resumes in seconds instead of re-running ~50 frames
    through the host loop each run;
  * the BA problem solved in the timed scan is captured LIVE from the
    keyframes the host-loop segment processes (fallback: the committed
    ``artifacts/bench_ba.npz``, captured the same way at regen time);
  * the timed segment is a single ``lax.scan`` whose step calls THE SAME
    fused per-frame function the live pipeline dispatches
    (``FrameHandler._fused_step`` → hso_tpu/pipeline/fused_step.py), with
    pose/pyramid/obs/seed state feeding forward through the carry
    (dispatch/tunnel overhead excluded: the axon dev tunnel costs ~24 ms per
    host sync, which a production host-adjacent deployment does not pay);
  * the scan trajectory is checked against ground truth with scale-aligned
    ATE — if the RMSE gate fails, the bench prints ``"value": null`` and
    exits nonzero: a broken tracking loop cannot report a garbage-fast
    number;
  * ``host_loop_frames_per_s`` (secondary, in the same JSON line) times the
    real ``FrameHandler.add_image`` host loop including all per-frame host
    bookkeeping and the one per-frame device sync.

Baseline: ``vs_baseline`` divides by the measured-on-this-machine CPU anchor
in BASELINE.md (see scripts/baseline_cpu_microbench.py); falls back to the
documented 40 fps estimate if the anchor file is absent.

Prints exactly one JSON line on stdout.
"""

import functools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

import numpy as np

import jax

# persistent compile cache: axon remote compiles are slow (minutes for the
# fused scan) and the service degrades under load — cache across runs
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from hso_tpu.cameras import PinholeCamera
from hso_tpu.config import Config
from hso_tpu.math import se3np
from hso_tpu.ops.detect import detect_features
from hso_tpu.pipeline.frame_handler import FrameHandler
from hso_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from hso_tpu.utils.evaluate import ate
from hso_tpu.utils.synthetic import BoxScene

REFERENCE_CPU_FPS_FALLBACK = 40.0  # used only if BASELINE_CPU.json is absent
N_BOOT = 48                       # untimed real-pipeline bootstrap frames (regen)
N_HOST = 16                       # frames timed through the host loop
N_SCAN = 64                       # frames timed through the fused scan
N_REPEATS = 3
KF_EVERY = 6                      # amortised keyframe-work cadence

BOOT_NPZ = os.path.join(ROOT, "artifacts", "bench_boot.npz")
BA_NPZ = os.path.join(ROOT, "artifacts", "bench_ba.npz")
CPU_ANCHOR = os.path.join(ROOT, "BASELINE_CPU.json")

_T0 = time.perf_counter()


def _phase(msg: str) -> None:
    print(f"[bench {time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr)


def bench_camera() -> PinholeCamera:
    return PinholeCamera(640, 480, 400.0, 400.0, 320.0, 240.0)


def bench_scene(cam) -> BoxScene:
    return BoxScene(cam, half_width=2.0, half_height=1.5, depth=4.5,
                    seed=3, stepped_back=True)


def trajectory(n):
    """Brisk oscillating sweep inside the box (same family as the e2e tests:
    enough parallax to bootstrap, bounded net motion so the map stays in
    view over the steady-state segment)."""
    poses = []
    for k in range(n):
        t = k / 18.0
        xi = np.r_[0.8 * np.sin(0.8 * t), 0.12 * np.sin(0.5 * t), 0.10 * np.sin(0.35 * t),
                   0.02 * np.sin(0.9 * t), -0.05 * np.sin(0.6 * t), 0.02 * np.sin(0.4 * t)]
        poses.append(se3np.exp(xi))
    return poses


def reference_cpu_fps() -> tuple[float, list, str]:
    if os.path.exists(CPU_ANCHOR):
        with open(CPU_ANCHOR) as f:
            anchor = json.load(f)
        return (float(anchor["reference_cpu_fps"]),
                anchor.get("reference_cpu_fps_range"),
                "measured hot-loop anchor on this CPU "
                "(BASELINE_CPU.json; reference-favoring upper bound => "
                "speedup is a lower bound)")
    return (REFERENCE_CPU_FPS_FALLBACK, None,
            "40 fps literature estimate (no anchor file)")


# ---------------------------------------------------------------- BA capture
def save_ba_problem(path, args, kw) -> None:
    T_kf, free, idist, pvalid, obs = args
    blobs = {
        "T_kf": np.asarray(T_kf), "free": np.asarray(free),
        "idist": np.asarray(idist), "pvalid": np.asarray(pvalid),
        "kw_json": np.frombuffer(json.dumps(kw).encode(), np.uint8),
    }
    for k, v in obs.items():
        blobs["obs_" + k] = np.asarray(v)
    np.savez(path, **blobs)


def load_ba_problem(path):
    z = np.load(path)
    obs = {k[4:]: jnp.asarray(z[k]) for k in z.files if k.startswith("obs_")}
    kw = json.loads(bytes(z["kw_json"]).decode())
    args = (jnp.asarray(z["T_kf"]), jnp.asarray(z["free"]),
            jnp.asarray(z["idist"]), jnp.asarray(z["pvalid"]), obs)
    return args, kw


class _BACapture:
    """Context manager: record the (args, kwargs) of every windowed-BA call
    the live pipeline makes, while still running the real solver."""

    def __init__(self):
        self.args = None
        self.kw = None

    def __enter__(self):
        import hso_tpu.pipeline.ba_glue as ba_glue

        self._mod = ba_glue
        self._orig = ba_glue.local_bundle_adjustment

        def capturing(*args, **kw):
            self.args, self.kw = args, kw
            return self._orig(*args, **kw)

        ba_glue.local_bundle_adjustment = capturing
        return self

    def __exit__(self, *exc):
        self._mod.local_bundle_adjustment = self._orig
        return False


# ---------------------------------------------------------------- bootstrap
def bootstrap_live(cam, cfg, scene, save: bool) -> FrameHandler:
    """Run the real pipeline over the bootstrap segment and (optionally)
    snapshot its state at the first keyframe event past N_BOOT frames."""
    poses = trajectory(N_BOOT + 25)
    vo = FrameHandler(cam, cfg)
    with _BACapture() as cap:
        for k in range(N_BOOT):
            vo.add_image(scene.render(poses[k]), ts=float(k))
        # continue to the next keyframe event so the snapshot's last_frame
        # is a keyframe with a stored pyramid (resume_stage="default" needs it)
        for k in range(N_BOOT, N_BOOT + 25):
            res = vo.add_image(scene.render(poses[k]), ts=float(k))
            if res.status == "keyframe":
                break
    n_pts = int(vo.points.valid.sum())
    assert vo.stage == "default" and n_pts > 50, (
        f"bootstrap failed: stage={vo.stage} n_pts={n_pts}")
    assert cap.args is not None, "pipeline never ran BA during bootstrap"
    if save:
        os.makedirs(os.path.dirname(BOOT_NPZ), exist_ok=True)
        save_checkpoint(vo, BOOT_NPZ)
        save_ba_problem(BA_NPZ, cap.args, cap.kw)
        _phase(f"snapshot saved: frame {vo.frame_count}, {n_pts} points "
               f"({os.path.getsize(BOOT_NPZ) // 2**20} MiB)")
    return vo


def main() -> None:
    regen = "--regen" in sys.argv
    cam = bench_camera()
    cfg = Config()
    scene = bench_scene(cam)
    _phase("start")

    if os.path.exists(BOOT_NPZ) and not regen:
        vo = FrameHandler(cam, cfg)
        load_checkpoint(vo, BOOT_NPZ, resume_stage="default")
        assert vo.stage == "default" and int(vo.points.valid.sum()) > 50
        _phase(f"bootstrap state resumed at frame {vo.frame_count} "
               f"({int(vo.points.valid.sum())} points)")
    else:
        vo = bootstrap_live(cam, cfg, scene, save=True)
        _phase("live bootstrap done")

    start = vo.frame_count
    n_warm_max = 20
    poses = trajectory(start + n_warm_max + N_HOST + N_SCAN)
    frames = [scene.render(T) for T in poses[start:]]
    _phase(f"{len(frames)} frames rendered")

    # ---- phase 1 (timed, secondary): the real host loop.  BA problems the
    # pipeline solves at its keyframes are captured for the scan.  Warm
    # through the first THREE keyframe events: one-time per-executable
    # loads (detection, BA, seed harvest/init) fire lazily across the first
    # few keyframes and would otherwise pollute the steady-state figure ----
    with _BACapture() as cap:
        k = 0
        nkf = 0
        while k < n_warm_max:
            res = vo.add_image(frames[k], ts=float(start + k))
            k += 1
            if res.status == "keyframe":
                nkf += 1
                if nkf >= 3 and k >= 2:
                    break
        _phase(f"host loop warm ({k} frames, {nkf} keyframes)")
        t0 = time.perf_counter()
        for j in range(k, k + N_HOST):
            vo.add_image(frames[j], ts=float(start + j))
        host_fps = N_HOST / (time.perf_counter() - t0)
        k += N_HOST
    assert vo.stage == "default", f"host loop lost tracking: {vo.stage}"
    _phase(f"host loop timed: {host_fps:.2f} fps")

    if cap.args is not None:
        ba_args, ba_kw = cap.args, cap.kw
    else:
        ba_args, ba_kw = load_ba_problem(BA_NPZ)
    from hso_tpu.pipeline.ba_glue import local_bundle_adjustment as orig_ba
    from hso_tpu.image.pyramid import build_frame_pyramids

    # ---- snapshot the live map state for the steady-state scan.  The scan
    # step IS the pipeline's fused per-frame step (FrameHandler._fused_step /
    # hso_tpu/pipeline/fused_step.py) — the bench cannot diverge from what
    # add_image dispatches ----
    snap = vo._snapshot()
    step_fn = vo._fused_step()
    seeds0 = vo.seeds
    px_err_angle = vo.px_error_angle

    last = vo.last_frame
    obs0 = vo._prev_obs_dev(last)
    T0 = jnp.asarray(last.T_f_w, jnp.float32)
    pyr0 = build_frame_pyramids(jnp.asarray(frames[k - 1]))["pyr"]
    gm0 = jnp.float32(last.grad_mean)
    it0 = jnp.float32(last.intensity_mean)
    exp0 = jnp.float32(last.exposure)
    I_rel = jnp.asarray(se3np.identity(), jnp.float32)

    scan_imgs = jnp.asarray(np.stack(frames[k:k + N_SCAN]))
    kf_sched = jnp.asarray((np.arange(N_SCAN) % KF_EVERY) == KF_EVERY - 1)

    def step(snap, carry, inp):
        img, is_kf = inp
        T_prev, prev_pyr, prev_gm, prev_it, exp_prev, obs, seeds, acc = carry
        out = step_fn(img, prev_pyr, prev_gm, T_prev, obs, prev_it, exp_prev,
                      I_rel, snap, seeds, jnp.float32(px_err_angle), acc)
        data = out["data"]

        # keyframe-amortised work: hybrid detection + windowed Schur BA
        def kf_work(_):
            occ = jnp.zeros((-(-cam.height // 32), -(-cam.width // 32)), bool)
            det = detect_features(data["pyr"][:3], data["sobel_x"],
                                  data["sobel_y"], data["grad_mean"], occ,
                                  n_out=cfg.n_fts_max)
            ba = orig_ba(*ba_args, **ba_kw)
            return (jnp.sum(det["score"]) + ba["chi2_final"]).astype(jnp.float32)

        kf_chk = jax.lax.cond(is_kf, kf_work,
                              lambda _: jnp.float32(0.0), 0)

        chk = (kf_chk + out["n_seeds_updated"].astype(jnp.float32)
               + out["n_matches"].astype(jnp.float32) + out["err_px"])
        carry = (out["T_new"], data["pyr"], data["grad_mean"],
                 data["intensity_mean"], out["exposure"], out["obs_next"],
                 out["seeds"], out["acc"])
        return carry, (out["T_new"], chk)

    @jax.jit
    def run(imgs, seeds, snap):
        acc0 = jnp.zeros((2, vo.points.p_max), jnp.int32)
        carry0 = (T0, pyr0, gm0, it0, exp0, obs0, seeds, acc0)
        (_, _, _, _, _, _, seeds_fin, _), (traj, chk) = jax.lax.scan(
            functools.partial(step, snap), carry0, (imgs, kf_sched))
        # consume all stage outputs so XLA cannot dead-code-eliminate them
        return traj, jnp.sum(chk) + jnp.sum(seeds_fin["mu"])

    _phase("scan inputs staged")
    traj, chk = run(scan_imgs, seeds0, snap)    # warmup / compile
    _ = np.asarray(chk)
    _phase("scan compiled+warm")

    t0 = time.perf_counter()
    for _ in range(N_REPEATS):
        traj, chk = run(scan_imgs, seeds0, snap)
        _ = np.asarray(chk)                      # forced sync
    dt = time.perf_counter() - t0
    assert np.isfinite(float(chk)), "scan produced non-finite state"
    fps = N_SCAN * N_REPEATS / dt
    _phase(f"scan timed: {fps:.2f} fps")

    # ---- honesty gate (FATAL): the scan must actually track ----
    traj_np = np.asarray(traj, np.float64)
    est_xyz = np.stack([se3np.translation(se3np.inv(se3np.normalize(T)))
                        for T in traj_np])
    gt_xyz = np.stack([se3np.translation(se3np.inv(T))
                       for T in poses[start + k:start + k + N_SCAN]])
    res = ate(est_xyz, gt_xyz, with_scale=True)
    base_fps, base_range, base_note = reference_cpu_fps()
    if not (res.rmse < 0.10):
        print(json.dumps({
            "metric": "pipeline_frames_per_s", "value": None, "unit": "frames/s",
            "vs_baseline": None,
            "error": f"scan ATE RMSE {res.rmse:.4f} m exceeds 0.10 m gate — "
                     "the pipeline is mis-tracking; fps withheld",
        }))
        sys.exit(1)

    doc = {
        "metric": "pipeline_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / base_fps, 2),
        "host_loop_frames_per_s": round(host_fps, 2),
        "scan_ate_rmse_m": round(res.rmse, 4),
        "baseline_note": base_note,
    }
    if base_range:
        doc["vs_baseline_range"] = [round(fps / base_range[1], 2),
                                    round(fps / base_range[0], 2)]
    print(json.dumps(doc))


if __name__ == "__main__":
    main()

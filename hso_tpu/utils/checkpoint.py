"""Map-state checkpoint / resume.

The reference has no persistence at all (SURVEY.md §5: "Checkpoint/resume:
None") — this saves the full sliding-window map (point table, keyframe poses
+ observation tables, seed state, pipeline counters) to one ``.npz`` so long
runs can resume; image pyramids are not saved (memoized host windows make
them unnecessary for matching — the first post-resume frame relocalizes
against the last keyframe).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def save_checkpoint(handler, path: str) -> None:
    pts = handler.points
    blobs = {
        # point table
        "pt_valid": pts.valid, "pt_type": pts.type, "pt_host_kf": pts.host_kf,
        "pt_host_px": pts.host_px, "pt_host_f": pts.host_f,
        "pt_host_level": pts.host_level, "pt_species": pts.species,
        "pt_grad": pts.grad, "pt_idist": pts.idist, "pt_host_win": pts.host_win,
        "pt_host_anchor": pts.host_anchor, "pt_n_succ": pts.n_succ,
        "pt_n_fail": pts.n_fail,
        "pt_patch_kf": pts.patch_kf, "pt_patch_px": pts.patch_px,
        "pt_patch_f": pts.patch_f, "pt_patch_level": pts.patch_level,
        "pt_patch_grad": pts.patch_grad, "pt_patch_win": pts.patch_win,
        "pt_patch_anchor": pts.patch_anchor,
        "pt_last_obs_kf": pts.last_obs_kf,
        # keyframes
        "kf_poses": handler.kfs.poses, "kf_exposure": handler.kfs.exposure,
        "kf_count": np.int64(len(handler.kfs.frames)),
        # pipeline scalars
        "batch_counter": np.int64(handler.batch_counter),
        "frame_count": np.int64(handler.frame_count),
        "seed_ring": handler.seed_ring,
        "motion_model": handler.motion_model,
        "mean_converge_frames": np.float64(handler.mean_converge_frames),
    }
    for i, kf in enumerate(handler.kfs.frames):
        blobs[f"kf{i}_T"] = kf.T_f_w
        blobs[f"kf{i}_ts"] = np.float64(kf.timestamp)
        for k, v in kf.obs.items():
            blobs[f"kf{i}_obs_{k}"] = v
    # last keyframe's image pyramid: lets the photometric relocalizer run
    # right after resume (coarse levels give a wide convergence basin)
    last = handler.kfs.frames[-1] if handler.kfs.frames else None
    if last is not None and last.data is not None:
        for l, img in enumerate(last.data["pyr"]):
            blobs[f"lastkf_pyr_{l}"] = np.asarray(img)
        blobs["lastkf_stats"] = np.array(
            [last.grad_mean, last.intensity_mean, last.exposure]
        )
    for k, v in handler.seeds.items():
        blobs[f"seed_{k}"] = np.asarray(v)
    # uncompressed: the bulk is float32 image windows (high-entropy), where
    # deflate costs minutes for a few percent — store raw
    np.savez(path, **blobs)


def load_checkpoint(handler, path: str, resume_stage: str | None = None) -> None:
    """Restore map state into a fresh FrameHandler (same cam/config).

    ``resume_stage="default"`` resumes straight into the default tracking
    path (valid only when the next fed frame is temporally adjacent to the
    checkpointed last keyframe, whose pyramid is stored — e.g. the bench
    bootstrap snapshot); the default ``None`` re-enters via RELOCALIZING,
    the safe choice after arbitrary downtime."""
    from hso_tpu.mapmodel.structures import Frame, empty_obs
    from hso_tpu.pipeline.frame_handler import STAGE_DEFAULT, STAGE_RELOC

    z = np.load(path, allow_pickle=False)
    pts = handler.points
    pts.valid = z["pt_valid"].copy()
    pts.type = z["pt_type"].copy()
    pts.host_kf = z["pt_host_kf"].copy()
    pts.host_px = z["pt_host_px"].copy()
    pts.host_f = z["pt_host_f"].copy()
    pts.host_level = z["pt_host_level"].copy()
    pts.species = z["pt_species"].copy()
    pts.grad = z["pt_grad"].copy()
    pts.idist = z["pt_idist"].copy()
    pts.host_win = z["pt_host_win"].copy()
    pts.host_anchor = z["pt_host_anchor"].copy()
    pts.n_succ = z["pt_n_succ"].copy()
    pts.n_fail = z["pt_n_fail"].copy()
    if "pt_patch_kf" in z.files:
        pts.patch_kf = z["pt_patch_kf"].copy()
        pts.patch_px = z["pt_patch_px"].copy()
        pts.patch_f = z["pt_patch_f"].copy()
        pts.patch_level = z["pt_patch_level"].copy()
        pts.patch_grad = z["pt_patch_grad"].copy()
        pts.patch_win = z["pt_patch_win"].copy()
        pts.patch_anchor = z["pt_patch_anchor"].copy()
    else:  # checkpoints written before patch sources existed
        pts.init_patch_from_host(np.arange(pts.p_max))
    if "pt_last_obs_kf" in z.files:
        pts.last_obs_kf = z["pt_last_obs_kf"].copy()
    pts._free = [i for i in range(pts.p_max - 1, -1, -1) if not pts.valid[i]]

    handler.kfs.poses = z["kf_poses"].copy()
    handler.kfs.exposure = z["kf_exposure"].copy()
    n_kf = int(z["kf_count"])
    handler.kfs.frames = []
    for i in range(n_kf):
        obs = empty_obs(handler._n_obs_pad)
        for k in obs:
            obs[k] = z[f"kf{i}_obs_{k}"].copy()
        f = Frame(
            frame_id=-1, timestamp=float(z[f"kf{i}_ts"]),
            T_f_w=z[f"kf{i}_T"].copy(), data=None, obs=obs,
            is_keyframe=True, kf_index=i,
        )
        handler.kfs.frames.append(f)

    # rebuild the inverted point→(kf, slot) observation index from the
    # restored forward tables (it is derived state, not serialized)
    pts.obs_refs = [[] for _ in range(pts.p_max)]
    for f in handler.kfs.frames:
        pts.register_obs(f)

    if "lastkf_pyr_0" in z.files and handler.kfs.frames:
        pyr = []
        l = 0
        while f"lastkf_pyr_{l}" in z.files:
            pyr.append(jnp.asarray(z[f"lastkf_pyr_{l}"]))
            l += 1
        last = handler.kfs.frames[-1]
        last.data = {"pyr": tuple(pyr)}
        gm, im, exp = z["lastkf_stats"]
        last.grad_mean = float(gm)
        last.intensity_mean = float(im)
        last.exposure = float(exp)

    handler.seeds = {
        k[len("seed_"):]: jnp.asarray(z[k]) for k in z.files if k.startswith("seed_")
    }
    handler.batch_counter = int(z["batch_counter"])
    handler.frame_count = int(z["frame_count"])
    handler.seed_ring = z["seed_ring"].copy()
    handler.motion_model = z["motion_model"].copy()
    handler.mean_converge_frames = float(z["mean_converge_frames"])
    handler.last_frame = handler.kfs.frames[-1] if handler.kfs.frames else None
    if (resume_stage == "default" and handler.last_frame is not None
            and handler.last_frame.data is not None):
        handler.stage = STAGE_DEFAULT
    else:
        handler.stage = STAGE_RELOC

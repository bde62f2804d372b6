import numpy as np
import jax.numpy as jnp

from hso_tpu.math import se3np
from hso_tpu.track.pose_optimizer import optimize_pose

FOCAL = 450.0


def make_problem(n=150, seed=0, noise_px=0.3, outlier_frac=0.0, edge_frac=0.3):
    rng = np.random.default_rng(seed)
    p_w = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)],
        axis=-1,
    )
    T_gt = se3np.exp(np.r_[0.1, -0.05, 0.02, 0.01, 0.02, -0.015])
    p_c = se3np.apply(T_gt, p_w)
    uv = p_c[:, :2] / p_c[:, 2:3]
    uv_noisy = uv + rng.normal(0, noise_px / FOCAL, (n, 2))
    n_out = int(n * outlier_frac)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv_noisy[idx] += rng.uniform(8, 25, (n_out, 2)) / FOCAL * rng.choice([-1, 1], (n_out, 2))
    f_obs = np.concatenate([uv_noisy, np.ones((n, 1))], axis=-1)
    f_obs /= np.linalg.norm(f_obs, axis=-1, keepdims=True)

    is_edge = rng.uniform(size=n) < edge_frac
    grad = rng.normal(size=(n, 2))
    grad /= np.linalg.norm(grad, axis=-1, keepdims=True)
    level = rng.integers(0, 3, n)
    return dict(
        T_gt=T_gt, p_world=p_w.astype(np.float32), f_obs=f_obs.astype(np.float32),
        level=level.astype(np.int32), grad=grad.astype(np.float32),
        is_edgelet=is_edge, is_temporary=np.zeros(n, bool), valid=np.ones(n, bool),
        outlier_idx=idx if n_out else np.array([], int),
    )


def run(prob, T_init):
    return optimize_pose(
        jnp.asarray(T_init, jnp.float32),
        jnp.asarray(prob["p_world"]),
        jnp.asarray(prob["f_obs"]),
        jnp.asarray(prob["level"]),
        jnp.asarray(prob["grad"]),
        jnp.asarray(prob["is_edgelet"]),
        jnp.asarray(prob["is_temporary"]),
        jnp.asarray(prob["valid"]),
        focal=FOCAL,
    )


def test_converges_from_perturbed_init():
    prob = make_problem(noise_px=0.2)
    T_init = se3np.mul(se3np.exp(np.r_[0.02, -0.01, 0.015, 0.004, -0.006, 0.008]), prob["T_gt"])
    out = run(prob, T_init)
    T_est = np.asarray(out["T_f_w"], np.float64)
    err = se3np.log(se3np.mul(T_est, se3np.inv(prob["T_gt"])))
    assert np.linalg.norm(err[:3]) < 2e-3
    assert np.linalg.norm(err[3:]) < 5e-4
    assert float(out["err_final_px"]) < 1.0
    assert int(out["n_inliers"]) > 120


def test_outliers_are_stripped():
    prob = make_problem(noise_px=0.2, outlier_frac=0.15, seed=3)
    T_init = se3np.mul(se3np.exp(np.r_[0.01, 0.01, -0.01, 0.003, 0.002, -0.004]), prob["T_gt"])
    out = run(prob, T_init)
    T_est = np.asarray(out["T_f_w"], np.float64)
    err = se3np.log(se3np.mul(T_est, se3np.inv(prob["T_gt"])))
    assert np.linalg.norm(err) < 5e-3, err
    inlier = np.asarray(out["inlier"])
    # most outliers rejected
    assert inlier[prob["outlier_idx"]].mean() < 0.2
    # most inliers kept
    keep = np.ones(len(inlier), bool)
    keep[prob["outlier_idx"]] = False
    assert inlier[keep].mean() > 0.8


def test_invalid_slots_have_no_influence():
    prob = make_problem(seed=5)
    # poison half the slots but mark invalid
    n = len(prob["valid"])
    prob2 = {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in prob.items()}
    prob2["valid"][: n // 2] = False
    prob2["p_world"][: n // 2] = 1e6
    T_init = se3np.mul(se3np.exp(np.r_[0.02, 0, 0, 0, 0.005, 0]), prob["T_gt"])
    out = run(prob2, T_init)
    T_est = np.asarray(out["T_f_w"], np.float64)
    err = se3np.log(se3np.mul(T_est, se3np.inv(prob["T_gt"])))
    assert np.linalg.norm(err) < 5e-3
    assert np.isfinite(np.asarray(out["cov"])).all()


def test_edgelets_only_constrain_normal_direction():
    """With all-edgelet observations sharing one normal the problem is
    degenerate along the orthogonal direction — solver must not blow up."""
    prob = make_problem(seed=7, edge_frac=1.0)
    prob["grad"][:] = np.array([1.0, 0.0])
    T_init = se3np.mul(se3np.exp(np.r_[0.005, 0.005, 0, 0, 0, 0]), prob["T_gt"])
    out = run(prob, T_init)
    assert np.isfinite(np.asarray(out["T_f_w"])).all()

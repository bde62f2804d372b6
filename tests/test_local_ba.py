import numpy as np
import jax
import jax.numpy as jnp

from hso_tpu.ba.local_ba import (
    local_bundle_adjustment,
    residuals_and_jacobians,
)
from hso_tpu.math import se3np

FOCAL = 450.0


def make_ba_problem(
    n_kf=6, n_pts=120, seed=0, noise_px=0.0, edge_frac=0.25,
    pose_pert=0.01, idist_pert=0.05, K=8, P=256,
):
    """Synthetic windowed BA with known ground truth, in the solver's dense
    (P, K) observation-grid layout (padded to slot sizes)."""
    assert n_kf <= K and n_pts <= P
    rng = np.random.default_rng(seed)
    # camera ring looking at a point cloud
    T_gt = []
    for k in range(n_kf):
        xi = np.r_[rng.uniform(-0.4, 0.4, 2), 0.05 * k, rng.uniform(-0.05, 0.05, 3)]
        T_gt.append(se3np.exp(xi))
    T_gt = np.stack(T_gt)

    p_w = np.stack(
        [rng.uniform(-2, 2, n_pts), rng.uniform(-2, 2, n_pts), rng.uniform(4, 8, n_pts)],
        axis=-1,
    )
    host = rng.integers(0, n_kf, n_pts)
    # host-frame bearings + gt inverse distance
    p_h = np.einsum("nij,nj->ni", T_gt[host][:, :3, :3], p_w) + T_gt[host][:, :3, 3]
    dist = np.linalg.norm(p_h, axis=-1)
    f_host = p_h / dist[:, None]
    idist_gt = 1.0 / dist

    # observations: every point seen in every other kf (z>0)
    meas = np.zeros((P, K, 2), np.float32)
    grad = np.zeros((P, K, 2), np.float32)
    is_edge = np.zeros((P, K), bool)
    level = np.zeros((P, K), np.int32)
    valid = np.zeros((P, K), bool)
    for k in range(n_kf):
        p_k = np.einsum("ij,nj->ni", T_gt[k][:3, :3], p_w) + T_gt[k][:3, 3]
        for p in range(n_pts):
            if k == host[p] or p_k[p, 2] < 0.1:
                continue
            uv = p_k[p, :2] / p_k[p, 2]
            meas[p, k] = uv + rng.normal(0, noise_px / FOCAL, 2)
            g = rng.normal(size=2)
            grad[p, k] = g / np.linalg.norm(g)
            is_edge[p, k] = rng.uniform() < edge_frac
            level[p, k] = rng.integers(0, 3)
            valid[p, k] = True

    f_host_pad = np.zeros((P, 3), np.float32)
    f_host_pad[:n_pts] = f_host
    host_pad = np.zeros(P, np.int32)
    host_pad[:n_pts] = host

    obs = {
        "meas": jnp.asarray(meas),
        "grad": jnp.asarray(grad),
        "is_edgelet": jnp.asarray(is_edge),
        "level": jnp.asarray(level),
        "valid": jnp.asarray(valid),
        "f_host": jnp.asarray(f_host_pad),
        "host": jnp.asarray(host_pad),
    }

    def pad(a, n, fill=0):
        a = np.asarray(a)
        out = np.full((n,) + a.shape[1:], fill, a.dtype)
        out[: len(a)] = a
        return out

    # perturb all but kf 0 and 1 (two fixed KFs anchor the monocular scale
    # gauge, like the window's out-of-horizon fixed keyframes)
    T_init = T_gt.copy()
    for k in range(2, n_kf):
        T_init[k] = se3np.mul(se3np.exp(rng.normal(0, pose_pert, 6)), T_gt[k])
    idist_init = idist_gt * (1.0 + rng.normal(0, idist_pert, n_pts))

    T_kf = pad(T_init.astype(np.float32), K)
    T_kf[n_kf:] = se3np.identity().astype(np.float32)
    free = np.zeros(K, bool)
    free[2:n_kf] = True

    return dict(
        T_gt=T_gt, idist_gt=idist_gt, obs=obs, n_kf=n_kf, n_pts=n_pts,
        T_kf=jnp.asarray(T_kf), free=jnp.asarray(free),
        idist=jnp.asarray(pad(idist_init.astype(np.float32), P)),
        point_valid=jnp.asarray(pad(np.ones(n_pts, bool), P)),
        K=K, P=P, host=host, f_host=f_host,
    )


def test_jacobians_match_autodiff():
    prob = make_ba_problem(n_kf=3, n_pts=10, P=16, K=4, noise_px=0.5)
    obs = prob["obs"]
    T_kf = prob["T_kf"]
    idist = prob["idist"]

    r0, J_rho, J_h, J_t, _ = residuals_and_jacobians(T_kf, idist, obs)

    from hso_tpu.math import se3

    def r_of(eps_rho, eps_kf):
        # perturb: idist += eps_rho[point]; T_k = exp(eps_kf[k]) T_k
        idist2 = idist + eps_rho
        T2 = se3.mul(se3.exp(eps_kf), T_kf)
        r, *_ = residuals_and_jacobians(T2, idist2, obs)
        return r

    eps_r = jnp.zeros_like(idist)
    eps_T = jnp.zeros((prob["K"], 6))
    Jr_auto = np.asarray(jax.jacfwd(lambda e: r_of(e, eps_T))(eps_r))   # (P,K,2,P)
    JT_auto = np.asarray(jax.jacfwd(lambda e: r_of(eps_r, e))(eps_T))   # (P,K,2,K,6)

    valid = np.asarray(obs["valid"])
    h_idx = np.asarray(obs["host"])
    for p, k in zip(*np.nonzero(valid)):
        np.testing.assert_allclose(
            np.asarray(J_rho)[p, k], Jr_auto[p, k, :, p], atol=1e-3, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(J_t)[p, k], JT_auto[p, k, :, k], atol=1e-3, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(J_h)[p, k], JT_auto[p, k, :, h_idx[p]], atol=1e-3, rtol=1e-3
        )


def pose_errors(T_est, T_gt, n_kf):
    errs = []
    for k in range(n_kf):
        errs.append(
            np.linalg.norm(
                se3np.log(se3np.mul(np.asarray(T_est[k], np.float64), se3np.inv(T_gt[k])))
            )
        )
    return np.array(errs)


def test_ba_converges_to_ground_truth():
    prob = make_ba_problem(noise_px=0.0)
    out = local_bundle_adjustment(
        prob["T_kf"], prob["free"], prob["idist"], prob["point_valid"],
        prob["obs"], n_kf=prob["K"], n_pts=prob["P"], n_iter=15, focal=FOCAL,
    )
    assert float(out["chi2_final"]) < float(out["chi2_init"]) * 1e-3
    errs = pose_errors(np.asarray(out["T_kf"]), prob["T_gt"], prob["n_kf"])
    assert errs.max() < 1e-3, errs
    id_err = np.abs(np.asarray(out["idist"])[: prob["n_pts"]] - prob["idist_gt"])
    assert np.median(id_err / prob["idist_gt"]) < 1e-3


def test_ba_with_noise_strips_nothing_spurious():
    prob = make_ba_problem(noise_px=0.4, seed=2)
    out = local_bundle_adjustment(
        prob["T_kf"], prob["free"], prob["idist"], prob["point_valid"],
        prob["obs"], n_kf=prob["K"], n_pts=prob["P"], n_iter=15, focal=FOCAL,
    )
    inl = np.asarray(out["obs_inlier"])
    val = np.asarray(prob["obs"]["valid"])
    assert inl[val].mean() > 0.95
    # solver must reach the noise floor: chi2 ≈ n_obs · sigma²
    noise_floor = val.sum() * (0.4 / FOCAL) ** 2
    assert float(out["chi2_final"]) < 2.0 * noise_floor
    errs = pose_errors(np.asarray(out["T_kf"]), prob["T_gt"], prob["n_kf"])
    # weak ring geometry: the ML estimate itself sits ~1e-2 from GT
    assert errs.max() < 2e-2, errs


def test_fixed_keyframe_stays_fixed():
    prob = make_ba_problem(seed=4)
    out = local_bundle_adjustment(
        prob["T_kf"], prob["free"], prob["idist"], prob["point_valid"],
        prob["obs"], n_kf=prob["K"], n_pts=prob["P"], n_iter=8, focal=FOCAL,
    )
    np.testing.assert_allclose(
        np.asarray(out["T_kf"])[0], np.asarray(prob["T_kf"])[0], atol=1e-7
    )

"""Distributed BA on a virtual 8-device CPU mesh, golden-tested against the
single-device solver (SURVEY.md §7 item 11)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from hso_tpu.ba.distributed import compute_deltas, make_distributed_ba, shard_obs
from hso_tpu.ba.local_ba import local_bundle_adjustment

from test_local_ba import FOCAL, make_ba_problem, pose_errors


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices("cpu")[:8])
    assert len(devs) == 8, "conftest must force 8 virtual CPU devices"
    return Mesh(devs, axis_names=("obs",))


def test_distributed_matches_single_device(mesh):
    prob = make_ba_problem(noise_px=0.3, seed=9, E=2048)
    obs = prob["obs"]

    ref = local_bundle_adjustment(
        prob["T_kf"], prob["free"], prob["idist"], prob["point_valid"],
        obs, n_kf=prob["K"], n_pts=prob["P"], n_iter=12, focal=FOCAL,
    )

    deltas = compute_deltas(prob["T_kf"], prob["idist"], obs, FOCAL)
    dba = make_distributed_ba(mesh, n_kf=prob["K"], n_pts=prob["P"], n_iter=12)
    obs_sh = shard_obs(obs, mesh)
    T_d, id_d, chi2_d = dba(
        prob["T_kf"], prob["free"], prob["idist"], prob["point_valid"],
        obs_sh, *deltas,
    )

    # both must reach (nearly) the same optimum
    np.testing.assert_allclose(
        float(chi2_d), float(ref["chi2_final"]), rtol=0.1, atol=1e-5
    )
    errs_ref = pose_errors(np.asarray(ref["T_kf"]), prob["T_gt"], prob["n_kf"])
    errs_d = pose_errors(np.asarray(T_d), prob["T_gt"], prob["n_kf"])
    assert errs_d.max() < max(2.0 * errs_ref.max(), 2e-2)
    # landmarks agree
    pv = np.asarray(prob["point_valid"])
    np.testing.assert_allclose(
        np.asarray(id_d)[pv], np.asarray(ref["idist"])[pv], rtol=0.05, atol=1e-3
    )


def test_distributed_convergence(mesh):
    prob = make_ba_problem(noise_px=0.0, seed=12, E=2048)
    obs = prob["obs"]
    deltas = compute_deltas(prob["T_kf"], prob["idist"], obs, FOCAL)
    dba = make_distributed_ba(mesh, n_kf=prob["K"], n_pts=prob["P"], n_iter=15)
    T_d, id_d, chi2_d = dba(
        prob["T_kf"], prob["free"], prob["idist"], prob["point_valid"],
        shard_obs(obs, mesh), *deltas,
    )
    errs = pose_errors(np.asarray(T_d), prob["T_gt"], prob["n_kf"])
    assert errs.max() < 2e-3, errs

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from hso_tpu.math import se3, se3np


def random_xi(rng, n=16, rot_scale=1.5, trans_scale=2.0):
    xi = rng.normal(size=(n, 6))
    xi[:, :3] *= trans_scale
    xi[:, 3:] *= rot_scale
    # keep |phi| < pi so log() returns the principal value we started from
    norm = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
    xi[:, 3:] *= np.where(norm > 3.0, 3.0 / norm, 1.0)
    return xi


@pytest.mark.parametrize("ns,tol", [(se3np, 1e-10), (se3, 1e-4)])
def test_exp_log_roundtrip(ns, tol, rng):
    xi = random_xi(rng)
    T = ns.exp(xi)
    xi2 = np.asarray(ns.log(T))
    np.testing.assert_allclose(xi2, xi, atol=tol * 50, rtol=tol * 50)
    # and exp(log(T)) == T regardless of wrap
    np.testing.assert_allclose(np.asarray(ns.exp(xi2)), np.asarray(T), atol=tol * 50)


def test_so3_exp_matches_scipy(rng):
    phi = rng.normal(size=(32, 3))
    R = se3np.so3_exp(phi)
    R_ref = Rotation.from_rotvec(phi).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-12)


def test_small_angle(rng):
    phi = rng.normal(size=(8, 3)) * 1e-9
    R = se3np.so3_exp(phi)
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), R.shape), atol=1e-8)
    xi = np.concatenate([rng.normal(size=(8, 3)), phi], axis=-1)
    np.testing.assert_allclose(se3np.log(se3np.exp(xi)), xi, atol=1e-8)


def test_mul_inv_apply(rng):
    A = se3np.exp(random_xi(rng, 4))
    B = se3np.exp(random_xi(rng, 4))
    p = rng.normal(size=(4, 3))
    np.testing.assert_allclose(
        se3np.apply(se3np.mul(A, B), p),
        se3np.apply(A, se3np.apply(B, p)),
        atol=1e-12,
    )
    I = se3np.mul(A, se3np.inv(A))
    np.testing.assert_allclose(I, se3np.identity((4,)), atol=1e-12)


def test_adjoint_identity(rng):
    """exp(Adj(T) xi) * T == T * exp(xi)."""
    T = se3np.exp(random_xi(rng, 6))
    xi = random_xi(rng, 6, rot_scale=0.3, trans_scale=0.5)
    adj_xi = np.einsum("nij,nj->ni", se3np.adjoint(T), xi)
    lhs = se3np.mul(se3np.exp(adj_xi), T)
    rhs = se3np.mul(T, se3np.exp(xi))
    np.testing.assert_allclose(lhs, rhs, atol=1e-9)


def test_jax_numpy_agree(rng):
    xi = random_xi(rng, 8).astype(np.float32)
    np.testing.assert_allclose(np.asarray(se3.exp(xi)), se3np.exp(xi), atol=1e-5)
    T = se3np.exp(xi)
    np.testing.assert_allclose(np.asarray(se3.log(T.astype(np.float32))), se3np.log(T), atol=1e-4)


def test_normalize(rng):
    T = se3np.exp(random_xi(rng, 5))
    T_drift = T.copy()
    T_drift[..., :3, :3] += rng.normal(size=(5, 3, 3)) * 1e-4
    Tn = se3np.normalize(T_drift)
    RtR = np.einsum("nij,nik->njk", Tn[..., :3, :3], Tn[..., :3, :3])
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-12)

"""SO(3)/SE(3) invariants (models reference test_audit_invariants.py exp/log
roundtrips incl. near-pi)."""

import numpy as np
import pytest

from gcslam_tpu.utils.xla import jnp
from gcslam_tpu.ops import se3

RNG = np.random.default_rng(0)


def rand_rotvec(scale=1.0, n=None):
    shape = (3,) if n is None else (n, 3)
    return jnp.asarray(RNG.normal(size=shape) * scale)


def rand_pose(n=None):
    shape = (6,) if n is None else (n, 6)
    p = RNG.normal(size=shape)
    return jnp.asarray(p)


def test_so3_exp_log_roundtrip():
    for scale in [1e-9, 1e-4, 0.5, 1.5, 3.0]:
        w = rand_rotvec(scale)
        R = se3.so3_exp(w)
        w2 = se3.so3_log(R)
        R2 = se3.so3_exp(w2)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-9)


def test_so3_log_near_pi():
    axis = np.array([1.0, 0.0, 0.0])
    w = jnp.asarray(axis * (np.pi - 1e-9))
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    R2 = se3.so3_exp(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-6)


def test_so3_orthonormality():
    w = rand_rotvec(2.0, n=32)
    R = se3.so3_exp(w)
    eye = np.broadcast_to(np.eye(3), (32, 3, 3))
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), eye, atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), np.ones(32), atol=1e-12)


def test_se3_exp_log_roundtrip():
    xi = rand_pose(16) * 0.8
    pose = se3.se3_exp(xi)
    xi2 = se3.se3_log(pose)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-9)


def test_se3_compose_inverse():
    a, b = rand_pose(8), rand_pose(8)
    ab = se3.se3_compose(a, b)
    a2 = se3.se3_compose(ab, se3.se3_inverse(b))
    # compare as transforms (rotvec may differ by 2pi wraps)
    Ra, Ra2 = se3.so3_exp(a[..., 3:6]), se3.so3_exp(a2[..., 3:6])
    np.testing.assert_allclose(np.asarray(Ra), np.asarray(Ra2), atol=1e-9)
    np.testing.assert_allclose(np.asarray(a[..., :3]), np.asarray(a2[..., :3]), atol=1e-9)


def test_se3_relative_identity():
    a = rand_pose(4)
    rel = se3.se3_relative(a, a)
    np.testing.assert_allclose(np.asarray(rel), np.zeros((4, 6)), atol=1e-9)


def test_right_jacobian_inverse_consistency():
    phi = rand_rotvec(1.2, n=8)
    J = se3.so3_right_jacobian(phi)
    J_inv = se3.so3_right_jacobian_inv(phi)
    eye = np.broadcast_to(np.eye(3), (8, 3, 3))
    np.testing.assert_allclose(np.asarray(J @ J_inv), eye, atol=1e-8)


def test_V_Vinv_consistency():
    phi = rand_rotvec(1.5, n=8)
    V = se3.se3_V(phi)
    V_inv = se3.se3_V_inv(phi)
    eye = np.broadcast_to(np.eye(3), (8, 3, 3))
    np.testing.assert_allclose(np.asarray(V @ V_inv), eye, atol=1e-8)


def test_adjoint_property():
    # Ad_T xi == Log(T Exp(xi) T^{-1}) for small xi
    T = rand_pose()
    xi = rand_pose() * 1e-3
    lhs = se3.se3_adjoint(T) @ xi
    rhs = se3.se3_log(
        se3.se3_compose(se3.se3_compose(T, se3.se3_exp(xi)), se3.se3_inverse(T))
    )
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)


def test_apply_pose_to_points():
    pose = jnp.asarray([1.0, 2.0, 3.0, 0.0, 0.0, np.pi / 2])
    pts = jnp.asarray([[1.0, 0.0, 0.0]])
    out = se3.apply_pose_to_points(pose, pts)
    np.testing.assert_allclose(np.asarray(out), [[1.0, 3.0, 3.0]], atol=1e-12)

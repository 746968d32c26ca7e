"""Rotation conversions vs scipy.spatial.transform.Rotation oracle."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as SR

from uvhand_tpu.geometry import rotations as rot


def random_rotvecs(rng, n=64, scale=np.pi * 0.9):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    angles = rng.uniform(-scale, scale, size=(n, 1))
    out = v * angles
    out[0] = 0.0  # exercise the small-angle path
    out[1] = [1e-8, 0, 0]
    return out


def test_axis_angle_to_matrix_matches_scipy(rng):
    aa = random_rotvecs(rng)
    ours = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(aa, jnp.float32)))
    ref = SR.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_matrix_to_axis_angle_roundtrip(rng):
    aa = random_rotvecs(rng)
    R = SR.from_rotvec(aa).as_matrix()
    back = np.asarray(rot.matrix_to_axis_angle(jnp.asarray(R, jnp.float32)))
    ref = SR.from_matrix(R).as_rotvec()
    # axis-angle is unique up to 2*pi; angles are < pi here
    np.testing.assert_allclose(back, ref, atol=1e-4)


def test_quaternion_matches_scipy(rng):
    aa = random_rotvecs(rng)
    q_ours = np.asarray(rot.axis_angle_to_quaternion(jnp.asarray(aa, jnp.float32)))
    q_ref = SR.from_rotvec(aa).as_quat()  # xyzw
    q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=1)  # -> wxyz
    sign = np.sign(q_ref[:, :1]) * np.sign(q_ours[:, :1])
    np.testing.assert_allclose(q_ours * sign, q_ref * np.sign(q_ref[:, :1]) ** 2, atol=2e-5)


def test_matrix_to_quaternion_all_branches(rng):
    # rotations near pi about each axis hit different Shepperd branches
    axes = np.eye(3)
    aa = np.concatenate([axes * (np.pi - 1e-3), random_rotvecs(rng, 32)], axis=0)
    R = SR.from_rotvec(aa).as_matrix()
    q = np.asarray(rot.matrix_to_quaternion(jnp.asarray(R, jnp.float32)))
    R_back = np.asarray(rot.quaternion_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_rotation_6d_roundtrip(rng):
    aa = random_rotvecs(rng)
    R = SR.from_rotvec(aa).as_matrix().astype(np.float32)
    d6 = rot.matrix_to_rotation_6d(jnp.asarray(R))
    R_back = np.asarray(rot.rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_quaternion_apply_matches_matrix(rng):
    aa = random_rotvecs(rng, 16)
    q = rot.axis_angle_to_quaternion(jnp.asarray(aa, jnp.float32))
    pts = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    via_q = np.asarray(rot.quaternion_apply(q, pts))
    via_m = np.einsum("bij,bj->bi", SR.from_rotvec(aa).as_matrix(), np.asarray(pts))
    np.testing.assert_allclose(via_q, via_m, atol=1e-5)


def test_euler_angles(rng):
    e = rng.uniform(-np.pi, np.pi, size=(32, 3))
    ours = np.asarray(rot.euler_angles_to_matrix(jnp.asarray(e, jnp.float32), "XYZ"))
    ref = SR.from_euler("xyz", e[:, ::-1] * 0 + e).as_matrix()  # intrinsic? check below
    # pytorch3d XYZ convention: R = Rx @ Ry @ Rz (extrinsic zyx == intrinsic XYZ)
    ref = SR.from_euler("XYZ", e).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)

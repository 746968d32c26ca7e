import numpy as np
import jax
import jax.numpy as jnp

from uvhand_tpu.geometry import aik, mano, objects, rotations


# ---------- MANO ----------

def test_mano_zero_pose_is_template():
    m = mano.synthetic_mano(0)
    B = 2
    verts, joints = mano.mano_forward(
        m,
        jnp.zeros((B, 3)),
        jnp.zeros((B, 45)),
        jnp.zeros((B, 10)),
        flat_hand_mean=True,  # no mean offset -> rest pose exactly
    )
    np.testing.assert_allclose(np.asarray(verts[0]), np.asarray(m.v_template), atol=1e-5)
    ref_joints = np.asarray(m.J_regressor) @ np.asarray(m.v_template)
    np.testing.assert_allclose(np.asarray(joints[0, :16]), ref_joints, atol=1e-5)
    # tips are the smplx vertex picks
    np.testing.assert_allclose(
        np.asarray(joints[0, 16:]),
        np.asarray(m.v_template)[list(mano.TIP_VERTEX_IDS)],
        atol=1e-5,
    )


def test_mano_global_orient_is_rigid():
    m = mano.synthetic_mano(1)
    aa = jnp.asarray([[0.3, -0.2, 0.5]], jnp.float32)
    R = np.asarray(rotations.axis_angle_to_matrix(aa))[0]
    v0, j0 = mano.mano_forward(m, jnp.zeros((1, 3)), jnp.zeros((1, 45)), jnp.zeros((1, 10)), flat_hand_mean=True)
    v1, j1 = mano.mano_forward(m, aa, jnp.zeros((1, 45)), jnp.zeros((1, 10)), flat_hand_mean=True)
    root = np.asarray(j0[0, 0])
    expect = (np.asarray(v0[0]) - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(v1[0]), expect, atol=1e-5)


def test_mano_rotmat_and_aa_paths_agree():
    m = mano.synthetic_mano(2)
    rng = np.random.default_rng(0)
    go = jnp.asarray(rng.normal(scale=0.5, size=(3, 3)), jnp.float32)
    hp = jnp.asarray(rng.normal(scale=0.3, size=(3, 45)), jnp.float32)
    betas = jnp.asarray(rng.normal(size=(3, 10)), jnp.float32)
    v_aa, j_aa = mano.mano_forward(m, go, hp, betas, flat_hand_mean=True)
    go_m = rotations.axis_angle_to_matrix(go)
    hp_m = rotations.axis_angle_to_matrix(hp.reshape(3, 15, 3))
    v_m, j_m = mano.mano_forward(m, go_m, hp_m, betas, pose_is_rotmat=True)
    np.testing.assert_allclose(np.asarray(v_aa), np.asarray(v_m), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_aa), np.asarray(j_m), atol=1e-5)


def test_mano_hands_mean_offset():
    m = mano.synthetic_mano(3)
    z = jnp.zeros((1, 45))
    v_flat, _ = mano.mano_forward(m, jnp.zeros((1, 3)), z, jnp.zeros((1, 10)), flat_hand_mean=True)
    v_mean, _ = mano.mano_forward(m, jnp.zeros((1, 3)), z, jnp.zeros((1, 10)), flat_hand_mean=False)
    v_explicit, _ = mano.mano_forward(
        m, jnp.zeros((1, 3)), m.hands_mean[None], jnp.zeros((1, 10)), flat_hand_mean=True
    )
    assert not np.allclose(np.asarray(v_flat), np.asarray(v_mean))
    np.testing.assert_allclose(np.asarray(v_mean), np.asarray(v_explicit), atol=1e-6)


def test_mano_jit_and_transl():
    m = mano.synthetic_mano(4)
    fwd = jax.jit(lambda go, hp, b, t: mano.mano_forward(m, go, hp, b, transl=t))
    v, j = fwd(jnp.zeros((2, 3)), jnp.zeros((2, 45)), jnp.zeros((2, 10)), jnp.ones((2, 3)))
    assert v.shape == (2, 778, 3) and j.shape == (2, 21, 3)
    v0, j0 = mano.mano_forward(m, jnp.zeros((2, 3)), jnp.zeros((2, 45)), jnp.zeros((2, 10)))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v0) + 1.0, atol=1e-5)


# ---------- ObjectBank ----------

def test_object_forward_identity():
    bank = objects.synthetic_object_bank(0)
    idx = jnp.asarray([0, 3, 7])
    out = objects.object_forward(
        bank, jnp.zeros((3, 1)), jnp.zeros((3, 3)), idx
    )
    np.testing.assert_allclose(np.asarray(out["v"]), np.asarray(bank.v[idx]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["kp3d"]),
        np.concatenate([np.asarray(bank.kp_top[idx]), np.asarray(bank.kp_bottom[idx])], 1),
        atol=1e-6,
    )


def test_object_articulation_only_moves_top():
    bank = objects.synthetic_object_bank(1)
    idx = jnp.asarray([2])
    out = objects.object_forward(bank, jnp.asarray([[0.7]]), jnp.zeros((1, 3)), idx)
    v0 = np.asarray(bank.v[idx])
    parts = np.asarray(bank.parts_ids[idx])
    v = np.asarray(out["v"])
    bottom = parts == 2
    np.testing.assert_allclose(v[bottom], v0[bottom], atol=1e-6)
    top = parts == 1
    assert np.abs(v[top] - v0[top]).max() > 1e-3
    # top part rotated about z-axis [0,0,-1]: z-coords unchanged
    np.testing.assert_allclose(v[top][:, 2], v0[top][:, 2], atol=1e-6)


def test_object_global_rot_and_transl():
    bank = objects.synthetic_object_bank(2)
    idx = jnp.asarray([5])
    aa = jnp.asarray([[0.2, 0.4, -0.1]], jnp.float32)
    t = jnp.asarray([[0.1, -0.2, 0.3]], jnp.float32)
    out = objects.object_forward(bank, jnp.zeros((1, 1)), aa, idx, transl=t)
    R = np.asarray(rotations.axis_angle_to_matrix(aa))[0]
    expect = np.asarray(bank.kp_bottom[idx])[0] @ R.T + np.asarray(t)
    np.testing.assert_allclose(np.asarray(out["kp3d"])[0, 16:], expect, atol=1e-5)


def test_object_matches_quaternion_formulation(rng):
    # reference applies quaternion rotations; ours matrices — must agree
    bank = objects.synthetic_object_bank(3)
    idx = jnp.asarray([1])
    ang = jnp.asarray([[0.5]])
    aa = jnp.asarray([[0.3, -0.6, 0.2]], jnp.float32)
    out = objects.object_forward(bank, ang, aa, idx)
    q_arti = rotations.axis_angle_to_quaternion(jnp.asarray(objects.Z_AXIS) * 0.5)
    q_glob = rotations.axis_angle_to_quaternion(aa[0])
    kp_top = bank.kp_top[idx][0]
    ref = rotations.quaternion_apply(q_glob, rotations.quaternion_apply(q_arti, kp_top))
    np.testing.assert_allclose(np.asarray(out["kp3d"])[0, :16], np.asarray(ref), atol=1e-5)


# ---------- AIK ----------

def test_aik_recovers_global_rotation():
    T = jnp.asarray(aik.TEMPLATE_RIGHT)
    aa = jnp.asarray([0.4, -0.3, 0.6], jnp.float32)
    R = rotations.axis_angle_to_matrix(aa)
    P = (T - T[0]) @ R.T + T[0]
    pose = aik.adaptive_ik(P[None])
    np.testing.assert_allclose(np.asarray(pose[0, :3]), np.asarray(aa), atol=1e-3)
    # local joints ~ identity
    assert np.abs(np.asarray(pose[0, 3:])).max() < 1e-2


def test_aik_fk_roundtrip(rng):
    # random swing pose -> FK -> IK -> FK reproduces joint positions
    pose = rng.normal(scale=0.25, size=(4, 48)).astype(np.float32)
    P = aik.aik_fk(jnp.asarray(pose))
    pose_rec = aik.adaptive_ik(P)
    P_rec = aik.aik_fk(pose_rec)
    np.testing.assert_allclose(np.asarray(P_rec), np.asarray(P), atol=5e-2)


def test_aik_jittable():
    P = jnp.asarray(aik.TEMPLATE_RIGHT)[None]
    pose = jax.jit(aik.adaptive_ik)(P)
    assert pose.shape == (1, 48)
    assert np.isfinite(np.asarray(pose)).all()

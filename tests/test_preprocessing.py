import numpy as np
import pytest
from scipy.spatial.transform import Rotation as SR

from uvhand_tpu.data import preprocessing as pp


def test_world_to_cam_and_project(rng):
    pts = rng.normal(size=(5, 3))
    R = SR.from_rotvec([0.2, -0.1, 0.3]).as_matrix()
    t = np.array([0.1, 0.2, 1.5])
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t
    cam = pp.world_to_cam(pts, w2c)
    np.testing.assert_allclose(cam, pts @ R.T + t, atol=1e-9)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    cam_front = cam + [0, 0, 5]
    uv = pp.project(cam_front, K)
    np.testing.assert_allclose(
        uv, cam_front[:, :2] / cam_front[:, 2:] * 500 + [320, 240], atol=1e-6
    )


def _raw_seq(rng, F=4, V=3):
    seq_world = {
        "joints.right": rng.normal(size=(F, 21, 3)) * 0.1,
        "joints.left": rng.normal(size=(F, 21, 3)) * 0.1,
        "kp3d": rng.normal(size=(F, 32, 3)) * 0.1,
        "bbox3d": rng.normal(size=(F, 16, 3)) * 0.1,
        "rot_r": rng.normal(size=(F, 3)) * 0.3,
        "rot_l": rng.normal(size=(F, 3)) * 0.3,
    }
    mk_w2c = lambda: np.block([
        [SR.from_rotvec(rng.normal(size=3) * 0.2).as_matrix(), np.array([[0.1], [0.0], [2.0]])],
        [np.zeros((1, 3)), np.ones((1, 1))],
    ])
    world2cam = [mk_w2c() for _ in range(V - 1)]
    K = np.array([[600.0, 0, 420], [0, 600.0, 300], [0, 0, 1]])
    ego = np.stack([mk_w2c() for _ in range(F)])
    return seq_world, world2cam, [K] * (V - 1), ego, np.tile(K, (F, 1, 1))


def test_process_sequence_schema(rng):
    F, V = 4, 3
    seq_world, w2c, Ks, ego, K_ego = _raw_seq(rng, F, V)
    params = {"pose_r": rng.normal(size=(F, 45)).astype(np.float32)}
    out = pp.process_sequence(seq_world, w2c, Ks, ego, K_ego, params, [[840, 600]] * V)
    assert out["cam_coord"]["joints.right"].shape == (F, V, 21, 3)
    assert out["2d"]["kp3d"].shape == (F, V, 32, 2)
    assert out["bbox"].shape == (F, V, 3)
    assert out["cam_coord"]["rot_r_cam"].shape == (F, V, 3)
    # cam-coord joints must match manual transform for view 1
    manual = pp.world_to_cam(seq_world["joints.right"][0], w2c[0])
    np.testing.assert_allclose(out["cam_coord"]["joints.right"][0, 1], manual, atol=1e-5)


def test_build_splits_disjoint(rng):
    imgnames = []
    dd = {}
    for sid in ("s01", "s05", "s06"):
        key = f"{sid}/box_use_01"
        dd[key] = {"dummy": 1}
        for v in (0, 1):
            for f in range(2):
                imgnames.append(f"./images/{sid}/box_use_01/{v}/{f:05d}.jpg")
    splits = pp.build_splits(dd, imgnames, "p1")
    tr = splits["train"]["imgnames"]
    va = splits["val"]["imgnames"]
    te = splits["test"]["imgnames"]
    assert all("/1/" in n for n in tr + va + te)  # p1: no ego views
    assert all("s05" in n for n in va)
    assert all("s06" in n for n in te)
    assert all("s01" in n for n in tr)

import numpy as np
import jax.numpy as jnp

from uvhand_tpu.evaluation.mdev import find_windows, compute_mdev, eval_motion_deviation
from uvhand_tpu.losses.penetration import penetration_loss, vertex_normals


def test_find_windows_basic():
    F, V = 40, 10
    dist = np.ones((F, V)) * 0.1
    idx = np.zeros((F, V), np.int64)
    # hand vertex 3 in contact with object vertex 7 during frames 5..29
    dist[5:30, 3] = 1e-4
    idx[5:30, 3] = 7
    vo = np.random.default_rng(0).normal(size=(20, 3))
    w = find_windows(dist, idx, vo, 3e-3, 15)
    assert w == [[5, 29, 3, 7]]


def test_find_windows_rejects_sliding():
    F, V = 40, 4
    dist = np.ones((F, V)) * 0.1
    idx = np.zeros((F, V), np.int64)
    dist[5:30, 1] = 1e-4
    # nearest object vertex changes wildly -> sliding -> rejected
    idx[5:30, 1] = np.arange(25) % 20
    vo = np.random.default_rng(0).normal(size=(20, 3)) * 1.0
    w = find_windows(dist, idx, vo, 3e-3, 15)
    assert w == []


def test_compute_mdev_zero_when_rigid():
    rng = np.random.default_rng(0)
    F = 30
    motion = np.cumsum(rng.normal(size=(F, 1, 3)) * 0.01, axis=0)
    vh = np.tile(motion, (1, 5, 1)) + rng.normal(size=(1, 5, 3))
    vo = np.tile(motion, (1, 8, 1)) + rng.normal(size=(1, 8, 3))
    windows = [[2, 25, 1, 3]]
    out = compute_mdev(windows, vh, vo, np.ones(F))
    np.testing.assert_allclose(out, 0.0, atol=1e-9)


def test_eval_motion_deviation_end_to_end():
    rng = np.random.default_rng(1)
    F = 40
    pred = {
        "mano.v3d.cam.r": rng.normal(size=(F, 778, 3)) * 0.01,
        "mano.v3d.cam.l": rng.normal(size=(F, 778, 3)) * 0.01,
        "object.v.cam": rng.normal(size=(F, 100, 3)) * 0.01,
    }
    dist = np.ones((F, 778)) * 0.1
    dist[5:30, 10] = 1e-4
    idx = np.zeros((F, 778), np.int64)
    targets = {
        "is_valid": np.ones(F), "right_valid": np.ones(F), "left_valid": np.ones(F),
        "dist.ro": dist, "idx.ro": idx,
        "dist.lo": np.ones((F, 778)) * 0.1, "idx.lo": idx,
        "object.v.cam": pred["object.v.cam"],
    }
    out = eval_motion_deviation(pred, targets)
    assert out["mdev/h"].shape[0] == 1
    assert np.isfinite(out["mdev/h"]).all()


def test_vertex_normals_sphere_point_outward():
    # icosahedron-ish: cube corners
    verts = np.array(
        [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
         [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float32
    )
    faces = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
         [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3]], np.int32
    )
    n = np.asarray(vertex_normals(jnp.asarray(verts)[None], jnp.asarray(faces)))[0]
    # outward: dot(normal, vertex) > 0 for a convex shape centered at origin
    assert (np.sum(n * verts, -1) > 0).all()


def test_penetration_loss_detects_interior(rng):
    verts = jnp.asarray(np.array(
        [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
         [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float32
    ))[None]
    faces = jnp.asarray(np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
         [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3]], np.int32
    ))
    inside = jnp.zeros((1, 1, 3))  # center: interior
    outside = jnp.full((1, 1, 3), 5.0)
    ones = jnp.ones((1,))
    li = float(penetration_loss(faces, verts, inside, jnp.ones((1, 1)), ones, ones))
    lo = float(penetration_loss(faces, verts, outside, jnp.ones((1, 1)), ones, ones))
    assert li > 0
    assert lo == 0.0

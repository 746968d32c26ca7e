"""Hand-object penetration loss.

Parity with `compute_penetration_loss` / `penetration_loss` / `get_NN`
(`/root/reference/arctic_tools/src/utils/loss_modules.py:80-160`): object
vertices whose nearest hand vertex's outward normal points toward them are
"interior"; their (squared) NN distances are summed * 120 / B. The pytorch3d
`Meshes.verts_normals_packed` becomes a segment-sum of face normals;
`knn_points` becomes a blocked distance matrix (778 x ~4k — one matmul).

Defined-but-unweighted in the reference training config (weight commented
out); provided for full capability parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals. verts (B, V, 3), faces (F, 3) int."""
    v0 = verts[:, faces[:, 0]]
    v1 = verts[:, faces[:, 1]]
    v2 = verts[:, faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # (B, F, 3) area-weighted
    V = verts.shape[1]

    def accum(face_normals):
        out = jnp.zeros((V, 3), verts.dtype)
        for k in range(3):
            out = out.at[faces[:, k]].add(face_normals)
        return out

    n = jax.vmap(accum)(fn)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def nearest_hand_for_object(obj_v, hand_v):
    """get_NN: nearest hand vertex (squared dist + idx) per object vertex."""
    d2 = (
        jnp.sum(obj_v**2, -1)[:, :, None]
        + jnp.sum(hand_v**2, -1)[:, None, :]
        - 2 * jnp.einsum("bnc,bmc->bnm", obj_v, hand_v, precision=_HI)
    )
    idx = jnp.argmin(d2, -1)
    dist = jnp.take_along_axis(d2, idx[..., None], -1)[..., 0]
    return jnp.maximum(dist, 0.0), idx.astype(jnp.int32)


def penetration_loss(
    hand_faces: jnp.ndarray,  # (F, 3)
    hand_v: jnp.ndarray,  # (B, 778, 3) cam space
    obj_v: jnp.ndarray,  # (B, Vo, 3) cam space (padded)
    obj_mask: jnp.ndarray,  # (B, Vo) 1 = real vertex
    is_valid: jnp.ndarray,
    hand_valid: jnp.ndarray,
) -> jnp.ndarray:
    nn_dist, nn_idx = nearest_hand_for_object(obj_v, hand_v)
    normals = vertex_normals(hand_v, hand_faces)
    nn_xyz = jnp.take_along_axis(hand_v, nn_idx[..., None], axis=1)
    nn_normal = jnp.take_along_axis(normals, nn_idx[..., None], axis=1)
    interior = jnp.sum((nn_xyz - obj_v) * nn_normal, -1) > 0
    valid = (hand_valid * is_valid)[:, None] > 0
    interior = interior & valid & (obj_mask > 0)
    B = hand_v.shape[0]
    return 120.0 * jnp.sum(nn_dist * interior) / B

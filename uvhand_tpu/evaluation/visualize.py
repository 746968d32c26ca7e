"""Visualization: 2D keypoint overlays and 3D mesh export.

The reference renders meshes with aitviewer's HeadlessRenderer
(`/root/reference/arctic_tools/visualizer.py:73`) and draws 2D keypoints
with cv2 (`util/tools.py:308-377`). There is no TPU/headless-GL analog in
this image, so the capability is provided as:
  - `draw_keypoints_2d`: cv2 overlay of normalized keypoints on the input
    crop (hands 21, object 32, bbox 16),
  - `export_obj` / `export_scene`: per-frame wavefront OBJ dumps of the
    predicted MANO + object meshes (loadable in any viewer).
"""

from __future__ import annotations

import os
import os.path as op

import numpy as np

HAND_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4),
    (0, 5), (5, 6), (6, 7), (7, 8),
    (0, 9), (9, 10), (10, 11), (11, 12),
    (0, 13), (13, 14), (14, 15), (15, 16),
    (0, 17), (17, 18), (18, 19), (19, 20),
]


def denormalize_image(img_norm: np.ndarray) -> np.ndarray:
    """Invert ImageNet normalization -> uint8 RGB."""
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    img = np.clip((img_norm * std + mean) * 255.0, 0, 255)
    return img.astype(np.uint8)


def draw_keypoints_2d(img_norm, kp2d_norm_dict, img_res: int = 224) -> np.ndarray:
    """img (H, W, 3) normalized; kp2d dict of (N, 2) in [-1, 1] patch coords.
    Colors: right hand red, left green, object blue."""
    import cv2

    img = denormalize_image(np.asarray(img_norm)).copy()
    colors = {"r": (255, 60, 60), "l": (60, 220, 60), "o": (80, 120, 255)}
    for key, kp in kp2d_norm_dict.items():
        kp = np.asarray(kp)
        px = (0.5 * img_res * (kp + 1)).astype(int)
        c = colors.get(key[-1], (255, 255, 0))
        if kp.shape[0] == 21:
            for a, b in HAND_EDGES:
                cv2.line(img, tuple(px[a]), tuple(px[b]), c, 1)
        for p in px:
            cv2.circle(img, tuple(p), 2, c, -1)
    return img


def export_obj(path: str, verts: np.ndarray, faces: np.ndarray | None = None):
    os.makedirs(op.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for v in np.asarray(verts):
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        if faces is not None:
            for tri in np.asarray(faces):
                f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")


def export_scene(out_dir: str, frame_idx: int, pred: dict,
                 mano_faces_r=None, mano_faces_l=None, obj_faces=None):
    """Dump one frame's predicted meshes (cam space) as OBJ files."""
    base = op.join(out_dir, f"{frame_idx:05d}")
    export_obj(base + "_hand_r.obj", np.asarray(pred["mano.v3d.cam.r"])[frame_idx], mano_faces_r)
    export_obj(base + "_hand_l.obj", np.asarray(pred["mano.v3d.cam.l"])[frame_idx], mano_faces_l)
    v = np.asarray(pred["object.v.cam"])[frame_idx]
    vlen = int(np.asarray(pred["object.v_len"])[frame_idx]) if "object.v_len" in pred else len(v)
    export_obj(base + "_object.obj", v[:vlen], obj_faces)
    return base

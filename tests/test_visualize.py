import numpy as np

from uvhand_tpu.evaluation.visualize import (
    denormalize_image, draw_keypoints_2d, export_obj, export_scene,
)


def test_draw_keypoints(rng, tmp_path):
    img = rng.normal(size=(224, 224, 3)).astype(np.float32)
    kp = {"j2d.r": rng.uniform(-0.9, 0.9, (21, 2)), "kp2d.o": rng.uniform(-0.9, 0.9, (32, 2))}
    out = draw_keypoints_2d(img, kp)
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8


def test_export_scene(rng, tmp_path):
    pred = {
        "mano.v3d.cam.r": rng.normal(size=(2, 778, 3)),
        "mano.v3d.cam.l": rng.normal(size=(2, 778, 3)),
        "object.v.cam": rng.normal(size=(2, 100, 3)),
        "object.v_len": np.array([60, 60]),
    }
    base = export_scene(str(tmp_path), 0, pred)
    with open(base + "_object.obj") as f:
        lines = f.readlines()
    assert len([l for l in lines if l.startswith("v ")]) == 60

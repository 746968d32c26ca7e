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


def test_save_eval_visualizations(tmp_path):
    """--visualization eval mode writes overlays + OBJ meshes."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from uvhand_tpu.data import arctic
    from uvhand_tpu.evaluation.visualize import save_eval_visualizations
    from uvhand_tpu.geometry import mano, objects
    from uvhand_tpu.models.detr import UVHandDETR

    root = str(tmp_path / "arc")
    arctic.make_synthetic_root(root, num_seqs=1, frames=4, views=1)
    bank = objects.synthetic_object_bank(2)
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    ds = arctic.ArcticDataset(root, "p1", "val",
                              kp3d_cano=np.asarray(bank.kp_bottom))
    model = UVHandDETR(num_queries=12, num_encoder_layers=1,
                       num_decoder_layers=1, d_model=64, dim_feedforward=64,
                       n_heads=4, dropout=0.0, feature_mask_ratio=0.0)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 224, 224, 3)))["params"]
    out = save_eval_visualizations(model, params, ds, mano_r, mano_l, bank,
                                   str(tmp_path / "vis"), 224.0,
                                   batch_size=2, max_frames=4)
    import os
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    objs = [f for f in os.listdir(out) if f.endswith(".obj")]
    assert len(pngs) == 4 and len(objs) >= 3


def test_zbuffer_mesh_render_occlusion():
    """Software rasterizer: front triangle wins the z-test, overlay lands
    only where geometry projects, Lambert shading stays in range."""
    import numpy as np
    from uvhand_tpu.evaluation.visualize import render_mesh_overlay

    img = np.zeros((224, 224, 3), np.float32)  # normalized-space black
    K = np.array([[1000.0, 0, 112], [0, 1000.0, 112], [0, 0, 1]], np.float32)

    def quad(z, half, color):
        v = np.array([
            [-half, -half, z], [half, -half, z],
            [half, half, z], [-half, half, z],
        ], np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]])
        return (v, f, color)

    near = quad(0.5, 0.02, (255, 0, 0))    # small red, near
    far = quad(1.0, 0.08, (0, 0, 255))     # large blue, far
    out = render_mesh_overlay(img, [far, near], K, alpha=1.0)

    c = out[112, 112]  # center: near red quad must occlude the far blue one
    assert c[0] > 60 and c[2] == 0, c
    edge = out[112, 112 + 60]  # inside blue quad (80px half at z=1), not red
    assert edge[2] > 60 and edge[0] == 0, edge
    corner = out[5, 5]  # outside both: untouched background (the
    # normalized-zero input denormalizes to the ImageNet mean color)
    from uvhand_tpu.evaluation.visualize import denormalize_image
    bg = denormalize_image(np.zeros((1, 1, 3), np.float32))[0, 0]
    assert (corner == bg).all(), (corner, bg)

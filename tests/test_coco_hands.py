import numpy as np
import jax
import jax.numpy as jnp

from uvhand_tpu.data import coco_hands
from uvhand_tpu.data.arctic import collate
from uvhand_tpu.models.assembly import AssemblyDETR, assembly_criterion


def test_coco_hands_pipeline(tmp_path):
    root = str(tmp_path / "h2o")
    coco_hands.make_synthetic_coco_root(root, n_images=4)
    ds = coco_hands.CocoHandsDataset(root, "train", img_res=64)
    assert len(ds) == 4
    s = ds[0]
    assert s["images"].shape == (64, 64, 3)
    assert s["keypoints63"].shape == (3, 63)
    assert s["target_valid"].all()
    # depth is root-relative
    assert abs(s["keypoints63"][0, 2]) < 1e-6

    batch = collate([ds[0], ds[1]])
    model = AssemblyDETR(num_classes=12, num_encoder_layers=1, num_decoder_layers=1, d_model=64)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["images"]))
    out = model.apply(params, jnp.asarray(batch["images"]))
    total, ld = assembly_criterion(
        out, jnp.asarray(batch["labels"]), jnp.asarray(batch["keypoints63"]),
        jnp.asarray(batch["target_valid"]),
    )
    assert np.isfinite(float(total))

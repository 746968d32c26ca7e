import numpy as np
import jax
import jax.numpy as jnp

from uvhand_tpu.cli.extract_features import extract_features, load_feature_maps
from uvhand_tpu.data import arctic
from uvhand_tpu.geometry import objects
from uvhand_tpu.models.detr import UVHandDETR


def test_extract_and_reload_features(tmp_path):
    root = str(tmp_path / "arctic")
    arctic.make_synthetic_root(root, num_seqs=1, frames=2, views=1)
    bank = objects.synthetic_object_bank(2)
    ds = arctic.ArcticDataset(root, "p1", "val", kp3d_cano=np.asarray(bank.kp_bottom))
    model = UVHandDETR(num_queries=8, num_encoder_layers=1, num_decoder_layers=1,
                       d_model=64, dim_feedforward=128, n_heads=4, dropout=0.0,
                       feature_mask_ratio=0.0)
    params = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 224, 224, 3)))
    out = extract_features(model, params, ds, str(tmp_path / "pickle"), split="val", batch_size=2)
    feats = load_feature_maps(str(tmp_path / "pickle"), ds.imgnames[:2], split="val")
    assert len(feats) == 3  # 3 backbone scales
    assert feats[0].shape == (2, 28, 28, 512)

    # feature_type='local_fm' path consumes these directly
    model_fm = UVHandDETR(num_queries=8, num_encoder_layers=1, num_decoder_layers=1,
                          d_model=64, dim_feedforward=128, n_heads=4, dropout=0.0,
                          feature_type="local_fm", num_feature_levels=3,
                          feature_mask_ratio=0.0)
    fm = [jnp.asarray(f) for f in feats]
    p2 = model_fm.init({"params": jax.random.PRNGKey(0)}, fm)
    out2 = model_fm.apply(p2, fm)
    assert out2["pred_logits"].shape[0] == 2

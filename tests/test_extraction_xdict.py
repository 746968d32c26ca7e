import numpy as np
import jax
import jax.numpy as jnp

from uvhand_tpu.utils.xdict import xdict
from uvhand_tpu.cli.extract_predicts import std_interface, save_results, run_extraction


def test_xdict_ops():
    d = xdict({"a.x": np.ones(3), "a.y": np.zeros(3), "b": 2.0})
    assert set(d.search("a.").keys()) == {"a.x", "a.y"}
    assert set(d.search("a.", replace_to="").keys()) == {"x", "y"}
    p = d.prefix("pred.")
    assert "pred.a.x" in p
    m = d.mul(2.0)
    assert float(m["b"]) == 4.0
    d2 = xdict({"c": 1}).merge(xdict({"e": 2}))
    assert d2 == {"c": 1, "e": 2}


def test_std_interface_and_save(tmp_path):
    rng = np.random.default_rng(0)
    def batch(cam, frames):
        return {
            "pred.mano.cam_t.r": rng.normal(size=(len(frames), 3)).astype(np.float32),
            "meta_info.imgname": [f"./images/s01/box_use_01/{cam}/{f:05d}.jpg" for f in frames],
        }
    out_list = [batch(1, [0, 1]), batch(2, [0, 1]), batch(1, [2]), batch(2, [2])]
    out_cam = std_interface(out_list)
    assert set(out_cam.keys()) == {"s01_box_use_01_1", "s01_box_use_01_2"}
    assert len(out_cam["s01_box_use_01_1"]["meta_info.imgname"]) == 3
    save_results(out_cam, str(tmp_path))
    import torch
    t = torch.load(str(tmp_path / "s01_box_use_01_1/preds/pred.mano.cam_t.r.pt"))
    assert t.dtype == torch.float16 and t.shape == (3, 3)


def test_run_extraction_end_to_end(tmp_path):
    from uvhand_tpu.data import arctic
    from uvhand_tpu.geometry import objects
    from uvhand_tpu.models.detr import UVHandDETR

    root = str(tmp_path / "arctic")
    arctic.make_synthetic_root(root, num_seqs=1, frames=3, views=1)
    bank = objects.synthetic_object_bank(2)
    ds = arctic.ArcticDataset(root, "p1", "val", kp3d_cano=np.asarray(bank.kp_bottom))
    model = UVHandDETR(num_queries=8, num_encoder_layers=1, num_decoder_layers=2,
                       d_model=64, dim_feedforward=128, n_heads=4, dropout=0.0,
                       feature_mask_ratio=0.0)
    params = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 224, 224, 3)))
    out = run_extraction(model, params, ds, batch_size=2, out_dir=str(tmp_path / "sub"))
    import torch
    found = list((tmp_path / "sub").rglob("pred.object.radian.pt"))
    assert len(found) == 1
    t = torch.load(found[0])
    assert t.shape[0] == 3  # frames

import numpy as np
import jax.numpy as jnp

from uvhand_tpu.utils.slconfig import SLConfig
from uvhand_tpu.utils.tools import arctic_smoothing, create_loss_dict, extract_epoch
from uvhand_tpu.geometry.mano import seal_mano_mesh, decimate_verts


def test_slconfig_inheritance():
    cfg = SLConfig.fromfile("configs/DINO/DINO_4scale_swin.py")
    assert cfg["backbone"] == "swin_L_384_22k"  # child wins
    assert cfg["hidden_dim"] == 256  # from base-of-base
    assert cfg["use_dn"] is True
    cfg.merge_from_list(["dn_number=50", "lr=0.001"])
    assert cfg["dn_number"] == 50 and cfg["lr"] == 0.001


def test_arctic_smoothing_matches_reference_loop(rng):
    x = rng.normal(size=(2, 6, 3)).astype(np.float32)
    ours = np.asarray(arctic_smoothing(jnp.asarray(x), 2)).reshape(2, 6, 3)
    # reference triple loop
    ref = x.transpose(0, 2, 1).copy()
    for _ in range(2):
        for b in range(2):
            for i in range(6 - 1):
                avg = (ref[b, :, i + 1] + ref[b, :, i]) / 2
                ref[b, :, i + 1] = avg
                ref[b, :, i] = avg
    ref = ref.transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_create_loss_dict():
    ld = {"total": 5.0, "loss_ce": 1.0, "loss/cd": 2.0, "loss/mano/pose/r": 0.5,
          "loss/mano/beta/r": 0.1}
    out = create_loss_dict(5.0, ld)
    assert out["loss"] == 5.0
    assert out["loss_CDev"] == 2.0
    assert abs(out["loss_mano"] - 0.6) < 1e-9


def test_extract_epoch():
    assert extract_epoch("exps/run/31.pth") == 31
    assert extract_epoch("exps/run/7") == 7


def test_seal_and_decimate(rng):
    v = jnp.asarray(rng.normal(size=(2, 778, 3)), jnp.float32)
    faces = np.zeros((1538, 3), np.int32)
    sealed, f2 = seal_mano_mesh(v, faces, True)
    assert sealed.shape == (2, 779, 3)
    assert f2.shape == (1538 + 16, 3)
    D = jnp.asarray(rng.random((195, 778)), jnp.float32)
    vs = decimate_verts(v, D)
    assert vs.shape == (2, 195, 3)

"""Eval-control surface: --eval_metrics / --test_viewpoint / --seq / --iter.

Parity targets: `/root/reference/util/settings.py:29-61` (flag definitions),
`arctic_dataset.py:424-438` (seq filter + aug off), `engine.py:222-230`
(eval-time arctic_smoothing passes + metric selection).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uvhand_tpu import engine
from uvhand_tpu.cli.main import get_args_parser
from uvhand_tpu.data import arctic, loader
from uvhand_tpu.geometry import mano, objects
from uvhand_tpu.models.detr import UVHandDETR


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("arctic_ec"))
    arctic.make_synthetic_root(d, num_seqs=2, frames=4, views=2)
    return d


def test_flag_surface():
    """Every reference eval-control flag parses with reference defaults."""
    p = get_args_parser()
    args = p.parse_args([])
    assert args.eval_metrics == [
        "aae", "mpjpe.ra", "mrrpe", "success_rate", "cdev", "mdev",
        "acc_err_pose",
    ]  # settings.py:29-30
    assert args.test_viewpoint is None and args.seq is None and args.iter == 0

    args = p.parse_args(
        ["--eval_metrics", "aae", "cdev", "--seq", "box_use_01",
         "--test_viewpoint", "s01/box_use_01/0", "--iter", "3"]
    )
    assert args.eval_metrics == ["aae", "cdev"]
    assert args.seq == "box_use_01" and args.iter == 3
    assert args.test_viewpoint == "s01/box_use_01/0"


def test_seq_filter_and_aug_off(root):
    bank = objects.synthetic_object_bank(2)
    full = arctic.ArcticDataset(root, "p1", "train",
                                kp3d_cano=np.asarray(bank.kp_bottom))
    seqs = sorted({n.split("/")[-3] for n in full.imgnames})
    assert len(seqs) == 2
    ds = arctic.ArcticDataset(root, "p1", "train", seq=seqs[0],
                              kp3d_cano=np.asarray(bank.kp_bottom))
    assert 0 < len(ds) < len(full)
    assert all("/" + seqs[0] + "/" in n for n in ds.imgnames)
    assert ds.aug is False  # seq filter disables augmentation (ref :437-438)


def test_viewpoint_filter(root):
    bank = objects.synthetic_object_bank(2)
    full = arctic.ArcticDataset(root, "p1", "val",
                                kp3d_cano=np.asarray(bank.kp_bottom))
    sid, seq, view, _ = full.imgnames[0].split("/")[-4:]
    vp = f"{sid}/{seq}/{view}"
    ds = arctic.ArcticDataset(root, "p1", "val", viewpoint=vp,
                              kp3d_cano=np.asarray(bank.kp_bottom))
    assert 0 < len(ds) < len(full)
    assert all(vp in n for n in ds.imgnames)


def test_eval_step_metric_selection_and_smoothing(root):
    bank = objects.synthetic_object_bank(2)
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    ds = arctic.ArcticDataset(root, "p1", "val",
                              kp3d_cano=np.asarray(bank.kp_bottom))
    model = UVHandDETR(
        num_queries=12, num_encoder_layers=1, num_decoder_layers=2,
        d_model=64, dim_feedforward=128, n_heads=4, dropout=0.0,
        feature_mask_ratio=0.0,
    )
    imgs = jnp.zeros((1, 224, 224, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, imgs)["params"]

    dl = loader.DataLoader(ds, batch_size=2, shuffle=False)
    batch = next(iter(loader.device_prefetch(dl)))

    # restricted metric set: only the requested groups come back; the
    # sequence-level names (mdev, acc_err_pose) are skipped per-batch
    step = engine.make_eval_step(
        model, mano_r, mano_l, bank,
        metrics=("aae", "cdev", "mdev", "acc_err_pose"),
    )
    out = {k: np.asarray(v) for k, v in step(params, batch).items()}
    assert set(out) == {"aae", "cdev/ho"}

    # --iter smoothing changes the vertex-dependent metrics but keeps shapes
    step_sm = engine.make_eval_step(
        model, mano_r, mano_l, bank, metrics=("cdev",), smooth_iter=2,
    )
    out_sm = {k: np.asarray(v) for k, v in step_sm(params, batch).items()}
    assert set(out_sm) == {"cdev/ho"}
    assert out_sm["cdev/ho"].shape == out["cdev/ho"].shape
    assert np.isfinite(out_sm["cdev/ho"]).any()
    assert not np.allclose(out_sm["cdev/ho"], out["cdev/ho"])

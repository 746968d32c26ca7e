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


def test_color_jitter_and_rotation_semantics(rng):
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    out = coco_hands.color_jitter(img, np.random.default_rng(0))
    assert out.shape == img.shape and out.min() >= 0 and out.max() <= 1
    assert not np.allclose(out, img)

    # rotation: a keypoint at the center is a fixed point; radius preserved
    kps = np.zeros((2, 5, 3), np.float32)
    kps[..., 0] = rng.uniform(10, 54, (2, 5))
    kps[..., 1] = rng.uniform(10, 54, (2, 5))
    kps[0, 0, :2] = (32.0, 32.0)
    kps[..., 2] = 7.0  # depth column must pass through untouched
    rimg, rkps = coco_hands.random_rotation(img, kps, np.random.default_rng(1), 45.0)
    assert rimg.shape == img.shape
    np.testing.assert_allclose(rkps[0, 0, :2], (32.0, 32.0), atol=1e-4)
    np.testing.assert_array_equal(rkps[..., 2], kps[..., 2])
    r0 = np.linalg.norm(kps[..., :2] - 32.0, axis=-1)
    r1 = np.linalg.norm(rkps[..., :2] - 32.0, axis=-1)
    np.testing.assert_allclose(r1, r0, rtol=1e-5)


def test_aug_dataset_keypoints_follow_image(tmp_path):
    """Augmented samples differ run to run; keypoints stay consistent with
    the un-augmented geometry under the same rotation (exact uv rotation)."""
    root = str(tmp_path / "h2o_aug")
    coco_hands.make_synthetic_coco_root(root, n_images=2)
    plain = coco_hands.CocoHandsDataset(root, "train", img_res=64)
    auged = coco_hands.CocoHandsDataset(root, "train", img_res=64, aug=True, seed=3)
    s0, s1 = plain[0], auged[0]
    assert not np.allclose(s0["images"], s1["images"])
    # rotation about the center preserves uv radius from center (0.5, 0.5)
    k0 = s0["keypoints63"].reshape(3, 21, 3)
    k1 = s1["keypoints63"].reshape(3, 21, 3)
    r0 = np.linalg.norm(k0[..., :2] - 0.5, axis=-1)
    r1 = np.linalg.norm(k1[..., :2] - 0.5, axis=-1)
    np.testing.assert_allclose(r1, r0, rtol=1e-3, atol=1e-5)
    # depth untouched by the 2D augmentation
    np.testing.assert_allclose(k1[..., 2], k0[..., 2], atol=1e-6)


def test_coco_cli_train_smoke(tmp_path, monkeypatch):
    """--dataset_file H2O drives the COCO path end-to-end (train + eval)."""
    from uvhand_tpu.cli.main import get_args_parser, main

    root = str(tmp_path / "data" / "H2O")
    coco_hands.make_synthetic_coco_root(root, n_images=4)
    argv = [
        "--dataset_file", "H2O", "--coco_path", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "out"), "--img_res", "64",
        "--batch_size", "2", "--val_batch_size", "2", "--epochs", "1",
        "--enc_layers", "1", "--dec_layers", "1", "--hidden_dim", "64",
        "--dim_feedforward", "64", "--nheads", "4",
        "--debug", "--num_debug", "1",
    ]
    args = get_args_parser().parse_args(argv)
    main(args)  # train one debug step + checkpoint
    args = get_args_parser().parse_args(argv + ["--eval"])
    scores = main(args)
    assert scores and all(np.isfinite(v) for v in scores.values())


def test_cache_mode_consistency(tmp_path):
    """--cache_mode returns identical samples without re-decoding."""
    root = str(tmp_path / "h2o_cache")
    coco_hands.make_synthetic_coco_root(root, n_images=2)
    plain = coco_hands.CocoHandsDataset(root, "val", img_res=64)
    cached = coco_hands.CocoHandsDataset(root, "val", img_res=64, cache_mode=True)
    a, b = plain[0], cached[0]
    np.testing.assert_allclose(a["images"], b["images"])
    c = cached[0]  # second read comes from the cache
    np.testing.assert_allclose(b["images"], c["images"])
    assert 0 in cached._img_cache

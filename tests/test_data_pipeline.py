"""End-to-end data pipeline on a synthetic ARCTIC-layout root."""

import numpy as np
import jax.numpy as jnp
import pytest

from uvhand_tpu.data import arctic, loader, process
from uvhand_tpu.geometry import mano, objects


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("arctic"))
    arctic.make_synthetic_root(d)
    return d


@pytest.fixture(scope="module")
def world():
    bank = objects.synthetic_object_bank(2)
    return (
        mano.synthetic_mano(0, True),
        mano.synthetic_mano(1, False),
        bank,
        np.asarray(bank.kp_bottom),
    )


def test_dataset_deterministic(root, world):
    _, _, _, cano = world
    ds1 = arctic.ArcticDataset(root, "p1", "train", kp3d_cano=cano, seed=7)
    ds2 = arctic.ArcticDataset(root, "p1", "train", kp3d_cano=cano, seed=7)
    a, b = ds1[3], ds2[3]
    np.testing.assert_array_equal(a["images"], b["images"])
    np.testing.assert_array_equal(a["mano.pose.r"], b["mano.pose.r"])
    ds3 = arctic.ArcticDataset(root, "p1", "train", kp3d_cano=cano, seed=8)
    assert np.abs(ds3[3]["images"] - a["images"]).max() > 0  # different aug


def test_val_no_augmentation(root, world):
    _, _, _, cano = world
    ds = arctic.ArcticDataset(root, "p1", "val", kp3d_cano=cano)
    a = ds[0]
    ds2 = arctic.ArcticDataset(root, "p1", "val", kp3d_cano=cano, seed=99)
    np.testing.assert_array_equal(a["images"], ds2[0]["images"])


def test_loader_and_process_to_criterion_schema(root, world):
    mano_r, mano_l, bank, cano = world
    ds = arctic.ArcticDataset(root, "p1", "train", kp3d_cano=cano)
    dl = loader.DataLoader(ds, batch_size=4, num_workers=2)
    batch = next(iter(dl))
    assert batch["images"].shape == (4, 224, 224, 3)
    assert batch["labels"].shape == (4, 3)

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    targets = process.process_targets(jb, mano_r, mano_l, bank)
    for key in ["mano.j3d.cam.r", "mano.cam_t.wp.r", "object.kp3d.cam",
                "object.kp2d.norm", "dist.ro", "idx.ro"]:
        assert key in targets, key
        assert np.isfinite(np.asarray(targets[key])).all(), key


def test_device_prefetch(root, world):
    _, _, _, cano = world
    ds = arctic.ArcticDataset(root, "p1", "train", kp3d_cano=cano)
    dl = loader.DataLoader(ds, batch_size=2, num_workers=2)
    n = 0
    for batch in loader.device_prefetch(dl):
        assert hasattr(batch["images"], "devices")  # on device
        n += 1
    assert n == len(dl)


def test_mini_split_downsample(root, world):
    """mini/tiny splits deterministically subsample
    (dataset_utils.py:102-165)."""
    import numpy as np
    from uvhand_tpu.data import arctic

    _, _, _, kp3d_cano = world
    full = arctic.ArcticDataset(root, "p1", "train", kp3d_cano=kp3d_cano)
    # fixture is tiny, so minitrain caps at len(full) and subsampling is
    # exercised via a fabricated longer list
    names = [f"a/b/s01/seq/0/{i:05d}.jpg" for i in range(1000)]
    sub = arctic.downsample(names, "minitrain")
    assert len(sub) == 300
    assert sub == arctic.downsample(names, "minitrain")  # deterministic
    assert arctic.downsample(names, "train") == names
    mini = arctic.ArcticDataset(root, "p1", "minitrain", kp3d_cano=kp3d_cano)
    assert len(mini) <= len(full)


def test_render_gt_root_draws_learnable_signal(tmp_path):
    """make_synthetic_root(render_gt=True): the projected GT is drawn into
    the images (so image->pose is learnable for held-out studies) and the
    crop pipeline keeps image and 2D GT consistent; default stays noise."""
    import numpy as np
    from uvhand_tpu.data import arctic, loader
    from uvhand_tpu.geometry import objects

    bank = objects.synthetic_object_bank(2)
    r1, r2 = str(tmp_path / "gt"), str(tmp_path / "noise")
    arctic.make_synthetic_root(r1, num_seqs=1, frames=4, views=1,
                               obj_bank=bank, render_gt=True)
    arctic.make_synthetic_root(r2, num_seqs=1, frames=4, views=1,
                               obj_bank=bank)
    kp = np.asarray(bank.kp_bottom)
    b1 = next(iter(loader.DataLoader(
        arctic.ArcticDataset(r1, "p1", "train", kp3d_cano=kp), 4,
        shuffle=False, seed=0)))
    b2 = next(iter(loader.DataLoader(
        arctic.ArcticDataset(r2, "p1", "train", kp3d_cano=kp), 4,
        shuffle=False, seed=0)))
    # rendered images use a narrower U(90,160) noise floor + discs: lower
    # std than pure U(0,255) noise (post-normalization the gap compresses),
    # and they are deterministic for a fixed seed
    s1 = np.asarray(b1["images"]).std()
    s2 = np.asarray(b2["images"]).std()
    assert s1 < s2, (s1, s2)
    b1b = next(iter(loader.DataLoader(
        arctic.ArcticDataset(r1, "p1", "train", kp3d_cano=kp), 4,
        shuffle=False, seed=0)))
    np.testing.assert_array_equal(np.asarray(b1["images"]),
                                  np.asarray(b1b["images"]))

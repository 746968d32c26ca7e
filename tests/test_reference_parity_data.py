"""Data-layer numerical A/B vs the reference's REAL dataset code.

Runs `/root/reference/arctic_tools/src/datasets/arctic_dataset.py` (the
actual torch+cv2 `ArcticDataset.getitem`, `getitem_eval`, `downsample`) and
`tempo_inference_dataset.create_windows` against the SAME synthetic ARCTIC
disk root `uvhand_tpu.data.arctic` reads (augmentation off via the --seq
filter, the reference's own aug-disable path, arctic_dataset.py:436-438),
and asserts per-frame equality of images and every target field.

This closes the last major oracle seam (round-4 verdict missing #1): until
this file, `make_synthetic_root` wrote the schema `data/arctic.py` read, so
both could drift together from the real ARCTIC semantics with every test
green. Drifts this A/B caught when it landed:
  - SUBSET_SIZES carried tinytest=500/minitest=80; the reference's
    get_num_images (dataset_utils.py:102-133) uses 6000/200,
  - our downsample skipped the reference's `random.randint(0,100)==17`
    sanity draw (dataset_utils.py:153-170), which advances the RNG stream
    and changes every mini/tiny subset,
  - seq-filter vs downsample ordering (_process_imgnames filters first).

KNOWN, DELIBERATE layout deviation (documented in PARITY.md): the reference
dataset appends labels as [obj, left, right] but PREPENDS keypoint rows,
yielding rows [right, left, obj] (arctic_dataset.py:339-400) — and its
matcher/criterion consume the two POSITIONALLY (matcher.py:76-116,
actic_detr.py loss_boxes), so the reference matches/supervises the object
slot against right-hand keypoints whenever both hands are valid. We emit
slot-ALIGNED targets (labels[i] <-> keypoints[i]). The A/B therefore checks
our keypoint rows equal the reference's rows REVERSED (which is exactly the
label-aligned order), making the value-parity proof explicit while keeping
the (mis)alignment out of our pipeline.
"""

import os
import os.path as op
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from uvhand_tpu.data import arctic
from uvhand_tpu.geometry import objects

torch = pytest.importorskip("torch")


SEQ = None  # set in _build (first synthetic sequence name)


def _easydict(**kw):
    from easydict import EasyDict  # the stub installed by reference_stubs

    return EasyDict(kw)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Synthetic root + shim layout + both datasets (aug off)."""
    import reference_stubs as rs

    ds_mod, tempo_mod = rs.import_reference_dataset()

    root = str(tmp_path_factory.mktemp("arctic_root"))
    bank = objects.synthetic_object_bank(2)
    arctic.make_synthetic_root(root, num_seqs=1, frames=4, views=2,
                               obj_bank=bank)
    seq_name = f"{objects.OBJECT_NAMES[0]}_use_00"

    # one frame with an invalid left hand + one fully-invalid frame, so the
    # label/keypoint slot layout and the *_valid products are exercised on
    # every branch (the synthetic root writes all-valid by default)
    split_p = op.join(root, "splits/p1_train.npy")
    data = np.load(split_p, allow_pickle=True).item()
    cam = data["data_dict"][f"s01/{seq_name}"]["cam_coord"]
    cam["left_valid"][1, :] = 0
    cam["is_valid"][2, 1] = 0.0
    np.save(split_p, data, allow_pickle=True)

    # reference-root shim: <coco_path>/<dataset_file>/data/arctic_data/data/*
    shim = str(tmp_path_factory.mktemp("shim"))
    base = op.join(shim, "arctic", "data", "arctic_data", "data")
    os.makedirs(base)
    for d in ("splits", "meta", "cropped_images"):
        os.symlink(op.join(root, d), op.join(base, d))

    args = _easydict(
        coco_path=shim, dataset_file="arctic", setup="p1", speedup=True,
        ego_image_scale=0.3, img_res=224, focal_length=1000.0,
        use_gt_k=False, flip_prob=0.0, noise_factor=0.4, rot_factor=180.0,
        scale_factor=0.5, window_size=11, modelname="deformable_detr",
        two_stage=True,
        img_norm_mean=[0.485, 0.456, 0.406], img_norm_std=[0.229, 0.224, 0.225],
    )

    class _FakeObjectTensors:
        """The real one loads licensed meshes; the dataset reads only
        kp_bottom (mm) + names (arctic_dataset.py:479-481)."""

        def __init__(self):
            self.obj_tensors = {
                "kp_bottom": torch.tensor(
                    np.asarray(bank.kp_bottom, np.float32) * 1000.0),
                "names": list(bank.names),
            }

    orig = ds_mod.ObjectTensors
    ds_mod.ObjectTensors = _FakeObjectTensors
    try:
        ref_ds = ds_mod.ArcticDataset(args, "train", seq=seq_name)
    finally:
        ds_mod.ObjectTensors = orig

    ours_ds = arctic.ArcticDataset(
        root, "p1", "train", kp3d_cano=np.asarray(bank.kp_bottom),
        seq=seq_name)
    return dict(ds_mod=ds_mod, tempo_mod=tempo_mod, ref=ref_ds, ours=ours_ds,
                bank=bank, root=root, seq=seq_name, args=args)


def test_imgname_lists_match(world):
    assert list(world["ref"].imgnames) == list(world["ours"].imgnames)
    assert len(world["ref"].imgnames) == 8  # 4 frames x 2 views


def _ref_item(world, i):
    import reference_stubs as rs

    with rs.torch_cuda_as_cpu():
        return world["ref"].getitem(world["ref"].imgnames[i])


FIELDS = [
    # (ours key, ref targets key, atol)
    ("mano.pose.r", "mano.pose.r", 1e-6),
    ("mano.pose.l", "mano.pose.l", 1e-6),
    ("mano.beta.r", "mano.beta.r", 0.0),
    ("mano.beta.l", "mano.beta.l", 0.0),
    ("mano.j2d.norm.r", "mano.j2d.norm.r", 1e-6),
    ("mano.j2d.norm.l", "mano.j2d.norm.l", 1e-6),
    ("mano.j3d.full.r", "mano.j3d.full.r", 0.0),
    ("mano.j3d.full.l", "mano.j3d.full.l", 0.0),
    ("object.kp3d.full.b", "object.kp3d.full.b", 0.0),
    ("object.kp3d.full.t", "object.kp3d.full.t", 0.0),
    ("object.kp2d.norm.t", "object.kp2d.norm.t", 1e-6),
    ("object.kp2d.norm.b", "object.kp2d.norm.b", 1e-6),
    ("object.bbox2d.norm.t", "object.bbox2d.norm.t", 1e-6),
    ("object.bbox2d.norm.b", "object.bbox2d.norm.b", 1e-6),
    ("object.radian", "object.radian", 0.0),
    ("object.rot", "object.rot", 5e-4),
    ("is_valid", "is_valid", 0.0),
    ("left_valid", "left_valid", 0.0),
    ("right_valid", "right_valid", 0.0),
    ("joints_valid_r", "joints_valid_r", 0.0),
    ("joints_valid_l", "joints_valid_l", 0.0),
]


@pytest.mark.parametrize("i", range(8))
def test_frame_parity(world, i):
    inputs, targets, meta = _ref_item(world, i)
    ours = world["ours"][i]

    # image: ref (3, 224, 224) normalized torch; ours (224, 224, 3)
    ref_img = inputs.numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(ours["images"], ref_img, atol=1e-5, rtol=0)  # float32 op-order drift in the warp chain; ~1e-3 pixel levels

    for ok, rk, atol in FIELDS:
        rv = targets[rk]
        rv = rv.numpy() if hasattr(rv, "numpy") else np.asarray(rv)
        ov = np.asarray(ours[ok], np.float64).reshape(rv.squeeze().shape)
        np.testing.assert_allclose(
            ov, np.asarray(rv, np.float64).squeeze(), atol=atol, rtol=1e-6,
            err_msg=f"frame {i} field {ok}")

    # intrinsics incl. the ego-K pinning state machine
    np.testing.assert_allclose(
        ours["intrinsics"], meta["intrinsics"].numpy(), atol=1e-4, rtol=1e-6)

    # labels: ref emits one flat list [obj(, 12)(, 13)]; ours 3 fixed slots
    ref_labels = list(targets["labels"][0])
    our_valid = ours["target_valid"]
    our_labels = [int(l) for l, v in zip(ours["labels"], our_valid) if v]
    assert our_labels == ref_labels, f"frame {i}"

    # keypoints: ref rows are [right, left, obj] (prepend order,
    # arctic_dataset.py:346-356) while labels are [obj, left, right]; our
    # slot-aligned rows must equal the ref rows REVERSED (see module doc)
    ref_kp = targets["keypoints"][0].numpy()
    our_kp = np.stack([k for k, v in zip(ours["keypoints"], our_valid) if v])
    np.testing.assert_allclose(our_kp, ref_kp[::-1], atol=1e-6, rtol=1e-6,
                               err_msg=f"frame {i}")
    # invalid slots stay zero
    for k, v in zip(ours["keypoints"], our_valid):
        if not v:
            assert np.all(k == 0)


@pytest.mark.parametrize("i", [0, 5])
def test_eval_frame_parity(world, i):
    """getitem_eval (GT-withheld path): images + intrinsics only."""
    import reference_stubs as rs

    name = world["ref"].imgnames[i]
    with rs.torch_cuda_as_cpu():
        inputs, _targets, meta = world["ref"].getitem_eval(name)
    ours_ds = arctic.ArcticDataset(
        world["root"], "p1", "train",
        kp3d_cano=np.asarray(world["bank"].kp_bottom),
        seq=world["seq"], eval_mode=True)
    ours = ours_ds[i]
    ref_img = inputs["img"].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(ours["images"], ref_img, atol=1e-5, rtol=0)  # float32 op-order drift in the warp chain; ~1e-3 pixel levels
    np.testing.assert_allclose(
        ours["intrinsics"], meta["intrinsics"].numpy(), atol=1e-4, rtol=1e-6)


def test_downsample_parity(world):
    """Our downsample == the reference's (RNG stream incl. the sanity
    randint; dataset_utils.py:153-170) on every mini/tiny/small split."""
    import importlib

    du = importlib.import_module("src.datasets.dataset_utils")
    names = [f"./arctic_data/data/images/s01/box_use_00/1/{i:05d}.jpg"
             for i in range(400)]
    for split in ("minitrain", "minival", "minitest"):
        assert arctic.downsample(list(names), split) == du.downsample(
            list(names), split), split
    # identity on full splits
    assert arctic.downsample(list(names), "train") == names
    # size table matches get_num_images for every subset split
    for split, size in arctic.SUBSET_SIZES.items():
        assert du.get_num_images(split, 10**9) == size, split


@pytest.mark.parametrize("i", [0, 1, 4, 5])  # both views: ego + exo
def test_frame_parity_augmented(world, i):
    """Aug-ON A/B: both datasets run with the SAME pinned augmentation draw
    (rot=37 deg, sc=1.12, channel noise), exercising the rotated crop,
    j2d rotation transform, pose rot_aa and pixel-noise paths that the
    aug-off tests never reach. The RNG STREAMS deliberately differ (ours is
    per-(seed,index) resumable, the reference uses global np.random), so
    the draw itself is monkeypatched on both sides."""
    import reference_stubs as rs
    from uvhand_tpu.data import augment as augment_mod

    FIXED = {"flip": 0, "pn": np.array([1.10, 0.95, 1.05]), "rot": 37.0,
             "sc": 1.12}

    ds_mod = world["ds_mod"]
    ref = world["ref"]
    # the --seq path disabled aug on the shared instances; force it on here
    orig_ref_augm = ds_mod.data_utils.augm_params
    orig_our_augm = augment_mod.augm_params
    orig_aug_flag = ref.aug_data
    ds_mod.data_utils.augm_params = lambda *a, **k: dict(FIXED)
    augment_mod.augm_params = lambda *a, **k: dict(FIXED)
    ref.aug_data = True
    ours_ds = arctic.ArcticDataset(
        world["root"], "p1", "train",
        kp3d_cano=np.asarray(world["bank"].kp_bottom), seq=world["seq"],
        aug=True)
    ours_ds.aug = True  # the seq filter turns aug off like the reference
    try:
        with rs.torch_cuda_as_cpu():
            inputs, targets, meta = ref.getitem(ref.imgnames[i])
        ours = ours_ds[i]
    finally:
        ds_mod.data_utils.augm_params = orig_ref_augm
        augment_mod.augm_params = orig_our_augm
        ref.aug_data = orig_aug_flag

    ref_img = inputs.numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(ours["images"], ref_img, atol=1e-5, rtol=0)
    for ok, rk, atol in FIELDS:
        rv = targets[rk]
        rv = rv.numpy() if hasattr(rv, "numpy") else np.asarray(rv)
        ov = np.asarray(ours[ok], np.float64).reshape(rv.squeeze().shape)
        np.testing.assert_allclose(
            ov, np.asarray(rv, np.float64).squeeze(),
            atol=max(atol, 1e-6), rtol=1e-5,
            err_msg=f"aug frame {i} field {ok}")
    ref_kp = targets["keypoints"][0].numpy()
    our_kp = np.stack([k for k, v in zip(ours["keypoints"],
                                         ours["target_valid"]) if v])
    np.testing.assert_allclose(our_kp, ref_kp[::-1], atol=1e-6, rtol=1e-6)


def test_create_windows_parity(world):
    imgnames = [f"./arctic_data/data/images/s01/box_use_00/{v}/{i:05d}.jpg"
                for v in (0, 1) for i in range(7)]
    for T in (3, 4, 7):
        ref_w = world["tempo_mod"].create_windows(list(imgnames), T)
        our_w = arctic.create_windows(list(imgnames), T)
        assert [list(w) for w in ref_w] == [list(w) for w in our_w], T

"""make_synthetic_root(obj_bank=...): the GT must be self-consistent.

`process_targets` inverts the generator: the dataset Kabsch fit should
recover the synthesized object rotation, and the LSQ camera-translation
solve should recover the synthesized translation (bounded, ~[0,0,0.6]),
instead of the ~1e2 ill-conditioned solutions the independent-random
legacy fields produce (PERF.md round 3, loss-scale diagnosis).
"""

import tempfile

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from uvhand_tpu.data import arctic, loader, process  # noqa: E402
from uvhand_tpu.geometry import mano, objects  # noqa: E402


@pytest.fixture(scope="module")
def world():
    bank = objects.synthetic_object_bank(2)
    root = tempfile.mkdtemp(prefix="uvhand_consist_")
    arctic.make_synthetic_root(root, num_seqs=2, frames=4, views=2,
                               obj_bank=bank)
    return bank, root


def test_object_translation_solve_is_bounded(world):
    bank, root = world
    # aug off so the crop geometry is deterministic
    ds = arctic.ArcticDataset(root, "p1", "train", aug=False,
                              kp3d_cano=np.asarray(bank.kp_bottom))
    batch = next(iter(loader.DataLoader(ds, 8, shuffle=False, seed=0,
                                        drop_last=False)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    t = process.process_targets(
        batch, mano.synthetic_mano(0, True), mano.synthetic_mano(1, False),
        bank)
    cam_t = np.asarray(t["object.cam_t"])
    # synthesized translations are N([0,0,0.6], [.08,.08,.05]); the solve
    # runs in the aug-crop pinhole so it recovers them only up to the crop
    # reprojection, but must stay at scene scale, not the ~1e2 solutions
    # the legacy random fields produce
    assert np.all(np.abs(cam_t) < 5.0), cam_t
    assert np.all(cam_t[:, 2] > 0), cam_t  # in front of the camera
    for k in ("mano.cam_t.r", "mano.cam_t.l"):
        assert np.all(np.abs(np.asarray(t[k])) < 5.0), (k, t[k])


def test_kabsch_recovers_synthesized_rotation(world):
    bank, root = world
    ds = arctic.ArcticDataset(root, "p1", "train", aug=False,
                              kp3d_cano=np.asarray(bank.kp_bottom))
    s = ds[0]
    # re-pose the bank's bottom kps by the recovered rotation: must match
    # the stored camera-space bottom kps (the generator used a proper
    # rigid transform, so the fit is exact up to fp)
    from uvhand_tpu.geometry import rotations

    R = np.asarray(rotations.axis_angle_to_matrix(
        jnp.asarray(s["object.rot"])[None]))[0]
    cano = np.asarray(bank.kp_bottom)[int(s["query_idx"])]
    posed = cano @ R.T
    gt = np.asarray(s["object.kp3d.full.b"])
    gt_centered = gt - gt.mean(0)
    np.testing.assert_allclose(posed - posed.mean(0), gt_centered, atol=1e-4)


def test_legacy_root_unchanged():
    # default (no obj_bank) keeps the old independent-random fields so
    # existing fixtures/goldens are unaffected
    root = tempfile.mkdtemp(prefix="uvhand_legacy_")
    arctic.make_synthetic_root(root, num_seqs=1, frames=2, views=1, seed=0)
    d = np.load(f"{root}/splits/p1_train.npy", allow_pickle=True).item()
    key = next(iter(d["data_dict"]))
    kp3d = d["data_dict"][key]["cam_coord"]["kp3d"]
    assert kp3d.shape == (2, 1, 32, 3)

"""Native (C++) fused image pipeline vs the pure-Python reference path.

The native library (uvhand_tpu/native/pipeline.cpp) must reproduce
`cv2.imread + augment.rgb_processing + augment.normalize_image`
(reference: arctic_dataset.py:155-161 + data_utils.py:183-223). The
toolchains differ slightly (cv2 wheel 5.0 vs system OpenCV 4.6 +
libjpeg-turbo), so parity is bounded, not bitwise: observed max ~0.05 in
normalized units (~2.5 of 255 pixel levels, decoder LSB rounding through
the cubic warp), mean ~1e-3.
"""

import os
import tempfile

import numpy as np
import pytest

from uvhand_tpu import native
from uvhand_tpu.data import arctic, augment

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _write_jpg(path, rng, smooth=False):
    import cv2

    img = rng.uniform(0, 255, (600, 840, 3)).astype(np.uint8)
    if smooth:
        img = cv2.GaussianBlur(img, (7, 7), 3)
    cv2.imwrite(path, img)
    return path


def _python_path(p, center, bbox_dim, augm, res=224):
    import cv2

    cv_img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(np.float32)
    return augment.normalize_image(
        augment.rgb_processing(cv_img, center, bbox_dim, augm, res)
    )


CASES = [
    # (center, bbox_dim, rot, sc) — interior, two corners, no-rot
    ([410.0, 290.0], 1.4, 12.0, 1.1),
    ([30.0, 20.0], 1.5, -25.0, 0.9),
    ([830.0, 590.0], 1.2, 0.0, 1.0),
]


@pytest.mark.parametrize("center,bbox_dim,rot,sc", CASES)
def test_parity_mode_matches_python(center, bbox_dim, rot, sc, tmp_path):
    rng = np.random.default_rng(0)
    p = _write_jpg(str(tmp_path / "a.jpg"), rng)
    augm = {"rot": rot, "sc": sc,
            "pn": np.array([0.95, 1.02, 1.05], np.float32), "flip": 0}
    ref = _python_path(p, center, bbox_dim, augm)
    out = native.process_image(p, center, bbox_dim, augm, 224, fast=False)
    assert out is not None and out.shape == ref.shape
    d = np.abs(out - ref)
    assert d.max() < 0.08, d.max()   # ~4 pixel levels through the warp
    assert d.mean() < 5e-3, d.mean()


def test_fast_mode_geometry(tmp_path):
    # fast mode decodes at a reduced scale: pixels shift slightly, geometry
    # must not. On a smooth image the difference stays small.
    rng = np.random.default_rng(1)
    p = _write_jpg(str(tmp_path / "s.jpg"), rng, smooth=True)
    augm = {"rot": 8.0, "sc": 1.05, "pn": np.ones(3, np.float32), "flip": 0}
    ref = _python_path(p, [400.0, 300.0], 1.4, augm)
    out = native.process_image(p, [400.0, 300.0], 1.4, augm, 224, fast=True)
    assert out is not None
    d = np.abs(out - ref)
    assert d.mean() < 0.05, d.mean()
    # pixelwise correlation: a geometry bug (shifted/flipped crop) drops
    # this to ~0 on any natural image
    c = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert c > 0.98, c


def test_png_fallback(tmp_path):
    import cv2

    rng = np.random.default_rng(2)
    p = str(tmp_path / "a.png")
    cv2.imwrite(p, rng.uniform(0, 255, (600, 840, 3)).astype(np.uint8))
    augm = {"rot": 5.0, "sc": 1.0, "pn": np.ones(3, np.float32), "flip": 0}
    ref = _python_path(p, [410.0, 290.0], 1.4, augm)
    out = native.process_image(p, [410.0, 290.0], 1.4, augm, 224, fast=False)
    assert out is not None
    assert np.abs(out - ref).max() < 0.08  # PNG decode is lossless; residue
    # is OpenCV 4.6-vs-5.0 blur/warp rounding only


def test_missing_image_returns_none(tmp_path):
    augm = {"rot": 0.0, "sc": 1.0, "pn": np.ones(3, np.float32), "flip": 0}
    out = native.process_image(
        str(tmp_path / "nope.jpg"), [100.0, 100.0], 1.0, augm, 224)
    assert out is None


def test_dataset_native_matches_python():
    root = tempfile.mkdtemp(prefix="uvhand_native_")
    arctic.make_synthetic_root(root, num_seqs=1, frames=3, views=1)
    kw = dict(setup="p1", split="train")
    ds_py = arctic.ArcticDataset(root, **kw)
    ds_nat = arctic.ArcticDataset(root, native_images="on", **kw)
    assert ds_nat.native_images == "on"
    for i in range(len(ds_py)):
        a, b = ds_py[i], ds_nat[i]
        assert set(a) == set(b)
        assert np.abs(a["images"] - b["images"]).max() < 0.08
        for k in a:
            if k in ("images", "imgname"):
                continue
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_dataset_native_decode_failure_falls_back():
    # deleting the image file must reproduce the python path's
    # zero-image / is_valid=0 semantics through the native branch
    root = tempfile.mkdtemp(prefix="uvhand_native_miss_")
    arctic.make_synthetic_root(root, num_seqs=1, frames=2, views=1)
    ds = arctic.ArcticDataset(root, "p1", "train", native_images="on")
    os.remove(ds._img_path(ds.imgnames[0]))
    ref = arctic.ArcticDataset(root, "p1", "train")[0]
    out = ds[0]
    assert out["is_valid"] == 0.0 and ref["is_valid"] == 0.0
    np.testing.assert_allclose(out["images"], ref["images"])

"""Extraction/submission-interface A/B vs the reference's REAL code.

Runs `/root/reference/arctic_tools/src/extraction/interface.py::
std_interface` (concat batches -> squeeze -> sort by imgname -> per-camera
split with the first-camera unique-count truncation) on the same synthetic
out_list as our `cli/extract_predicts.py::std_interface`, and asserts the
per-camera groups match key-by-key, element-by-element. Previously this
path was verified against interface.py:209-316 by reading, not by running
it (round-4 verdict row 45 caveat)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from uvhand_tpu.cli import extract_predicts as ep

torch = pytest.importorskip("torch")


def _out_lists():
    """Two batches spanning 2 cameras x 4 frames of one sequence, emitted
    OUT of imgname order so the sort matters. Returns (np version for ours,
    torch version for the reference)."""
    rng = np.random.default_rng(0)
    names = [
        f"./arctic_data/data/images/s01/box_use_01/{cam}/{f:05d}.jpg"
        for cam in (1, 4) for f in range(4)
    ]
    order = [3, 0, 5, 6, 1, 2, 7, 4]  # shuffled emission order
    names_shuffled = [names[i] for i in order]
    pose = rng.normal(size=(8, 48)).astype(np.float32)
    rad = rng.normal(size=(8,)).astype(np.float32)
    np_batches, t_batches = [], []
    for s in (slice(0, 5), slice(5, 8)):
        nb = {
            "meta_info.imgname": list(names_shuffled[s]),
            "pred.mano.pose.r": pose[s],
            "pred.object.radian": rad[s],
        }
        np_batches.append(nb)
        t_batches.append({
            "meta_info.imgname": list(names_shuffled[s]),
            "pred.mano.pose.r": torch.from_numpy(pose[s]),
            "pred.object.radian": torch.from_numpy(rad[s]),
        })
    return np_batches, t_batches


def test_std_interface_parity():
    import importlib

    import reference_stubs as rs

    rs.import_reference_dataset()  # namespace pkgs + torchvision/lib stubs
    iface = importlib.import_module("src.extraction.interface")

    np_batches, t_batches = _out_lists()
    ours = ep.std_interface(np_batches)
    with rs.torch_cuda_as_cpu():
        ref = iface.std_interface(t_batches)

    assert set(ours) == set(ref), (set(ours), set(ref))
    for seq_key in ref:
        for k, rv in ref[seq_key].items():
            ov = ours[seq_key][k]
            if isinstance(rv, torch.Tensor):
                rv = rv.numpy()
            if k == "meta_info.imgname":
                assert list(ov) == list(rv), (seq_key, k)
            else:
                # the reference squeezes every tensor; compare squeezed
                np.testing.assert_allclose(
                    np.squeeze(np.asarray(ov)), np.squeeze(np.asarray(rv)),
                    atol=0, err_msg=f"{seq_key}/{k}")


def test_save_results_matches_reference_fp16_layout(tmp_path):
    """Our save_results writes the reference's .pt layout: preds/meta_info
    folders, fp16 for float predictions (interface.py:195-211)."""
    np_batches, _ = _out_lists()
    out_cam = ep.std_interface(np_batches)
    ep.save_results(out_cam, str(tmp_path))
    for seq_key in out_cam:
        pred_p = tmp_path / seq_key / "preds" / "pred.mano.pose.r.pt"
        meta_p = tmp_path / seq_key / "meta_info" / "meta_info.imgname.pt"
        assert pred_p.is_file() and meta_p.is_file()
        t = torch.load(str(pred_p), weights_only=False)
        assert t.dtype == torch.float16
        names = torch.load(str(meta_p), weights_only=False)
        assert len(names) == 4

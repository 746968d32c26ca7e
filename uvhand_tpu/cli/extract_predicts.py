"""Prediction extraction / ARCTIC submission export.

Parity with `/root/reference/extract_predicts.py:47-404` and
`arctic_tools/extraction/interface.py` (`std_interface:254`,
`save_results:209`): per-sequence inference, selected-query decode,
weak->perspective cams, axis-angle->rotmats, sort by imgname, split per
camera, dump `{seq}/preds/pred.*.pt` (torch tensors, fp16, so the official
ARCTIC submission tooling consumes them unchanged).
"""

from __future__ import annotations

import os
import os.path as op
from typing import Dict, List

import numpy as np

from ..geometry import camera as camera_lib
from ..geometry.rotations import axis_angle_to_matrix
from ..losses.criterion import select_queries
from ..utils.xdict import xdict

SUBMIT_KEYS = (
    "pred.mano.cam_t.l", "pred.mano.beta.l", "pred.mano.pose.l",
    "pred.mano.cam_t.r", "pred.mano.beta.r", "pred.mano.pose.r",
    "pred.object.rot", "pred.object.cam_t", "pred.object.radian",
    "meta_info.imgname",
)


def extract_batch(outputs, intrinsics, imgnames, img_res=224.0) -> Dict[str, np.ndarray]:
    """One batch -> reference out_dict (extract_predicts.py:300-340)."""
    import jax.numpy as jnp

    st = outputs["stacked"]
    last = {k: v[-1] for k, v in st.items()}
    sel = select_queries(last)
    avg_f = (intrinsics[:, 0, 0] + intrinsics[:, 1, 1]) / 2.0
    cam_t = lambda wp: camera_lib.weak_perspective_to_perspective(wp, avg_f, img_res)
    to_rotmat = lambda p: np.asarray(axis_angle_to_matrix(p.reshape(-1, 16, 3)))
    return {
        "pred.mano.cam_t.l": np.asarray(cam_t(sel["root.l"])),
        "pred.mano.beta.l": np.asarray(sel["beta.l"]),
        "pred.mano.pose.l": to_rotmat(sel["pose.l"]),
        "pred.mano.cam_t.r": np.asarray(cam_t(sel["root.r"])),
        "pred.mano.beta.r": np.asarray(sel["beta.r"]),
        "pred.mano.pose.r": to_rotmat(sel["pose.r"]),
        "pred.object.rot": np.asarray(sel["obj_rot"]),
        "pred.object.cam_t": np.asarray(cam_t(sel["root.o"])),
        "pred.object.radian": np.asarray(sel["obj_rad"]),
        "meta_info.imgname": list(imgnames),
    }


def std_interface(out_list: List[Dict]) -> Dict[str, Dict]:
    """Concatenate batches, sort by imgname, split per camera
    (interface.py:254-316)."""
    out = {}
    for k in out_list[0]:
        vals = [b[k] for b in out_list]
        if isinstance(vals[0], list):
            out[k] = sum(vals, [])
        else:
            out[k] = np.concatenate(vals, 0)

    imgnames = np.array(out["meta_info.imgname"])
    sort_idx = np.argsort(imgnames)
    for k, v in out.items():
        out[k] = [v[i] for i in sort_idx] if isinstance(v, list) else v[sort_idx]

    imgnames = np.array(out["meta_info.imgname"])
    cam_ids, seqs, sids = [], [], []
    for n in imgnames:
        sid, seq_name, cam, _ = n.split("/")[-4:]
        cam_ids.append(int(cam))
        seqs.append(seq_name)
        sids.append(sid)
    assert len(set(seqs)) == 1, "std_interface expects one sequence"
    cam_ids = np.array(cam_ids)
    out_cam = {}
    for cam in sorted(set(cam_ids.tolist())):
        idx = np.where(cam_ids == cam)[0]
        cur = {}
        for k, v in out.items():
            cur[k] = [v[i] for i in idx] if isinstance(v, list) else v[idx]
        out_cam[f"{sids[0]}_{seqs[0]}_{cam}"] = cur
    return out_cam


def save_results(out_cam: Dict[str, Dict], out_dir: str):
    """Dump per-sequence .pt files in the ARCTIC submission layout
    (interface.py:209-253). Uses torch.save for byte-compatible artifacts."""
    import torch

    for seq_name, seq_data in out_cam.items():
        folder = op.join(out_dir, seq_name)
        for key, val in seq_data.items():
            if "pred." in key:
                out_p = op.join(folder, "preds", key + ".pt")
            elif "meta_info." in key:
                out_p = op.join(folder, "meta_info", key + ".pt")
            else:
                continue
            os.makedirs(op.dirname(out_p), exist_ok=True)
            if isinstance(val, np.ndarray) and val.dtype == np.float32:
                torch.save(torch.from_numpy(val).half(), out_p)
            elif isinstance(val, np.ndarray):
                torch.save(torch.from_numpy(val), out_p)
            else:
                torch.save(val, out_p)


def load_protocol_seqs(coco_path: str, dataset_file: str, setup: str,
                       run_on: str = "val"):
    """Sequence list from `splits_json/protocol_{setup}.json[run_on]`
    (extract_predicts.py:71-77); None when the protocol file is absent
    (synthetic fixtures) — then every sequence is processed."""
    import json as _json
    import os.path as _op

    for cand in (
        _op.join(coco_path, dataset_file,
                 f"data/arctic_data/data/splits_json/protocol_{setup}.json"),
        _op.join(coco_path, dataset_file, f"splits_json/protocol_{setup}.json"),
    ):
        if _op.exists(cand):
            with open(cand) as f:
                return _json.load(f)[run_on]
    return None


def run_extraction(model, params, dataset, batch_size, out_dir, img_res=224.0,
                   eval_step_apply=None, seqs=None):
    """Per-sequence loop (extract_predicts.py:99-130): group the dataset's
    imgnames by sequence (restricted to the protocol `seqs` when given),
    run inference, export."""
    import jax
    import jax.numpy as jnp

    groups: Dict[str, List[int]] = {}
    for i, n in enumerate(dataset.imgnames):
        sid, seq_name, _, _ = n.split("/")[-4:]
        if seqs is not None and (seq_name not in seqs
                                 and f"{sid}/{seq_name}" not in seqs):
            continue
        groups.setdefault(f"{sid}/{seq_name}", []).append(i)

    from ..data.loader import prefetch_samples

    fwd = jax.jit(lambda p, x: model.apply(p, x, train=False))
    for seq, ids in groups.items():
        out_list = []
        chunks, trims = [], []
        for s in range(0, len(ids), batch_size):
            chunk = ids[s : s + batch_size]
            trims.append(len(chunk))
            chunks.append(chunk + [chunk[-1]] * (batch_size - len(chunk)))
        # host decode overlaps device compute (thread-pool prefetch)
        for samples, trim in zip(prefetch_samples(dataset, chunks), trims):
            imgs = jnp.asarray(np.stack([x["images"] for x in samples]))
            K = jnp.asarray(np.stack([x["intrinsics"] for x in samples]))
            outputs = fwd(params, imgs)
            b = extract_batch(outputs, K, [x["imgname"] for x in samples], img_res)
            b = {k: (v[:trim] if not isinstance(v, list) else v[:trim]) for k, v in b.items()}
            out_list.append(b)
        out_cam = std_interface(out_list)
        save_results(out_cam, out_dir)
    return out_dir

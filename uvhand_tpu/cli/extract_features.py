"""Backbone feature extraction (--extract mode).

Parity with `extract_feature` (`/root/reference/util/tools.py:541-604`) and
the model hook (`actic_detr.py:188-189`): run the backbone only and dump
per-image multi-scale feature maps, so later runs can train with
`feature_type=global_fm/local_fm` without re-running the backbone.

Layout mirrors the reference: `{out_dir}/{setup}_{dim}/{split}/{imgname}.pkl`
with a list of 3 feature maps per image (numpy, NHWC).
"""

from __future__ import annotations

import os
import os.path as op
import pickle

import numpy as np


def extract_features(model, params, dataset, out_dir: str, setup: str = "p1",
                     split: str = "train", batch_size: int = 16):
    import jax
    import jax.numpy as jnp

    fwd = jax.jit(
        lambda p, x: model.apply(p, x, train=False, return_backbone_features=True)
    )
    n = len(dataset)
    root = op.join(out_dir, f"{setup}_2048", split)
    os.makedirs(root, exist_ok=True)
    for s in range(0, n, batch_size):
        ids = list(range(s, min(s + batch_size, n)))
        pad = batch_size - len(ids)
        samples = [dataset[i] for i in ids + [ids[-1]] * pad]
        imgs = jnp.asarray(np.stack([x["images"] for x in samples]))
        feats = fwd(params, imgs)
        feats_np = [np.asarray(f) for f in feats]
        for k, i in enumerate(ids):
            name = samples[k]["imgname"].split("/")[-4:]
            out_p = op.join(root, *name) + ".pkl"
            os.makedirs(op.dirname(out_p), exist_ok=True)
            with open(out_p, "wb") as f:
                pickle.dump([fm[k] for fm in feats_np], f)
    return root


def load_feature_maps(root: str, imgnames, setup: str = "p1", split: str = "train"):
    """local_fm loading path (tempo_inference_dataset.py:126-134)."""
    out = []
    for name in imgnames:
        p = op.join(root, f"{setup}_2048", split, *name.split("/")[-4:]) + ".pkl"
        with open(p, "rb") as f:
            out.append(pickle.load(f))
    # stack per level: list over levels of (T, H, W, C)
    L = len(out[0])
    return [np.stack([o[l] for o in out], 0) for l in range(L)]

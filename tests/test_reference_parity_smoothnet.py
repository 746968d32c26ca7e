"""SmoothNet numerical A/B vs the reference's REAL torch module.

Builds the reference `ArcticSmoother` (`/root/reference/models/smoothnet.py
:128-178` — six shared MotionSmoothers over the selected-query params, each
a pos/vel/acc Smoother trio + fusion linear) at a seeded random init,
transfers its state dict onto our flax `ArcticSmoother`, and asserts output
equality on identical inputs. Closes the one temporal module that was only
golden-checksummed (capability-tested) rather than reference-oracled.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp

from uvhand_tpu.models.temporal.smoothnet import ArcticSmoother

torch = pytest.importorskip("torch")

B, T = 2, 8


def _convert(sd):
    """torch ArcticSmoother state dict -> our flax param tree."""
    heads = {
        "mano_root_smoother": "mano_root", "obj_root_smoother": "obj_root",
        "mano_pose_smoother": "mano_pose", "mano_shape_smoother": "mano_shape",
        "obj_rot_smoother": "obj_rot", "obj_rad_smoother": "obj_rad",
    }
    branches = {"pos_smoother": "pos", "vel_smoother": "vel",
                "acc_smoother": "acc"}
    params: dict = {}

    def put(path, val):
        d = params
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = jnp.asarray(np.asarray(val, np.float32))

    def lin(dst, src):
        put(dst + ("kernel",), np.asarray(sd[src + ".weight"]).T)
        put(dst + ("bias",), np.asarray(sd[src + ".bias"]))

    for tname, fname in heads.items():
        for tb, fb in branches.items():
            base = f"{tname}.{tb}"
            lin((fname, fb, "encoder"), f"{base}.encoder.0")
            for i in range(3):
                lin((fname, fb, f"res{i}", "Dense_0"),
                    f"{base}.res_blocks.{i}.linear1")
                lin((fname, fb, f"res{i}", "Dense_1"),
                    f"{base}.res_blocks.{i}.linear2")
            lin((fname, fb, "decoder"), f"{base}.decoder")
        lin((fname, "fusion"), f"{tname}.fusion_layer")
    return {"params": params}


def test_arctic_smoother_parity():
    import reference_stubs as rs

    rs.import_reference_loss()  # namespace packages + library stand-ins
    import importlib

    smooth_mod = importlib.import_module("models.smoothnet")

    torch.manual_seed(0)
    ref = smooth_mod.ArcticSmoother(B, T)
    ref.eval()

    rng = np.random.default_rng(0)
    mk = lambda d: rng.normal(size=(B * T, d)).astype(np.float32)
    sel = {
        "root.l": mk(3), "root.r": mk(3), "root.o": mk(3),
        "pose.l": mk(48), "pose.r": mk(48),
        "beta.l": mk(10), "beta.r": mk(10),
        "obj_rot": mk(3), "obj_rad": mk(1)[:, 0],
    }

    with torch.no_grad():
        t = lambda k: torch.from_numpy(np.asarray(sel[k]))
        roots, poses, shapes, objs = ref((
            (t("root.l"), t("root.r"), t("root.o")),
            (t("pose.l"), t("pose.r")),
            (t("beta.l"), t("beta.r")),
            (t("obj_rot"), torch.from_numpy(
                np.asarray(sel["obj_rad"])[:, None])),
        ))

    ours_mod = ArcticSmoother(T)
    variables = _convert(ref.state_dict())
    # structure check: converted tree == init tree (same leaves)
    init = ours_mod.init({"params": jax.random.PRNGKey(0)}, sel)
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(init)[0]}
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(variables)[0]}
    assert ref_paths == got_paths, ref_paths.symmetric_difference(got_paths)

    out = ours_mod.apply(variables, sel, train=False)

    pairs = [
        ("root.l", roots[0]), ("root.r", roots[1]), ("root.o", roots[2]),
        ("pose.l", poses[0]), ("pose.r", poses[1]),
        ("beta.l", shapes[0]), ("beta.r", shapes[1]),
        ("obj_rot", objs[0]), ("obj_rad", objs[1]),
    ]
    for k, rv in pairs:
        ov = np.asarray(out[k], np.float64).reshape(rv.shape if k != "obj_rad"
                                                    else (-1, 1))
        np.testing.assert_allclose(
            ov, rv.numpy().astype(np.float64), atol=2e-5, rtol=1e-5,
            err_msg=k)

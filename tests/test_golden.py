"""Golden regression suite: one tight-tolerance checksum per subsystem.

Catches silent numeric drift across refactors in: MSDA fwd/bwd, the full
DETR forward (transformer), the criterion's per-term loss dict, raw-target
preprocessing (process_targets), MANO forward, AIK, the SmoothNet temporal
stack, and the Assembly 2.5D model.

Values live in `tests/golden_values.json`, captured on the CI configuration
(CPU backend, fixed seeds). Tolerance is 2e-4 relative — loose enough for
benign op-reordering inside XLA, tight enough that any semantic change
(a changed constant, a flipped sign, a different reduction) trips.

UPDATE PROTOCOL: when an *intentional* numeric change lands (new jax pin,
deliberate algorithm change), regenerate with

    python tests/test_golden.py --update

and commit the JSON together with an explanation of WHY the numbers moved.
Never update to silence a failure you can't explain.

REGEN LOG: round 5 surgically updated `assembly.pred_keypoints_sum`
(114.229 -> 184.589, this key only): the assembly decoder was brought to
exact reference semantics for the new forward A/B
(`test_reference_parity_assembly_fwd.py`) — the z coordinate now goes
through the reference's whole-63-d sigmoid()*2-0.5 output squash
(`assembly_detr.py:215`) instead of staying a raw delta, and layers past
the first run on 42-d references. The golden config has one decoder layer,
so `assembly.pred_logits_sum` is untouched (hs identical at layer 0), which
isolates the drift to the output formula as expected.

REGEN LOG: the round-4 criterion/matcher commit (7da4611) regenerated the
four detr.* forward checksums with ~1e-7-relative (ulp-level) drift even
though the forward math was untouched: `--update` rewrites EVERY key, and
that regeneration ran with a fused-train-step warm-up in the same process,
so XLA CSE'd the forward into a fractionally different op order. Both old
and new values pass the 2e-4 tolerance; semantic forward drift would show
at ~1e-3+.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from uvhand_tpu.data.process import process_targets
from uvhand_tpu.geometry import aik, mano, objects
from uvhand_tpu.losses import criterion as crit
from uvhand_tpu.ops.msda import ms_deform_attn

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_values.json")
RTOL = 2e-4


def _checksums():
    """Deterministic scalar checksums, one dict entry per guarded quantity."""
    # hermetic against global-config leakage from other tests (a CLI test
    # once switched jax_default_prng_impl and silently changed every
    # PRNGKey draw below)
    jax.config.update("jax_default_prng_impl", "threefry2x32")
    out = {}

    # --- MANO forward -----------------------------------------------------
    m = mano.synthetic_mano(0)
    v, j = mano.mano_forward(
        m, jnp.full((1, 3), 0.1), jnp.full((1, 45), 0.05),
        jnp.full((1, 10), 0.2), flat_hand_mean=True,
    )
    out["mano.v_sum"] = float(jnp.sum(v))
    out["mano.j_sum"] = float(jnp.sum(j))

    # --- AIK (FK -> IK round trip on a posed hand) ------------------------
    tmpl = jnp.asarray(aik.TEMPLATE_RIGHT)[None]
    out["aik.identity_max"] = float(jnp.abs(aik.adaptive_ik(tmpl)).max())
    # translated input must give identical pose (root-relative invariance)
    out["aik.translation_drift"] = float(
        jnp.abs(aik.adaptive_ik(tmpl + 5.0) - aik.adaptive_ik(tmpl)).max()
    )

    # --- MSDA fwd/bwd (xla impl; pallas is oracle-tested separately) ------
    from test_msda import SHAPES, make_inputs

    value, loc, attn = make_inputs(np.random.default_rng(3))
    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))

    def msda_sum(v_, l_, a_):
        return jnp.sum(ms_deform_attn(v_, SHAPES, l_, a_, impl="xla"))

    out["msda.fwd_sum"] = float(msda_sum(*args))
    gv, gl, ga = jax.grad(msda_sum, argnums=(0, 1, 2))(*args)
    out["msda.grad_value_sum"] = float(jnp.sum(gv))
    out["msda.grad_loc_sum"] = float(jnp.sum(gl))
    out["msda.grad_attn_sum"] = float(jnp.sum(ga))

    # --- criterion per-term dict ------------------------------------------
    from test_criterion import make_targets, perfect_outputs

    rng = np.random.default_rng(3)
    mano_r = mano.synthetic_mano(0, True)
    mano_l = mano.synthetic_mano(1, False)
    bank = objects.synthetic_object_bank(2)
    targets, gtp = make_targets(rng, mano_r, mano_l, bank)
    outputs = perfect_outputs(gtp)
    total, terms = crit.arctic_criterion(outputs, targets, mano_r, mano_l, bank)
    out["criterion.total"] = float(total)
    for k, val in sorted(terms.items()):
        out[f"criterion.{k}"] = float(jnp.asarray(val).sum())

    # --- process_targets (raw loader-format GT -> camera-space GT) ---------
    from uvhand_tpu.geometry import camera, rotations

    r2 = np.random.default_rng(11)
    B2 = 2
    K = jnp.tile(camera.weak_perspective_intrinsics(1000.0, 224)[None], (B2, 1, 1))
    pose_r = jnp.asarray(r2.normal(scale=0.2, size=(B2, 48)), jnp.float32)
    pose_l = jnp.asarray(r2.normal(scale=0.2, size=(B2, 48)), jnp.float32)
    beta_r = jnp.asarray(r2.normal(scale=0.3, size=(B2, 10)), jnp.float32)
    beta_l = jnp.asarray(r2.normal(scale=0.3, size=(B2, 10)), jnp.float32)
    rot_o = jnp.asarray(r2.normal(scale=0.3, size=(B2, 3)), jnp.float32)
    rad_o = jnp.asarray(np.abs(r2.normal(scale=0.3, size=B2)), jnp.float32)
    qidx = jnp.asarray([1, 0])
    obj = objects.object_forward(bank, rad_o, rot_o, qidx)
    nk = obj["kp3d"].shape[1] // 2
    kp3d_b_cano = obj["kp3d"][:, nk:]
    R_cam = rotations.axis_angle_to_matrix(
        jnp.asarray(r2.normal(scale=0.4, size=(B2, 3)), jnp.float32))
    t_cam = jnp.asarray(np.stack([r2.normal(size=B2) * 0.03,
                                  r2.normal(size=B2) * 0.03,
                                  r2.uniform(0.5, 0.8, B2)], 1), jnp.float32)
    kp3d_b_cam = jnp.einsum("bij,bnj->bni", R_cam, kp3d_b_cano) + t_cam[:, None]
    _, j_r_ = mano.mano_forward(mano_r, pose_r[:, :3], pose_r[:, 3:], beta_r,
                                flat_hand_mean=False)
    _, j_l_ = mano.mano_forward(mano_l, pose_l[:, :3], pose_l[:, 3:], beta_l,
                                flat_hand_mean=False)
    j_r_cam = jnp.einsum("bij,bnj->bni", R_cam, j_r_ + 0.1) + t_cam[:, None]
    j_l_cam = jnp.einsum("bij,bnj->bni", R_cam, j_l_ - 0.1) + t_cam[:, None]
    kp2d_b = camera.project2d(K, kp3d_b_cano + t_cam[:, None])
    raw = {
        "mano.pose.r": pose_r, "mano.pose.l": pose_l,
        "mano.beta.r": beta_r, "mano.beta.l": beta_l,
        "mano.j3d.full.r": j_r_cam, "mano.j3d.full.l": j_l_cam,
        "object.kp3d.full.b": kp3d_b_cam,
        "object.kp2d.norm.b": camera.normalize_kp2d(kp2d_b, 224.0),
        "object.kp2d.norm.t": camera.normalize_kp2d(kp2d_b, 224.0),
        "object.rot": rot_o, "object.radian": rad_o,
        "query_idx": qidx, "intrinsics": K,
    }
    proc = process_targets(raw, mano_r, mano_l, bank)
    for k in ("mano.v3d.cam.r", "mano.v3d.cam.l", "object.v.cam",
              "mano.cam_t.r", "dist.ro"):
        out[f"process.{k}"] = float(jnp.sum(proc[k]))

    # --- temporal smoother (SmoothNet stack) --------------------------------
    from uvhand_tpu.models.temporal.smoothnet import ArcticSmoother

    T = 8
    r3 = np.random.default_rng(9)
    sel = {
        "root.l": jnp.asarray(r3.normal(size=(2 * T, 3)), jnp.float32),
        "root.r": jnp.asarray(r3.normal(size=(2 * T, 3)), jnp.float32),
        "root.o": jnp.asarray(r3.normal(size=(2 * T, 3)), jnp.float32),
        "pose.l": jnp.asarray(r3.normal(size=(2 * T, 48)), jnp.float32),
        "pose.r": jnp.asarray(r3.normal(size=(2 * T, 48)), jnp.float32),
        "beta.l": jnp.asarray(r3.normal(size=(2 * T, 10)), jnp.float32),
        "beta.r": jnp.asarray(r3.normal(size=(2 * T, 10)), jnp.float32),
        "obj_rot": jnp.asarray(r3.normal(size=(2 * T, 3)), jnp.float32),
        "obj_rad": jnp.asarray(r3.normal(size=(2 * T,)), jnp.float32),
    }
    sm = ArcticSmoother(T)
    smp = sm.init({"params": jax.random.PRNGKey(2)}, sel)
    smo = sm.apply(smp, sel)
    for k in ("root.r", "pose.l", "obj_rad"):
        out[f"smoothnet.{k}_sum"] = float(jnp.sum(smo[k]))

    # --- Assembly 2.5D model forward ----------------------------------------
    from uvhand_tpu.models.assembly import AssemblyDETR

    am = AssemblyDETR(num_classes=12, num_encoder_layers=1,
                      num_decoder_layers=1, d_model=64)
    aimgs = jnp.asarray(np.random.default_rng(13).normal(size=(2, 64, 64, 3)),
                        jnp.float32)
    ap = am.init(jax.random.PRNGKey(3), aimgs)
    aout = am.apply(ap, aimgs)
    out["assembly.pred_logits_sum"] = float(jnp.sum(aout["stacked"]["pred_logits"]))
    out["assembly.pred_keypoints_sum"] = float(jnp.sum(aout["stacked"]["pred_keypoints"]))

    # --- full DETR forward (transformer + heads, deterministic) ------------
    from uvhand_tpu.models.detr import UVHandDETR

    model = UVHandDETR(
        num_queries=12, num_encoder_layers=1, num_decoder_layers=2,
        d_model=64, dim_feedforward=128, n_heads=4, dropout=0.0,
        feature_mask_ratio=0.0,
    )
    imgs = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 224, 224, 3)), jnp.float32
    )
    params = model.init({"params": jax.random.PRNGKey(0)}, imgs[:1])
    fwd = model.apply(params, imgs, train=False)
    for k, v_ in sorted(fwd["stacked"].items()):
        if v_ is not None:
            out[f"detr.{k}_sum"] = float(jnp.sum(v_))
    return out


def test_golden_checksums():
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    got = _checksums()
    assert set(got) == set(golden), (
        f"checksum key set changed: +{set(got)-set(golden)} "
        f"-{set(golden)-set(got)} — regenerate via the update protocol"
    )
    bad = {}
    for k, expect in golden.items():
        tol = RTOL * max(abs(expect), 1e-3)
        if not (abs(got[k] - expect) <= tol):
            bad[k] = (expect, got[k])
    assert not bad, f"golden drift: {bad}"


if __name__ == "__main__":
    import sys

    if "--update" in sys.argv:
        sys.path.insert(0, os.path.dirname(__file__))
        vals = _checksums()
        with open(GOLDEN_PATH, "w") as f:
            json.dump(vals, f, indent=2, sort_keys=True)
        print(f"wrote {len(vals)} checksums to {GOLDEN_PATH}")
    else:
        print(__doc__)

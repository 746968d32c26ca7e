"""Stage-by-stage reference-vs-ours divergence hunt (parity test debugging)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import torch  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from test_reference_parity import build_reference_model, build_ours

    ref_model, args = build_reference_model(two_stage=True)
    model, variables = build_ours(args, ref_model.state_dict(), two_stage=True)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))

    # ---- stage 1: backbone features
    from util.misc import nested_tensor_from_tensor_list

    samples = nested_tensor_from_tensor_list(timg)
    with torch.no_grad():
        feats, pos = ref_model.backbone(samples)
    ref_feats = [f.tensors.numpy().transpose(0, 2, 3, 1) for f in feats]
    ref_pos = [p.numpy().transpose(0, 2, 3, 1) for p in pos]

    our_feats = model.apply(variables, jnp.asarray(img), train=False,
                            return_backbone_features=True)
    for i, (r, o) in enumerate(zip(ref_feats, our_feats)):
        print(f"backbone[{i}]: shapes {r.shape} vs {np.asarray(o).shape}, "
              f"max err {np.abs(np.asarray(o) - r).max():.2e}")

    # ---- stage 2: position encodings
    from uvhand_tpu.models.posenc import sine_position_encoding

    for i, r in enumerate(ref_pos):
        H, W = r.shape[1:3]
        ours_pos = sine_position_encoding(jnp.zeros((1, H, W), bool), 128)
        print(f"pos[{i}]: max err {np.abs(np.asarray(ours_pos) - r).max():.2e}")

    # ---- stage 3: input projections
    with torch.no_grad():
        srcs_ref = [ref_model.input_proj[l](f.tensors) for l, f in enumerate(feats)]
        srcs_ref.append(ref_model.input_proj[3](feats[-1].tensors))
    import flax

    def apply_proj(l, x):
        sub = {"params": variables["params"][f"input_proj{l}"]}
        from uvhand_tpu.models.detr import InputProj
        return InputProj(256, extra_level=(l == 3)).apply(sub, x)

    for l in range(4):
        x_in = our_feats[min(l, 2)] if l < 3 else our_feats[-1]
        o = apply_proj(l, x_in)
        r = srcs_ref[l].numpy().transpose(0, 2, 3, 1)
        print(f"input_proj[{l}]: max err {np.abs(np.asarray(o) - r).max():.2e}")

    # ---- stage 4: full transformer I/O via hooks
    store = {}

    def hook(name):
        def f(mod, inp, out):
            store[name] = out
        return f

    ref_model.transformer.encoder.register_forward_hook(hook("enc_memory"))
    with torch.no_grad():
        ref_out = ref_model(timg)
    enc_ref = store["enc_memory"].numpy()

    # ours: capture via flax intermediates on the transformer's encoder
    out, mods = model.apply(
        variables, jnp.asarray(img), train=False,
        capture_intermediates=lambda mdl, name: name == "__call__",
    )
    inter = mods["intermediates"]

    def walk(d, path=""):
        for k, v in d.items():
            if k == "__call__":
                yield path, v
            elif isinstance(d[k], dict):
                yield from walk(d[k], f"{path}/{k}")

    paths = dict(walk(inter))
    # encoder memory = output of the last encoder layer
    last_enc = paths.get(
        f"/transformer/encoder_layer{args.enc_layers - 1}")
    if last_enc is not None:
        o = np.asarray(last_enc[0])
        print(f"enc memory: max err {np.abs(o - enc_ref).max():.2e}")

    for k in ("pred_logits", "pred_hand_key"):
        r = ref_out[k].numpy()
        o = np.asarray(out[k])
        print(f"{k}: max err {np.abs(o - r).max():.2e}")


if __name__ == "__main__":
    main()

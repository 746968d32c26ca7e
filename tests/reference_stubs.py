"""Import scaffolding for running the REFERENCE torch model on CPU.

The reference (`/root/reference`) expects CUDA, torchvision, timm, smplx,
trimesh and a compiled MultiScaleDeformableAttention extension — none of
which are in this image. The model's *forward pass* needs none of them:

  - torchvision: only `models.resnet50` + `IntermediateLayerGetter` +
    `ops.boxes.box_area` -> re-implemented below in plain torch with
    torchvision-compatible module names (the converter's name contract),
  - MSDeformAttnFunction: substituted with the reference's own pure-torch
    spec `ms_deform_attn_core_pytorch`
    (`models/ops/functions/ms_deform_attn_func.py:42-62`, "for debug and
    test"),
  - arctic_tools / timm: imported at module level but unused by forward ->
    attribute stubs.

`import_reference_detr()` returns the reference's `actic_detr` module with
everything patched, loaded under an isolated package so `models/__init__.py`
(which drags in the DINO/SLConfig world) never runs.
"""

from __future__ import annotations

import sys
import types
from collections import OrderedDict

REF = "/root/reference"


# ------------------------------------------------------- torch resnet50


def _make_torchvision_stub():
    import torch
    from torch import nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     norm_layer=None, dilation=1):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = norm_layer(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                                   padding=dilation, dilation=dilation, bias=False)
            self.bn2 = norm_layer(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = norm_layer(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, layers=(3, 4, 6, 3), norm_layer=nn.BatchNorm2d,
                     replace_stride_with_dilation=(False, False, False)):
            super().__init__()
            self._norm_layer = norm_layer
            self.inplanes = 64
            self.dilation = 1
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = norm_layer(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, layers[0])
            self.layer2 = self._make_layer(128, layers[1], 2, replace_stride_with_dilation[0])
            self.layer3 = self._make_layer(256, layers[2], 2, replace_stride_with_dilation[1])
            self.layer4 = self._make_layer(512, layers[3], 2, replace_stride_with_dilation[2])
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * 4, 1000)

        def _make_layer(self, planes, blocks, stride=1, dilate=False):
            norm_layer = self._norm_layer
            downsample = None
            prev_dil = self.dilation
            if dilate:
                self.dilation *= stride
                stride = 1
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                    norm_layer(planes * 4),
                )
            layers = [Bottleneck(self.inplanes, planes, stride, downsample,
                                 norm_layer, prev_dil)]
            self.inplanes = planes * 4
            layers += [
                Bottleneck(self.inplanes, planes, norm_layer=norm_layer,
                           dilation=self.dilation)
                for _ in range(1, blocks)
            ]
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(torch.flatten(self.avgpool(x), 1))

    def resnet50(pretrained=False, replace_stride_with_dilation=None,
                 norm_layer=nn.BatchNorm2d, **kw):
        del pretrained  # no weights download in this image; random init
        return ResNet(
            norm_layer=norm_layer,
            replace_stride_with_dilation=replace_stride_with_dilation
            or (False, False, False),
        )

    class IntermediateLayerGetter(nn.ModuleDict):
        def __init__(self, model, return_layers):
            orig = dict(return_layers)
            remaining = dict(return_layers)
            layers = OrderedDict()
            for name, module in model.named_children():
                layers[name] = module
                remaining.pop(name, None)
                if not remaining:
                    break
            super().__init__(layers)
            self.return_layers = orig

        def forward(self, x):
            out = OrderedDict()
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    tv = types.ModuleType("torchvision")
    tv.__version__ = "1.15"  # skip util/misc.py's <0.5/<0.7 compat branches
    tv_models = types.ModuleType("torchvision.models")
    tv_models.resnet50 = resnet50
    tv_utils = types.ModuleType("torchvision.models._utils")
    tv_utils.IntermediateLayerGetter = IntermediateLayerGetter
    tv_models._utils = tv_utils
    tv_ops = types.ModuleType("torchvision.ops")
    tv_boxes = types.ModuleType("torchvision.ops.boxes")

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    tv_boxes.box_area = box_area
    tv_boxes.nms = lambda *a, **k: None  # imported by dino.py, unused in fwd
    tv_ops.boxes = tv_boxes
    tv.models = tv_models
    tv.ops = tv_ops
    return {
        "torchvision": tv,
        "torchvision.models": tv_models,
        "torchvision.models._utils": tv_utils,
        "torchvision.ops": tv_ops,
        "torchvision.ops.boxes": tv_boxes,
    }


def _make_timm_stub():
    import torch
    from torch import nn

    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(t, std=1.0, **kw):
        with torch.no_grad():
            t.normal_(0, std).clamp_(-2 * std, 2 * std)
        return t

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_models.layers = layers
    timm.models = timm_models
    return {"timm": timm, "timm.models": timm_models,
            "timm.models.layers": layers}


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def install_stubs():
    """Insert every stub module the reference import chain touches."""
    mods = {}
    mods.update(_make_torchvision_stub())
    mods.update(_make_timm_stub())
    # compiled CUDA extension: never called (MSDeformAttnFunction is
    # monkeypatched to the pytorch spec after import)
    mods["MultiScaleDeformableAttention"] = _stub(
        "MultiScaleDeformableAttention",
        ms_deform_attn_forward=None, ms_deform_attn_backward=None,
    )
    # arctic_tools: module-level imports in actic_detr.py, unused by forward
    unused = lambda *a, **k: None
    mods["arctic_tools"] = _stub("arctic_tools")
    mods["arctic_tools.common"] = _stub("arctic_tools.common")
    mods["arctic_tools.common.body_models"] = _stub(
        "arctic_tools.common.body_models",
        build_mano_aa=unused, MANODecimator=unused,
    )
    mods["arctic_tools.common.object_tensors"] = _stub(
        "arctic_tools.common.object_tensors", ObjectTensors=unused
    )
    mods["arctic_tools.process"] = _stub(
        "arctic_tools.process", prepare_data=unused, get_arctic_item=unused
    )
    mods["arctic_tools.src"] = _stub("arctic_tools.src")
    mods["arctic_tools.src.callbacks"] = _stub("arctic_tools.src.callbacks")
    mods["arctic_tools.src.callbacks.loss"] = _stub("arctic_tools.src.callbacks.loss")
    mods["arctic_tools.src.callbacks.loss.loss_arctic_sf"] = _stub(
        "arctic_tools.src.callbacks.loss.loss_arctic_sf",
        compute_loss=unused, compute_small_loss=unused,
    )
    for name, mod in mods.items():
        sys.modules.setdefault(name, mod)

    # isolated `models` package: __path__ points at the reference tree but
    # models/__init__.py (which imports the whole DINO world) never runs
    if "models" not in sys.modules:
        pkg = types.ModuleType("models")
        pkg.__path__ = [f"{REF}/models"]
        sys.modules["models"] = pkg
    if REF not in sys.path:
        sys.path.append(REF)  # for `util.*`


def _spec_fn(core):
    class _SpecFn:
        @staticmethod
        def apply(value, shapes, level_start_index, loc, attn, im2col_step):
            return core(value.to(value.dtype), shapes, loc, attn)

    return _SpecFn


def import_reference_detr():
    """-> (actic_detr module, arctic_transformer module), MSDA patched to the
    pure-torch spec so the model runs on CPU."""
    install_stubs()
    import importlib

    func_mod = importlib.import_module("models.ops.functions.ms_deform_attn_func")
    modules_mod = importlib.import_module("models.ops.modules.ms_deform_attn")
    modules_mod.MSDeformAttnFunction = _spec_fn(func_mod.ms_deform_attn_core_pytorch)

    detr_mod = importlib.import_module("models.actic_detr")
    transformer_mod = importlib.import_module("models.arctic_transformer")
    return detr_mod, transformer_mod


def import_reference_assembly():
    """-> (assembly_detr module, assembly_transformer module), MSDA patched
    to the pure-torch spec so the AssemblyHands model runs on CPU."""
    install_stubs()
    import importlib

    func_mod = importlib.import_module("models.ops.functions.ms_deform_attn_func")
    modules_mod = importlib.import_module("models.ops.modules.ms_deform_attn")
    modules_mod.MSDeformAttnFunction = _spec_fn(func_mod.ms_deform_attn_core_pytorch)

    detr_mod = importlib.import_module("models.assembly_detr")
    transformer_mod = importlib.import_module("models.assembly_transformer")
    return detr_mod, transformer_mod


def _make_library_stubs(rot_mod):
    """loguru / smplx / trimesh / easydict / pytorch3d stand-ins for the
    arctic_tools import chain. The pytorch3d rotation functions alias the
    reference's OWN `common/rot.py` (its vendored pytorch3d copy), so the
    reference loss code computes rotations with the reference's exact math.
    knn is a brute-force exact substitute (pytorch3d returns SQUARED dists).
    """
    import torch

    def axis_angle_to_matrix(aa):
        return rot_mod.quaternion_to_matrix(rot_mod.axis_angle_to_quaternion(aa))

    def knn_points(p1, p2, lengths1=None, lengths2=None, K=1, **kw):
        d = torch.cdist(p1.float(), p2.float()) ** 2
        dists, idx = torch.topk(d, K, dim=2, largest=False)
        return types.SimpleNamespace(dists=dists, idx=idx)

    def knn_gather(x, idx):
        # x (B, M, D), idx (B, N, K) -> (B, N, K, D)
        B, N, K = idx.shape
        flat = idx.reshape(B, N * K)
        out = torch.gather(x, 1, flat[..., None].expand(-1, -1, x.shape[-1]))
        return out.reshape(B, N, K, x.shape[-1])

    class Meshes:
        """verts_normals per pytorch3d: accumulate un-normalized face cross
        products onto vertices, then L2-normalize."""

        def __init__(self, verts, faces):
            self.verts, self.faces = verts, faces

        def verts_normals_packed(self):
            v, f = self.verts, self.faces
            B = v.shape[0]
            normals = torch.zeros_like(v)
            for b in range(B):
                tri = v[b][f[b]]  # (F, 3, 3)
                fn = torch.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0], dim=1)
                for k in range(3):
                    normals[b].index_add_(0, f[b][:, k], fn)
            return torch.nn.functional.normalize(normals, dim=-1).reshape(-1, 3)

    p3d = types.ModuleType("pytorch3d")
    p3d_t = types.ModuleType("pytorch3d.transforms")
    p3d_rc = types.ModuleType("pytorch3d.transforms.rotation_conversions")
    p3d_rc.axis_angle_to_matrix = axis_angle_to_matrix
    p3d_t.axis_angle_to_matrix = axis_angle_to_matrix
    p3d_t.matrix_to_axis_angle = rot_mod.matrix_to_axis_angle
    p3d_t.rotation_conversions = p3d_rc
    p3d_s = types.ModuleType("pytorch3d.structures")
    p3d_s.Meshes = Meshes
    p3d_o = types.ModuleType("pytorch3d.ops")
    p3d_knn = types.ModuleType("pytorch3d.ops.knn")
    p3d_knn.knn_points = knn_points
    p3d_knn.knn_gather = knn_gather
    p3d_o.knn = p3d_knn
    p3d_o.knn_points = knn_points
    p3d.transforms = p3d_t
    p3d.structures = p3d_s
    p3d.ops = p3d_o

    class _Logger:
        def __getattr__(self, _):
            return lambda *a, **k: None

    class EasyDict(dict):
        __getattr__ = dict.__getitem__
        __setattr__ = dict.__setitem__  # type: ignore[assignment]

    class _MANO:  # never instantiated (pre_process_models are passed in)
        def __init__(self, *a, **k):
            raise RuntimeError("smplx stub: MANO models are not available")

    mods = {
        "pytorch3d": p3d,
        "pytorch3d.transforms": p3d_t,
        "pytorch3d.transforms.rotation_conversions": p3d_rc,
        "pytorch3d.structures": p3d_s,
        "pytorch3d.ops": p3d_o,
        "pytorch3d.ops.knn": p3d_knn,
        "loguru": _stub("loguru", logger=_Logger()),
        "smplx": _stub("smplx", MANO=_MANO),
        # common/mesh.py subclasses trimesh.Trimesh at module level
        "trimesh": _stub("trimesh", Trimesh=object, load=_MANO),
        "easydict": _stub("easydict", EasyDict=EasyDict),
    }
    for name, mod in mods.items():
        sys.modules.setdefault(name, mod)


def import_reference_loss():
    """-> SimpleNamespace with the REAL reference loss/eval/matcher modules,
    importable + runnable on CPU.

    Replaces the `install_stubs()` placeholder entries for `arctic_tools.*`
    with proper namespace packages rooted at the reference tree (plus the
    top-level `common`/`src` aliases its intra-package imports use), so
    `loss_arctic_sf.compute_small_loss` / `SetArcticCriterion` run the
    reference's actual code — not a stub.
    """
    install_stubs()
    import importlib

    for k in list(sys.modules):
        if k == "arctic_tools" or k.startswith("arctic_tools."):
            del sys.modules[k]

    def pkg(name, path):
        m = types.ModuleType(name)
        m.__path__ = [path]
        sys.modules[name] = m
        return m

    pkg("arctic_tools", f"{REF}/arctic_tools")
    if not hasattr(sys.modules.get("common"), "__path__"):
        pkg("common", f"{REF}/arctic_tools/common")
    if not hasattr(sys.modules.get("src"), "__path__"):
        pkg("src", f"{REF}/arctic_tools/src")

    rot = importlib.import_module("common.rot")
    _make_library_stubs(rot)

    ref = types.SimpleNamespace(rot=rot)
    ref.camera = importlib.import_module("arctic_tools.common.camera")
    ref.transforms = importlib.import_module("arctic_tools.common.transforms")
    ref.data_utils = importlib.import_module("arctic_tools.common.data_utils")
    ref.loss_modules = importlib.import_module(
        "arctic_tools.src.utils.loss_modules")
    ref.loss_arctic_sf = importlib.import_module(
        "arctic_tools.src.callbacks.loss.loss_arctic_sf")
    ref.eval_modules = importlib.import_module(
        "arctic_tools.src.utils.eval_modules")
    ref.process = importlib.import_module("arctic_tools.process")
    ref.matcher = importlib.import_module("models.matcher")
    return ref


def import_reference_dataset():
    """-> (arctic_dataset module, tempo_inference_dataset module): the
    reference's REAL data-loading code (`arctic_tools/src/datasets/
    arctic_dataset.py`, `tempo_inference_dataset.py`), importable and
    runnable on CPU against an ARCTIC-layout disk root.

    Only two things are substituted, neither of them data-path code:
      - `torchvision.transforms.Normalize` (trivial mean/std op, torchvision
        absent in this image),
      - `ObjectTensors` must be monkeypatched by the CALLER on the returned
        module (the real one loads licensed object meshes from disk); the
        dataset only reads `.obj_tensors["kp_bottom"]` (mm) and `["names"]`.
    Everything else — get_valid, downsample, speedup transforms, augm_params,
    j2d/rgb/pose processing, the DETR keypoint renorm, ego-K pinning — runs
    the reference's own lines.
    """
    ref = import_reference_loss()  # namespace pkgs + library stand-ins
    del ref
    import importlib

    import torch

    if "torchvision.transforms" not in sys.modules:
        tvt = types.ModuleType("torchvision.transforms")

        class Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean, dtype=torch.float32).view(-1, 1, 1)
                self.std = torch.tensor(std, dtype=torch.float32).view(-1, 1, 1)

            def __call__(self, x):
                return (x - self.mean) / self.std

        tvt.Normalize = Normalize
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision"].transforms = tvt

    ds_mod = importlib.import_module("src.datasets.arctic_dataset")
    tempo_mod = importlib.import_module("src.datasets.tempo_inference_dataset")
    return ds_mod, tempo_mod


import contextlib


@contextlib.contextmanager
def torch_cuda_as_cpu():
    """Remap the reference's hard-coded `.to('cuda')` / `.cuda()` calls
    (e.g. actic_detr.py loss_labels/loss_boxes, loss_arctic_sf zero-branches)
    to CPU for the duration of the block."""
    import torch

    orig_to, orig_cuda = torch.Tensor.to, torch.Tensor.cuda

    def _is_cuda(x):
        return (isinstance(x, str) and x.startswith("cuda")) or (
            isinstance(x, torch.device) and x.type == "cuda")

    def _to(self, *args, **kwargs):
        args = tuple("cpu" if _is_cuda(a) else a for a in args)
        if _is_cuda(kwargs.get("device")):
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    try:
        torch.Tensor.to = _to
        torch.Tensor.cuda = lambda self, *a, **k: self
        yield
    finally:
        torch.Tensor.to = orig_to
        torch.Tensor.cuda = orig_cuda


def import_reference_dino():
    """-> (dino module, dino deformable_transformer module); the DINO tree
    carries its OWN copy of the MSDA extension (`models/dino/ops/`), patched
    the same way to its pure-torch spec
    (`models/dino/ops/functions/ms_deform_attn_func.py:43-63`)."""
    install_stubs()
    import importlib

    func_mod = importlib.import_module(
        "models.dino.ops.functions.ms_deform_attn_func")
    modules_mod = importlib.import_module(
        "models.dino.ops.modules.ms_deform_attn")
    modules_mod.MSDeformAttnFunction = _spec_fn(
        func_mod.ms_deform_attn_core_pytorch)

    dino_mod = importlib.import_module("models.dino.dino")
    tr_mod = importlib.import_module("models.dino.deformable_transformer")
    return dino_mod, tr_mod

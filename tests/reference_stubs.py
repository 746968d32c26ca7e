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

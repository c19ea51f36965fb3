"""One-time offline derivation of the reference checkpoints' exact key
inventories (names + shapes), used to build the converter fixtures.

Instantiates the reference torch models from /root/reference (read-only)
for every shipped config plus the FB DINOv2 backbone layouts (flat and
chunked-blocks, reference backbones/dinov2.py:240-249 BlockChunk), and
dumps {key: shape} JSON. The committed fixtures make the converter tests
independent of the reference mount; re-run this script only to refresh
them.

Missing heavy deps (torchvision/timm/wandb) are stubbed with
structure-faithful stand-ins: only parameter *names and shapes* matter
here, and the stubs mirror timm's module layouts (Mlp = fc1/fc2,
GlobalResponseNormMlp = fc1/grn/fc2, create_conv2d = nn.Conv2d).
"""

import json
import sys
import types
from pathlib import Path

import torch
import torch.nn as nn

OUT = Path(__file__).parent


def _install_stubs():
    # Idempotent: already-imported reference modules hold references to the
    # existing stub objects (``import torchvision...functional as TF`` binds
    # the module object), so re-installing fresh ones would leave later
    # monkeypatches (e.g. test_infer_reference_parity's TF.normalize) on
    # objects the reference never sees.
    if getattr(sys.modules.get("torchvision"), "__unidepth_stub__", False):
        return
    # torchvision: only used inside infer()/preprocess at runtime
    tv = types.ModuleType("torchvision")
    tv.__unidepth_stub__ = True
    tf = types.ModuleType("torchvision.transforms")
    tff = types.ModuleType("torchvision.transforms.functional")
    tv2 = types.ModuleType("torchvision.transforms.v2")
    tv2f = types.ModuleType("torchvision.transforms.v2.functional")
    tv.transforms = tf
    tf.functional = tff
    tf.v2 = tv2
    tv2.functional = tv2f
    for name, mod in [
        ("torchvision", tv),
        ("torchvision.transforms", tf),
        ("torchvision.transforms.functional", tff),
        ("torchvision.transforms.v2", tv2),
        ("torchvision.transforms.v2.functional", tv2f),
    ]:
        sys.modules[name] = mod

    wandb = types.ModuleType("wandb")
    wandb.Image = object
    wandb.log = lambda *a, **k: None
    sys.modules["wandb"] = wandb

    # timm.layers: structure-faithful parameter layouts
    timm = types.ModuleType("timm")
    layers = types.ModuleType("timm.layers")

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, bias=True, drop=0.0, use_conv=False):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            linear = (lambda i, o: nn.Conv2d(i, o, 1, bias=bias)) if use_conv else (
                lambda i, o: nn.Linear(i, o, bias=bias))
            self.fc1 = linear(in_features, hidden_features)
            self.act = act_layer() if isinstance(act_layer, type) else act_layer()
            self.fc2 = linear(hidden_features, out_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class GlobalResponseNorm(nn.Module):
        def __init__(self, dim, channels_last=True):
            super().__init__()
            self.weight = nn.Parameter(torch.zeros(dim))
            self.bias = nn.Parameter(torch.zeros(dim))

        def forward(self, x):
            return x

    class GlobalResponseNormMlp(Mlp):
        def __init__(self, in_features, hidden_features=None, **kw):
            super().__init__(in_features, hidden_features, **kw)
            hidden_features = hidden_features or in_features
            self.grn = GlobalResponseNorm(hidden_features)

        def forward(self, x):
            return self.fc2(self.grn(self.act(self.fc1(x))))

    class LayerNorm(nn.LayerNorm):
        # timm/layers/norm.py defaults eps=1e-6 (vs torch's 1e-5) — the
        # discrepancy is ~2e-3 relative on small-variance activations, so
        # the stub must carry timm's default for parity tests to gate at
        # 1e-4
        def __init__(self, num_channels, eps=1e-6, affine=True):
            super().__init__(num_channels, eps=eps, elementwise_affine=affine)

    class LayerNorm2d(LayerNorm):
        def forward(self, x):
            return super().forward(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

    class DropPath(nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    class AvgPool2dSame(nn.AvgPool2d):
        pass

    def create_conv2d(in_chs, out_chs, kernel_size, stride=1, dilation=1,
                      depthwise=False, bias=True, **kw):
        groups = in_chs if depthwise else 1
        pad = (kernel_size - 1) // 2 * dilation
        return nn.Conv2d(in_chs, out_chs, kernel_size, stride=stride,
                         padding=pad, dilation=dilation, groups=groups, bias=bias)

    def get_act_layer(name):
        return nn.GELU if name in ("gelu", nn.GELU) else nn.GELU

    def make_divisible(v, divisor=8):
        return max(divisor, int(v + divisor / 2) // divisor * divisor)

    def to_ntuple(n):
        def parse(x):
            return tuple(x) if isinstance(x, (tuple, list)) else (x,) * n
        return parse

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    layers.Mlp = Mlp
    layers.GlobalResponseNormMlp = GlobalResponseNormMlp
    layers.GlobalResponseNorm = GlobalResponseNorm
    layers.LayerNorm = LayerNorm
    layers.LayerNorm2d = LayerNorm2d
    layers.DropPath = DropPath
    layers.AvgPool2dSame = AvgPool2dSame
    layers.create_conv2d = create_conv2d
    layers.get_act_layer = get_act_layer
    layers.make_divisible = make_divisible
    layers.to_ntuple = to_ntuple
    layers.trunc_normal_ = trunc_normal_
    timm.layers = layers
    sys.modules["timm"] = timm
    sys.modules["timm.layers"] = layers
    # legacy alias used by v1 decoder: timm.models.layers
    models = types.ModuleType("timm.models")
    models.layers = layers
    timm.models = models
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def main():
    _install_stubs()
    sys.path.insert(0, "/root/reference")
    inventory = {}

    from unidepth.models import UniDepthV1, UniDepthV2, UniDepthV2old

    cls_by_cfg = {
        "config_v1_vitl14": UniDepthV1,
        "config_v1_cnvnxtl": UniDepthV1,
        "config_v2_vits14": UniDepthV2,
        "config_v2_vitb14": UniDepthV2,
        "config_v2_vitl14": UniDepthV2,
        "config_v2old_vits14": UniDepthV2old,
        "config_v2old_vitl14": UniDepthV2old,
    }
    for name, cls in cls_by_cfg.items():
        cfg = json.load(open(f"/root/reference/configs/{name}.json"))
        torch.manual_seed(0)
        model = cls(cfg)
        inventory[name] = {k: list(v.shape) for k, v in model.state_dict().items()}
        print(name, len(inventory[name]), "keys")

    # FB DINOv2 released-backbone layouts: flat (block_chunks=0) and the
    # chunked FSDP layout blocks.{chunk}.{global_i}.* that FB training
    # checkpoints carry (reference backbones/dinov2.py:240-249)
    from unidepth.models.backbones.dinov2 import vit_large, vit_small

    for name, fn, chunks in [
        ("dinov2_vits14_flat", vit_small, 0),
        ("dinov2_vitl14_flat", vit_large, 0),
        ("dinov2_vitl14_chunked4", vit_large, 4),
    ]:
        m = fn(patch_size=14, block_chunks=chunks, init_values=1.0,
               output_idx=[6, 12, 18, 24] if "vitl" in name else [3, 6, 9, 12])
        inventory[name] = {k: list(v.shape) for k, v in m.state_dict().items()}
        print(name, len(inventory[name]), "keys")

    out = OUT / "reference_state_dict_keys.json"
    out.write_text(json.dumps(inventory, indent=0, sort_keys=True))
    print("wrote", out)


if __name__ == "__main__":
    main()

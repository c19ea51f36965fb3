"""Convert reference PyTorch checkpoints into unidepth_tpu param pytrees.

Key-mapping tables for the UniDepthV2 state dict
(reference unidepthv2.py:381-394 strips ``module.`` prefixes; HF Hub stores
``pytorch_model.bin``/``model.safetensors`` with ``pixel_encoder.*`` /
``pixel_decoder.*`` roots). Everything is handled host-side with numpy —
no torch dependency at inference time (torch is only needed to *read*
``.bin`` files; safetensors parse natively).
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np

__all__ = ["convert_v2_state_dict", "torch_linear", "torch_conv"]


def torch_linear(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> linen Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def torch_conv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O, I, kh, kw) -> linen (kh, kw, I, O)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _dense(sd, prefix, bias=True):
    out = {"kernel": torch_linear(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv(sd, prefix):
    return {
        "conv": {
            "kernel": torch_conv(sd[f"{prefix}.weight"]),
            "bias": sd[f"{prefix}.bias"],
        }
    }


def _mlp(sd, prefix):
    return {
        "norm": _ln(sd, f"{prefix}.norm"),
        "proj1": _dense(sd, f"{prefix}.proj1"),
        "proj2": _dense(sd, f"{prefix}.proj2"),
    }


def _attention_block(sd, prefix, layer_scale=True):
    out = {
        "norm_attnx": _ln(sd, f"{prefix}.norm_attnx"),
        "norm_attnctx": _ln(sd, f"{prefix}.norm_attnctx"),
        "kv": _dense(sd, f"{prefix}.kv"),
        "q": _dense(sd, f"{prefix}.q"),
        "out": _dense(sd, f"{prefix}.out"),
        "mlp": _mlp(sd, f"{prefix}.mlp"),
    }
    if layer_scale and f"{prefix}.ls1.gamma" in sd:
        out["ls1"] = {"gamma": sd[f"{prefix}.ls1.gamma"]}
        out["ls2"] = {"gamma": sd[f"{prefix}.ls2.gamma"]}
    return out


def _stack(trees: list) -> dict:
    """Stack a list of identical param trees along a new leading axis
    (for nn.scan-ed ViT block segments)."""
    out = {}
    for key in trees[0]:
        vals = [t[key] for t in trees]
        if isinstance(vals[0], Mapping):
            out[key] = _stack(vals)
        else:
            out[key] = np.stack(vals, axis=0)
    return out


def _flatten_chunked_blocks(sd: dict) -> dict:
    """Remap the FSDP chunked-blocks layout ``blocks.{chunk}.{i}.*`` that FB
    DINOv2 training checkpoints carry to the flat ``blocks.{i}.*`` layout
    (reference backbones/dinov2.py:240-249 BlockChunk pads each chunk with
    Identity modules so the inner index stays the GLOBAL block index)."""
    if not any(re.match(r"blocks\.\d+\.\d+\.", k) for k in sd):
        return sd
    return {re.sub(r"^blocks\.\d+\.(\d+)\.", r"blocks.\1.", k): v for k, v in sd.items()}


def convert_encoder(
    sd: dict,
    output_idx: tuple[int, ...],
    num_register_tokens: int = 0,
    use_norm: bool = True,  # standalone-backbone default, matches ViTConfig
) -> dict:
    """DINOv2 ViT weights -> DinoViT params (models/backbones/dinov2.py).

    Accepts both the flat ``blocks.{i}`` layout (UniDepth checkpoints,
    block_chunks=0) and FB's chunked ``blocks.{chunk}.{i}`` layout.
    ``num_register_tokens`` must come from the config: the reference keeps
    a dormant (1, 1, C) ``register_tokens`` parameter even when registers
    are disabled (dinov2.py:196-198 ``max(1, num_register_tokens)``), so
    the checkpoint shape alone cannot distinguish used from unused.
    Likewise the final ``norm`` LayerNorm is always present in checkpoints
    (dinov2.py:254) but only applied when use_norm (V1 configs disable
    it), so inclusion is config-driven too."""
    sd = _flatten_chunked_blocks(sd)
    p = {}
    pw = sd["patch_embed.proj.weight"]  # (C, 3, p, p)
    c = pw.shape[0]
    p["patch_kernel"] = np.ascontiguousarray(
        pw.transpose(2, 3, 1, 0).reshape(-1, c)
    )
    p["patch_bias"] = sd["patch_embed.proj.bias"]
    p["cls_token"] = sd["cls_token"]
    p["pos_embed"] = sd["pos_embed"]
    if num_register_tokens > 0:
        p["register_tokens"] = sd["register_tokens"][:, :num_register_tokens]

    def block(i):
        pre = f"blocks.{i}"
        out = {
            "norm1": _ln(sd, f"{pre}.norm1"),
            "qkv": _dense(sd, f"{pre}.attn.qkv"),
            "proj": _dense(sd, f"{pre}.attn.proj"),
            "norm2": _ln(sd, f"{pre}.norm2"),
        }
        if f"{pre}.ls1.gamma" in sd:
            out["ls1_gamma"] = sd[f"{pre}.ls1.gamma"]
            out["ls2_gamma"] = sd[f"{pre}.ls2.gamma"]
        if f"{pre}.mlp.fc1.weight" in sd:
            out["fc1"] = _dense(sd, f"{pre}.mlp.fc1")
            out["fc2"] = _dense(sd, f"{pre}.mlp.fc2")
        else:  # swiglu
            out["w12"] = _dense(sd, f"{pre}.mlp.w12")
            out["w3"] = _dense(sd, f"{pre}.mlp.w3")
        return out

    boundaries = [0, *output_idx]
    for si in range(len(output_idx)):
        blocks = [block(i) for i in range(boundaries[si], boundaries[si + 1])]
        p[f"stage_{si}"] = _stack(blocks)
    if use_norm and "norm.weight" in sd:
        p["norm"] = _ln(sd, "norm")
    return p


def convert_v2_decoder(sd: dict, num_resolutions: int = 4, num_levels: int = 3) -> dict:
    """V2 Decoder weights -> Decoder params (models/unidepthv2/decoder.py)."""
    p = {}
    for i in range(num_resolutions):
        p[f"input_adapter_{i}"] = _dense(sd, f"input_adapter.input_adapters.{i}")
        p[f"camera_token_adapter_{i}"] = _dense(
            sd, f"camera_token_adapter.input_adapters.{i}"
        )
    p["level_embeds"] = sd["level_embeds"].reshape(num_resolutions, -1)

    cam = {
        "latents_pos": sd["camera_layer.latents_pos"],
        "project": _mlp(sd, "camera_layer.project"),
        "out_pinhole": _mlp(sd, "camera_layer.out_pinhole"),
        "aggregate1": _attention_block(sd, "camera_layer.aggregate1"),
        "aggregate2": _attention_block(sd, "camera_layer.aggregate2"),
    }
    p["camera_layer"] = cam

    d = {"to_latents": _dense(sd, "depth_layer.to_latents")}
    for i in range(4):
        layers = {}
        j = 0
        while f"depth_layer.prompt_camera.{i}.layers.{j}.q.weight" in sd:
            layers[f"layers_{j}"] = _attention_block(
                sd, f"depth_layer.prompt_camera.{i}.layers.{j}", layer_scale=False
            )
            j += 1
        d[f"prompt_camera_{i}"] = layers
    for i in range(num_levels):
        w = sd[f"depth_layer.process_features.{i}.weight"]  # ConvT (in,out,k,k)
        d[f"process_features_{i}"] = {
            "kernel": np.ascontiguousarray(w.transpose(0, 2, 3, 1)),
            "bias": sd[f"depth_layer.process_features.{i}.bias"],
        }
        ups = {"up_proj": _conv(sd, f"depth_layer.ups.{i}.up.0")}
        j = 0
        while f"depth_layer.ups.{i}.convs.{j}.conv1.weight" in sd:
            pre = f"depth_layer.ups.{i}.convs.{j}"
            unit = {
                "conv1": _conv(sd, f"{pre}.conv1"),
                "conv2": _conv(sd, f"{pre}.conv2"),
            }
            if f"{pre}.gamma" in sd:
                unit["gamma"] = sd[f"{pre}.gamma"].reshape(-1)
            ups[f"convs_{j}"] = unit
            j += 1
        d[f"ups_{i}"] = ups

    last = num_levels - 1
    d["depth_norm"] = _ln(sd, f"depth_layer.depth_mlp.{last}.0")
    d["depth_linear"] = _dense(sd, f"depth_layer.depth_mlp.{last}.1")
    d["conf_norm"] = _ln(sd, "depth_layer.confidence_mlp.0")
    d["conf_linear"] = _dense(sd, "depth_layer.confidence_mlp.1")
    d["to_depth_lr"] = _conv(sd, "depth_layer.to_depth_lr")
    d["to_conf_lr"] = _conv(sd, "depth_layer.to_confidence_lr")
    d["to_depth_hr1"] = _conv(sd, "depth_layer.to_depth_hr.0")
    d["to_depth_hr2"] = _conv(sd, "depth_layer.to_depth_hr.2")
    d["to_conf_hr1"] = _conv(sd, "depth_layer.to_confidence_hr.0")
    d["to_conf_hr2"] = _conv(sd, "depth_layer.to_confidence_hr.2")
    p["depth_layer"] = d
    return p


def _normalize_root(state_dict: Mapping) -> dict:
    """Reference load_pretrained semantics (unidepthv2.py:381-394): unwrap a
    ``{"model": ...}`` checkpoint wrapper and drop ``module.`` DDP prefixes
    anywhere in the key (the reference uses str.replace, not a regex)."""
    if "model" in state_dict and isinstance(state_dict["model"], Mapping):
        state_dict = state_dict["model"]
    return {
        k.replace("module.", ""): np.asarray(v, dtype=np.float32)
        for k, v in state_dict.items()
    }


def convert_v2_state_dict(
    state_dict: Mapping[str, np.ndarray],
    output_idx: tuple[int, ...],
    num_levels: int = 3,
    num_register_tokens: int = 0,
    use_norm: bool = False,  # matches from_config default (reference encoder.py:150)
) -> dict:
    """Full UniDepthV2 torch state dict -> {'encoder', 'decoder'} pytree."""
    sd = _normalize_root(state_dict)
    enc = {k[len("pixel_encoder."):]: v for k, v in sd.items() if k.startswith("pixel_encoder.")}
    dec = {k[len("pixel_decoder."):]: v for k, v in sd.items() if k.startswith("pixel_decoder.")}
    return {
        "encoder": convert_encoder(enc, output_idx, num_register_tokens, use_norm),
        "decoder": convert_v2_decoder(dec, num_levels=num_levels),
    }


# ---------------------------------------------------------------------------
# V1 + ConvNeXt converters
# ---------------------------------------------------------------------------


def _v1_adapter(sd, prefix):
    # torch Sequential(LayerNorm, Linear, GELU) (v1 decoder.py:21-36)
    return {
        "norm": _ln(sd, f"{prefix}.0"),
        "linear": _dense(sd, f"{prefix}.1"),
    }


def convert_v1_decoder(sd: dict, num_resolutions: int = 4) -> dict:
    """V1 Decoder weights -> DecoderV1 params (models/unidepthv1/decoder.py)."""
    p = {}
    for i in range(num_resolutions):
        p[f"input_adapter_{i}"] = _v1_adapter(sd, f"input_adapter.input_adapters.{i}")
        p[f"token_adapter_{i}"] = _v1_adapter(sd, f"token_adapter.input_adapters.{i}")
    p["level_embeds"] = sd["level_embeds"]
    p["le_fc1"] = _dense(sd, "level_embed_layer.0")
    p["le_fc2"] = _dense(sd, "level_embed_layer.2")
    p["le_norm"] = _ln(sd, "level_embed_layer.3")

    cam = {
        "latents_pos": sd["camera_layer.latents_pos"],
        "cls_norm": _ln(sd, "camera_layer.cls_project.0"),
        "cls_fc1": _dense(sd, "camera_layer.cls_project.1"),
        "cls_fc2": _dense(sd, "camera_layer.cls_project.3"),
        "in_features": _mlp(sd, "camera_layer.in_features"),
        "aggregate": _attention_block(sd, "camera_layer.aggregate"),
        "out": _mlp(sd, "camera_layer.out"),
    }
    i = 0
    while f"camera_layer.layers.{i}.q.weight" in sd:
        cam[f"layers_{i}"] = _attention_block(sd, f"camera_layer.layers.{i}")
        i += 1
    p["camera_layer"] = cam

    d = {
        "project_rays16": _mlp(sd, "depth_layer.project_rays16"),
        "project_rays8": _mlp(sd, "depth_layer.project_rays8"),
        "project_rays4": _mlp(sd, "depth_layer.project_rays4"),
        "to_latents": _mlp(sd, "depth_layer.to_latents"),
        "features_channel_cat": _dense(sd, "depth_layer.features_channel_cat"),
        "aggregate_16": _attention_block(sd, "depth_layer.aggregate_16"),
        "prompt_camera": _attention_block(sd, "depth_layer.prompt_camera"),
    }
    for scale in (16, 8, 4):
        j = 0
        while f"depth_layer.layers_{scale}.{j}.q.weight" in sd:
            d[f"layers_{scale}_{j}"] = _attention_block(
                sd, f"depth_layer.layers_{scale}.{j}"
            )
            j += 1
    for scale in (8, 4, 2):
        pre = f"depth_layer.up{scale}"
        up = {}
        j = 0
        while f"{pre}.convs.{j}.dwconv.weight" in sd:
            up[f"convs_{j}"] = {
                "dwconv": {
                    "conv": {
                        "kernel": torch_conv(sd[f"{pre}.convs.{j}.dwconv.weight"]),
                        "bias": sd[f"{pre}.convs.{j}.dwconv.bias"],
                    }
                },
                "norm": _ln(sd, f"{pre}.convs.{j}.norm"),
                "pwconv1": _dense(sd, f"{pre}.convs.{j}.pwconv1"),
                "pwconv2": _dense(sd, f"{pre}.convs.{j}.pwconv2"),
                "gamma": sd[f"{pre}.convs.{j}.gamma"],
            }
            j += 1
        up["up_conv1"] = _conv(sd, f"{pre}.up.0")
        up["up_conv2"] = _conv(sd, f"{pre}.up.2")
        d[f"up{scale}"] = up
        d[f"out{scale}"] = _conv(sd, f"depth_layer.out{scale}")
    p["depth_layer"] = d
    return p


def normalize_convnext_state_dict(sd: Mapping) -> dict:
    """Accept any of the three ConvNeXt checkpoint layouts in the wild and
    return timm-layout keys (behavioral parity with reference
    backbones/convnext.py:512-563 checkpoint_filter_fn):

      * timm:  ``stem.0 / stages.{s}.blocks.{j}.conv_dw`` — passthrough;
      * CLIP (open_clip, laion): image tower under ``visual.trunk.`` —
        stripped, heads dropped;
      * FB (facebookresearch releases, possibly under a ``model`` wrapper):
        ``downsample_layers.{s} / stages.{s}.{j}.dwconv/pwconv/grn``.
    """
    import re

    if "model" in sd and isinstance(sd["model"], Mapping):
        sd = sd["model"]
    if any(k.startswith("visual.trunk.") for k in sd):
        sd = {
            k[len("visual.trunk.") :]: v
            for k, v in sd.items()
            if k.startswith("visual.trunk.")
        }
    if "stem.0.weight" in sd or "norm_pre.weight" in sd:
        # timm layout; fold convnextv2 'mlp.grn.*' into the 'grn.*' names
        # the converter reads
        return {k.replace(".mlp.grn.", ".grn."): v for k, v in sd.items()}
    out = {}
    for k, v in sd.items():
        k = k.replace("downsample_layers.0.", "stem.")
        k = re.sub(r"stages\.(\d+)\.(\d+)\.", r"stages.\1.blocks.\2.", k)
        k = re.sub(r"downsample_layers\.(\d+)\.(\d+)\.", r"stages.\1.downsample.\2.", k)
        k = k.replace(".dwconv.", ".conv_dw.")
        k = k.replace(".pwconv1.", ".mlp.fc1.").replace(".pwconv2.", ".mlp.fc2.")
        k = k.replace(".grn.beta", ".grn.bias").replace(".grn.gamma", ".grn.weight")
        out[k] = v
    return out


def convert_convnext(sd: dict, depths=(3, 3, 27, 3)) -> dict:
    """timm/FB/CLIP ConvNeXt weights -> ConvNeXt params
    (reference backbones/convnext.py naming: stem.0/1, stages.{s}.downsample,
    stages.{s}.blocks.{j}.{conv_dw,norm,mlp.fc1,mlp.fc2,gamma}; non-timm
    layouts normalized first, reference convnext.py:512)."""
    sd = normalize_convnext_state_dict(sd)
    p = {
        "stem_conv": {
            "kernel": torch_conv(sd["stem.0.weight"]),
            "bias": sd["stem.0.bias"],
        },
        "stem_norm": _ln(sd, "stem.1"),
    }

    def block(s, j):
        pre = f"stages.{s}.blocks.{j}"
        dw_key = f"{pre}.conv_dw.weight" if f"{pre}.conv_dw.weight" in sd else f"{pre}.dwconv.weight"
        dw_bias = dw_key.replace("weight", "bias")
        mlp1 = f"{pre}.mlp.fc1" if f"{pre}.mlp.fc1.weight" in sd else f"{pre}.pwconv1"
        mlp2 = f"{pre}.mlp.fc2" if f"{pre}.mlp.fc2.weight" in sd else f"{pre}.pwconv2"
        out = {
            "dwconv": {
                "conv": {
                    "kernel": torch_conv(sd[dw_key]),
                    "bias": sd[dw_bias],
                }
            },
            "norm": _ln(sd, f"{pre}.norm"),
            "pwconv1": _dense(sd, mlp1),
            "pwconv2": _dense(sd, mlp2),
        }
        if f"{pre}.gamma" in sd:
            out["gamma"] = sd[f"{pre}.gamma"].reshape(-1)
        if f"{pre}.grn.weight" in sd:
            out["grn_gamma"] = sd[f"{pre}.grn.weight"].reshape(-1)
            out["grn_beta"] = sd[f"{pre}.grn.bias"].reshape(-1)
        return out

    for s, depth in enumerate(depths):
        if s > 0:
            p[f"down_norm_{s}"] = _ln(sd, f"stages.{s}.downsample.0")
            p[f"down_conv_{s}"] = {
                "kernel": torch_conv(sd[f"stages.{s}.downsample.1.weight"]),
                "bias": sd[f"stages.{s}.downsample.1.bias"],
            }
        p[f"stage_{s}"] = _stack([block(s, j) for j in range(depth)])
    return p


def convert_v1_state_dict(
    state_dict: Mapping[str, np.ndarray],
    output_idx: tuple[int, ...] = (5, 12, 18, 24),
    backbone: str = "dinov2",
    num_register_tokens: int = 0,
    use_norm: bool = False,
) -> dict:
    """Full UniDepthV1 torch state dict -> {'encoder', 'decoder'} pytree."""
    sd = _normalize_root(state_dict)
    enc = {k[len("pixel_encoder."):]: v for k, v in sd.items() if k.startswith("pixel_encoder.")}
    dec = {k[len("pixel_decoder."):]: v for k, v in sd.items() if k.startswith("pixel_decoder.")}
    if backbone == "dinov2":
        encoder = convert_encoder(enc, output_idx, num_register_tokens, use_norm)
    else:
        encoder = convert_convnext(enc)
    return {"encoder": encoder, "decoder": convert_v1_decoder(dec)}


def convert_v2old_decoder(sd: dict, num_resolutions: int = 4, num_levels: int = 3) -> dict:
    """V2old Decoder weights -> DecoderV2Old params
    (models/unidepthv2/old.py; reference decoder_old.py naming)."""
    p = {}
    for i in range(num_resolutions):
        p[f"input_adapter_{i}"] = _v1_adapter(sd, f"input_adapter.input_adapters.{i}")
    for i in range(4):
        p[f"camera_token_adapter_{i}"] = _v1_adapter(
            sd, f"camera_token_adapter.input_adapters.{i}"
        )
    for i in range(2):
        p[f"global_token_adapter_{i}"] = _v1_adapter(
            sd, f"global_token_adapter.input_adapters.{i}"
        )
    p["level_embeds"] = sd["level_embeds"]
    p["le_fc1"] = _dense(sd, "level_embed_layer.0")
    p["le_fc2"] = _dense(sd, "level_embed_layer.2")
    p["le_norm"] = _ln(sd, "level_embed_layer.3")

    p["camera_layer"] = {
        "latents_pos": sd["camera_layer.latents_pos"],
        "project_cls": _mlp(sd, "camera_layer.project_cls"),
        "in_features": _mlp(sd, "camera_layer.in_features"),
        "aggregate1": _attention_block(sd, "camera_layer.aggregate1"),
        "aggregate2": _attention_block(sd, "camera_layer.aggregate2"),
        "out": _mlp(sd, "camera_layer.out"),
    }
    p["global_layer"] = {
        "project_cls": _mlp(sd, "global_layer.project_cls"),
        "project_rays": _dense(sd, "global_layer.project_rays"),
        "in_features": _dense(sd, "global_layer.in_features"),
        "aggregate1": _attention_block(sd, "global_layer.aggregate1"),
        "aggregate2": _attention_block(sd, "global_layer.aggregate2"),
        "out": _mlp(sd, "global_layer.out"),
    }

    d = {
        "to_latents": _mlp(sd, "depth_layer.to_latents"),
        "features_channel_cat": _dense(sd, "depth_layer.features_channel_cat"),
        "aggregate_16": _attention_block(sd, "depth_layer.aggregate_16"),
        "prompt_camera": _attention_block(sd, "depth_layer.prompt_camera"),
    }
    for i in range(num_levels):
        d[f"rays_layers_{i}"] = _dense(sd, f"depth_layer.rays_layers.{i}")
        j = 0
        while f"depth_layer.process_layers.{i}.{j}.q.weight" in sd:
            d[f"process_layers_{i}_{j}"] = _attention_block(
                sd, f"depth_layer.process_layers.{i}.{j}"
            )
            j += 1
        pre = f"depth_layer.ups.{i}"
        up = {}
        j = 0
        while f"{pre}.convs.{j}.dwconv.weight" in sd:
            up[f"convs_{j}"] = {
                "dwconv": {
                    "conv": {
                        "kernel": torch_conv(sd[f"{pre}.convs.{j}.dwconv.weight"]),
                        "bias": sd[f"{pre}.convs.{j}.dwconv.bias"],
                    }
                },
                "norm": _ln(sd, f"{pre}.convs.{j}.norm"),
                "pwconv1": _dense(sd, f"{pre}.convs.{j}.pwconv1"),
                "pwconv2": _dense(sd, f"{pre}.convs.{j}.pwconv2"),
                "gamma": sd[f"{pre}.convs.{j}.gamma"],
            }
            j += 1
        # Sequential(PixelShuffle, dwConv7, ReLU, Conv3) + residual
        # (Sequential(Conv1x1, UpsamplingBilinear2d))
        up["up_dw"] = _conv(sd, f"{pre}.up.1")
        up["up_pw"] = _conv(sd, f"{pre}.up.3")
        up["residual_proj"] = _conv(sd, f"{pre}.residual.0")
        d[f"ups_{i}"] = up
        d[f"depth_mlp_{i}"] = _mlp(sd, f"depth_layer.depth_mlp.{i}")
        d[f"confidence_mlp_{i}"] = _mlp(sd, f"depth_layer.confidence_mlp.{i}")
    d["to_depth"] = _conv(sd, "depth_layer.to_depth")
    d["to_confidence"] = _conv(sd, "depth_layer.to_confidence")
    p["depth_layer"] = d
    return p


def convert_v2old_state_dict(
    state_dict: Mapping[str, np.ndarray],
    output_idx: tuple[int, ...] = (21, 22, 23, 24),
    num_register_tokens: int = 0,
    use_norm: bool = False,  # matches from_config default (reference encoder.py:150)
) -> dict:
    sd = _normalize_root(state_dict)
    enc = {k[len("pixel_encoder."):]: v for k, v in sd.items() if k.startswith("pixel_encoder.")}
    dec = {k[len("pixel_decoder."):]: v for k, v in sd.items() if k.startswith("pixel_decoder.")}
    return {
        "encoder": convert_encoder(enc, output_idx, num_register_tokens, use_norm),
        "decoder": convert_v2old_decoder(dec),
    }

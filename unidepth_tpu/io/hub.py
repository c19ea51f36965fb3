"""Checkpoint loading: local files or HuggingFace Hub.

Parity with reference hubconf.py:24-41 and PyTorchModelHubMixin usage
(unidepthv2.py:111-117): ``name_or_path`` may be a HF repo id
(e.g. ``lpiccinelli/unidepth-v2-vitl14``), a local directory containing
``config.json`` + ``pytorch_model.bin``/``model.safetensors``, or a direct
checkpoint file path. Downloads are attempted only when the hub cache or
network is available (this build environment has zero egress — local paths
and pre-populated caches always work).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from unidepth_tpu.io.convert import convert_v2_state_dict

_BACKBONE_TO_CONFIG = {
    "vits": "config_v2_vits14.json",
    "vitb": "config_v2_vitb14.json",
    "vitl": "config_v2_vitl14.json",
}


def _read_state_dict(path: Path) -> dict[str, np.ndarray]:
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=False)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _default_config(version: int, backbone: str) -> dict:
    cfg_dir = Path(__file__).resolve().parents[2] / "configs"
    for key, fname in _BACKBONE_TO_CONFIG.items():
        if key in backbone:
            fname = fname.replace("v2", f"v{version}")
            p = cfg_dir / fname
            if p.exists():
                return json.loads(p.read_text())
    raise FileNotFoundError(f"no config for version={version} backbone={backbone}")


def load_checkpoint(name_or_path: str, version: int = 2, config: dict | None = None):
    """Resolve config + converted params for a checkpoint reference.

    ``config``: explicit config dict (e.g. scripts/convert.py --config);
    overrides any config.json found next to the checkpoint."""
    path = Path(name_or_path)
    ckpt_file = None
    if path.is_dir():
        cfg_p = path / "config.json"
        if config is None and cfg_p.exists():
            config = json.loads(cfg_p.read_text())
        if (path / "params").is_dir() and config is not None:
            # native converted checkpoint (scripts/convert.py layout:
            # config.json + orbax 'params' tree) — no torch needed
            from unidepth_tpu.io.checkpoint import load_params

            return config, load_params(path / "params")
        for cand in ("model.safetensors", "pytorch_model.bin", "model.bin"):
            if (path / cand).exists():
                ckpt_file = path / cand
                break
    elif path.is_file():
        ckpt_file = path
        cfg_p = path.parent / "config.json"
        if config is None and cfg_p.exists():
            config = json.loads(cfg_p.read_text())
    else:
        # HF hub repo id
        try:
            from huggingface_hub import hf_hub_download

            if config is None:
                cfg_p = hf_hub_download(name_or_path, "config.json")
                config = json.loads(Path(cfg_p).read_text())
            try:
                ckpt_file = Path(hf_hub_download(name_or_path, "model.safetensors"))
            except Exception:
                ckpt_file = Path(hf_hub_download(name_or_path, "pytorch_model.bin"))
        except Exception as e:  # zero-egress env, missing cache, ...
            raise FileNotFoundError(
                f"cannot resolve checkpoint '{name_or_path}': {e}"
            ) from e

    if ckpt_file is None:
        raise FileNotFoundError(f"no checkpoint file found under {name_or_path}")
    if config is None:
        backbone = str(name_or_path)
        config = _default_config(version, backbone)

    sd = _read_state_dict(ckpt_file)
    enc_name = config["model"]["pixel_encoder"]["name"]
    num_reg = config["model"]["pixel_encoder"].get("num_register_tokens", 0)
    # reference encoder-factory default (encoder.py:150): use_norm=False
    use_norm = config["model"]["pixel_encoder"].get("use_norm", False)
    model_name = config.get("model", {}).get("name", f"UniDepthV{version}")
    if model_name == "UniDepthV2old":
        from unidepth_tpu.io.convert import convert_v2old_state_dict

        output_idx = tuple(
            config["model"]["pixel_encoder"].get("output_idx", (21, 22, 23, 24))
        )
        return config, convert_v2old_state_dict(
            sd, output_idx=output_idx, num_register_tokens=num_reg,
            use_norm=use_norm,
        )
    if version == 2:
        output_idx = tuple(
            config["model"]["pixel_encoder"].get("output_idx", (6, 12, 18, 24))
        )
        num_levels = len(config["model"]["pixel_decoder"].get("depths", (2, 2, 2)))
        params = convert_v2_state_dict(
            sd, output_idx=output_idx, num_levels=num_levels,
            num_register_tokens=num_reg, use_norm=use_norm,
        )
    else:
        from unidepth_tpu.io.convert import convert_v1_state_dict

        output_idx = tuple(
            config["model"]["pixel_encoder"].get("output_idx", (5, 12, 18, 24))
        )
        params = convert_v1_state_dict(
            sd,
            output_idx=output_idx,
            backbone="convnext" if "convnext" in enc_name else "dinov2",
            num_register_tokens=num_reg, use_norm=use_norm,
        )
    return config, params

"""Model factory (reference hubconf.py torch.hub entry point).

``UniDepth(version, backbone)`` builds the requested model from the local
config zoo and optionally loads converted reference weights from a local
checkpoint directory or the HuggingFace cache.
"""

import json
from pathlib import Path

dependencies = ["jax", "flax"]

_ROOT = Path(__file__).resolve().parent

_CONFIGS = {
    ("v1", "vitl14"): "configs/config_v1_vitl14.json",
    ("v1", "cnvnxtl"): "configs/config_v1_cnvnxtl.json",
    ("v2", "vits14"): "configs/config_v2_vits14.json",
    ("v2", "vitb14"): "configs/config_v2_vitb14.json",
    ("v2", "vitl14"): "configs/config_v2_vitl14.json",
    ("v2old", "vits14"): "configs/config_v2old_vits14.json",
    ("v2old", "vitl14"): "configs/config_v2old_vitl14.json",
}


def UniDepth(version: str = "v2", backbone: str = "vitl14", pretrained: str | None = None):
    """version 'v1'|'v2'; backbone 'vits14'|'vitb14'|'vitl14'|'cnvnxtl'.

    ``pretrained``: local checkpoint path or HF repo id
    (e.g. 'lpiccinelli/unidepth-v2-vitl14'); None builds random weights.
    """
    from unidepth_tpu.models import UniDepthV1, UniDepthV2, UniDepthV2old

    cls = {"v1": UniDepthV1, "v2": UniDepthV2, "v2old": UniDepthV2old}[version]
    if pretrained:
        return cls.from_pretrained(pretrained)
    cfg = json.loads((_ROOT / _CONFIGS[(version, backbone)]).read_text())
    model = cls.from_config(cfg)
    return model

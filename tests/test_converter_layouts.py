"""Converter vs the REAL released checkpoint layouts.

tests/fixtures/reference_state_dict_keys.json carries the verbatim key
inventory (names + shapes) of every shipped reference config, dumped by
instantiating the reference torch models themselves (see
fixtures/derive_reference_keys.py). These tests build synthetic state
dicts with exactly those keys at FULL model scale and assert the
converter produces a pytree structurally identical (paths + shapes) to
the repo model's own parameters — so a real HF checkpoint cannot surprise
the converter with a layout the round-1 builder-authored mirrors missed.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow

ROOT = Path(__file__).resolve().parents[1]
FIXTURE = json.loads((ROOT / "tests/fixtures/reference_state_dict_keys.json").read_text())


def _synth_sd(name):
    return {k: np.zeros(shape, np.float32) for k, shape in FIXTURE[name].items()}


def _flat_shapes(tree):
    out = {}

    def visit(path, x):
        p = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        out[p] = tuple(x.shape)
        return x

    jax.tree_util.tree_map_with_path(visit, tree)
    return out


def _assert_same_structure(converted, expected, what):
    a, b = _flat_shapes(converted), _flat_shapes(expected)
    missing = sorted(set(b) - set(a))
    extra = sorted(set(a) - set(b))
    assert not missing, f"{what}: converter missing {len(missing)} leaves: {missing[:8]}"
    assert not extra, f"{what}: converter extra {len(extra)} leaves: {extra[:8]}"
    bad = [(k, a[k], b[k]) for k in a if a[k] != b[k]]
    assert not bad, f"{what}: shape mismatches: {bad[:8]}"


def _expected_params(cfg_name):
    cfg = json.loads((ROOT / f"configs/{cfg_name}.json").read_text())
    import jax.numpy as jnp

    name = cfg["model"]["name"]
    if name == "UniDepthV1":
        from unidepth_tpu.models.unidepthv1.model import UniDepthV1

        model = UniDepthV1.from_config(cfg, dtype=jnp.float32)
        return jax.eval_shape(lambda: model.init_params(seed=0))
    if name == "UniDepthV2old":
        from unidepth_tpu.models.unidepthv2.old import UniDepthV2old

        model = UniDepthV2old.from_config(cfg, dtype=jnp.float32)
        return jax.eval_shape(lambda: model.init_params(seed=0))
    from unidepth_tpu.models.unidepthv2.model import UniDepthV2

    model = UniDepthV2.from_config(cfg, dtype=jnp.float32)
    return jax.eval_shape(lambda: model.init_params(seed=0, image_shape=(28, 28)))


def _convert(cfg_name, sd):
    # use_norm is threaded from the config exactly like io/hub.py does; the
    # converters' keyword default matches from_config's default (False,
    # reference encoder.py:150) for configs that omit it
    cfg = json.loads((ROOT / f"configs/{cfg_name}.json").read_text())
    pe = cfg["model"]["pixel_encoder"]
    name = cfg["model"]["name"]
    output_idx = tuple(pe.get("output_idx", (5, 12, 18, 24)))
    use_norm = pe.get("use_norm", False)
    if name == "UniDepthV1":
        from unidepth_tpu.io.convert import convert_v1_state_dict

        backbone = "convnext" if "convnext" in pe["name"] else "dinov2"
        return convert_v1_state_dict(sd, output_idx=output_idx, backbone=backbone)
    if name == "UniDepthV2old":
        from unidepth_tpu.io.convert import convert_v2old_state_dict

        return convert_v2old_state_dict(sd, output_idx=output_idx, use_norm=use_norm)
    from unidepth_tpu.io.convert import convert_v2_state_dict

    return convert_v2_state_dict(
        sd,
        output_idx=output_idx,
        num_levels=len(cfg["model"]["pixel_decoder"]["depths"]),
        use_norm=use_norm,
    )


@pytest.mark.parametrize(
    "cfg_name",
    [
        "config_v2_vits14",
        "config_v2_vitb14",
        "config_v2_vitl14",
        "config_v1_vitl14",
        "config_v1_cnvnxtl",
        "config_v2old_vits14",
        "config_v2old_vitl14",
    ],
)
def test_converter_accepts_verbatim_reference_layout(cfg_name):
    sd = _synth_sd(cfg_name)
    converted = _convert(cfg_name, sd)
    expected = _expected_params(cfg_name)
    _assert_same_structure(converted, expected, cfg_name)


def test_converter_accepts_module_prefix_and_model_wrapper():
    """Reference load_pretrained strips 'module.' anywhere and unwraps a
    {'model': ...} checkpoint (unidepthv2.py:381-394)."""
    from unidepth_tpu.io.convert import convert_v2_state_dict

    sd = {f"module.{k}": v for k, v in _synth_sd("config_v2_vits14").items()}
    converted = convert_v2_state_dict(
        {"model": sd}, output_idx=(3, 6, 9, 12), use_norm=True
    )
    expected = _expected_params("config_v2_vits14")
    _assert_same_structure(converted, expected, "module+model wrapper")


def test_encoder_converter_accepts_chunked_blocks():
    """FB DINOv2 training checkpoints use the FSDP chunked layout
    blocks.{chunk}.{global_i}.* (reference backbones/dinov2.py:240-249);
    conversion must equal the flat layout's."""
    from unidepth_tpu.io.convert import convert_encoder

    flat = {
        k: np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        for k, shape in FIXTURE["dinov2_vitl14_flat"].items()
    }
    # chunked keys re-index flat ones: blocks.{i}. -> blocks.{i//6}.{i}. (4 chunks of 6)
    chunked = {}
    for k, v in flat.items():
        if k.startswith("blocks."):
            i = int(k.split(".")[1])
            chunked[f"blocks.{i // 6}." + k[len("blocks."):]] = v
        else:
            chunked[k] = v
    assert set(chunked) == set(FIXTURE["dinov2_vitl14_chunked4"])

    out_flat = convert_encoder(dict(flat), output_idx=(6, 12, 18, 24))
    out_chunked = convert_encoder(chunked, output_idx=(6, 12, 18, 24))
    fa, fb = _flat_shapes(out_flat), _flat_shapes(out_chunked)
    assert fa == fb
    jax.tree.map(np.testing.assert_array_equal, out_flat, out_chunked)

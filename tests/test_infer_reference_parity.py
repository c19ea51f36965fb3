"""The reference's OWN ``infer()`` orchestration executed end-to-end
(VERDICT r4 #4).

tests/test_reference_parity.py proves parity at the ``encode_decode``
boundary; the pre/post-processing around it (paddings, resize-factor
buckets, camera crop+resize, output unpadding, intrinsics de-scaling) was
previously verified only against hand-composed torch ops
(tests/test_preprocess_parity.py). Here the reference's real
``UniDepthV2.infer`` (/root/reference/unidepth/models/unidepthv2/
unidepthv2.py:239-339) and ``UniDepthV1.infer`` (unidepthv1.py:287-373)
run on raw uint8-range inputs at a non-multiple-of-14 resolution — the
only substituted piece is ``torchvision.transforms.functional.normalize``
(a 3-line plain-torch stand-in; torchvision is not installable here) —
and the full output dicts are diffed against our ``infer()``.
"""

import json
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from test_reference_parity import (  # noqa: F401  (reference: pytest fixture)
    REF,
    REPO,
    _convert,
    _rel_err,
    reference,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF.exists(), reason="reference mount absent"),
]

# deliberately NOT multiples of 14, and off the train aspect ratios, so the
# pad -> resize -> unpad -> de-scale path does real work
H, W = 100, 130


def _install_tf_normalize():
    """The one torchvision function infer() calls, in plain torch
    (torchvision.transforms.functional.normalize semantics for a batched
    (B, 3, H, W) float tensor)."""

    def normalize(tensor, mean, std, inplace=False):
        mean = torch.as_tensor(mean, dtype=tensor.dtype).view(-1, 1, 1)
        std = torch.as_tensor(std, dtype=tensor.dtype).view(-1, 1, 1)
        return (tensor - mean) / std

    for name in (
        "torchvision.transforms.functional",
        "torchvision.transforms.v2.functional",
    ):
        sys.modules[name].normalize = normalize


def _rgb(b=1):
    rng = np.random.default_rng(7)
    return rng.integers(0, 255, (b, 3, H, W)).astype(np.uint8)


@pytest.mark.parametrize("with_camera", [False, True])
def test_v2_infer_matches_reference(reference, with_camera):
    from unidepth_tpu.models.unidepthv2.model import UniDepthV2

    _install_tf_normalize()
    cfg_name = "config_v2_vits14"
    ref_cfg = json.loads((REF / "configs" / f"{cfg_name}.json").read_text())
    torch.manual_seed(0)
    ref_model = reference["v2"](ref_cfg).eval()
    ref_model.resolution_level = 5
    ref_model.shape_constraints["pixels_min"] = 2000
    ref_model.shape_constraints["pixels_max"] = 10000

    rgb = _rgb()
    K = None
    cam_t = None
    if with_camera:
        K = np.asarray(
            [[90.0, 0.0, W / 2], [0.0, 85.0, H / 2], [0.0, 0.0, 1.0]], np.float32
        )
        # copy: the reference's camera.crop/resize mutate self.K IN PLACE
        # (utils/camera.py:78-81) and from_numpy shares the buffer — without
        # the copy our infer() below would receive the already-resized K
        cam_t = torch.from_numpy(K.copy())[None]
    with torch.no_grad():
        out_t = ref_model.infer(torch.from_numpy(rgb), camera=cam_t)

    config, params = _convert(ref_model, cfg_name, version=2)
    model = UniDepthV2.from_config(config, params, dtype=jnp.float32)
    model.resolution_level = 5
    model.shape_constraints["pixels_min"] = 2000
    model.shape_constraints["pixels_max"] = 10000
    out_j = model.infer(
        rgb.transpose(0, 2, 3, 1), camera=None if K is None else K[None]
    )

    for key in ("depth", "points", "confidence", "rays"):
        theirs = out_t[key].numpy().transpose(0, 2, 3, 1)
        ours = np.asarray(out_j[key])
        rel = _rel_err(ours, theirs)
        # rays/points cross zero at the principal point; gate those on
        # absolute error at their O(1) scale instead of blowing up rel
        if key in ("rays", "points"):
            a = np.abs(ours - theirs)
            assert a.max() < 2e-3, f"v2 infer {key}: max abs err {a.max():.2e}"
        else:
            assert rel.max() < 1e-3, f"v2 infer {key}: max rel err {rel.max():.2e}"
    np.testing.assert_allclose(
        np.asarray(out_j["intrinsics"]),
        out_t["intrinsics"].numpy(),
        rtol=1e-3,
        atol=1e-3,
        err_msg="v2 infer intrinsics",
    )


@pytest.mark.parametrize("with_K", [False, True])
def test_v1_infer_matches_reference(reference, with_K):
    from unidepth_tpu.models.unidepthv1.model import UniDepthV1

    _install_tf_normalize()
    cfg_name = "config_v1_vitl14"
    ref_cfg = json.loads((REF / "configs" / f"{cfg_name}.json").read_text())
    torch.manual_seed(0)
    ref_model = reference["v1"](ref_cfg).eval()
    # shrink the fixed V1 network shape so the CPU forward stays small;
    # same override on both sides (multiple of 14 and of 32, like 462x616)
    ref_model.image_shape = [112, 140]

    rgb = _rgb()
    K = None
    if with_K:
        K = np.asarray(
            [[90.0, 0.0, W / 2], [0.0, 85.0, H / 2], [0.0, 0.0, 1.0]], np.float32
        )
    with torch.no_grad():
        out_t = ref_model.infer(
            torch.from_numpy(rgb),
            # copy: V1's infer also scales the intrinsics tensor in place
            intrinsics=None if K is None else torch.from_numpy(K.copy())[None],
        )

    config, params = _convert(ref_model, cfg_name, version=1)
    config.setdefault("data", {})["image_shape"] = [112, 140]
    model = UniDepthV1.from_config(config, params, dtype=jnp.float32)
    assert model.image_shape == (112, 140)
    out_j = model.infer(
        rgb.transpose(0, 2, 3, 1), intrinsics=None if K is None else K[None]
    )

    for key in ("depth", "points"):
        theirs = out_t[key].numpy().transpose(0, 2, 3, 1)
        ours = np.asarray(out_j[key])
        if key == "points":
            a = np.abs(ours - theirs)
            assert a.max() < 2e-3, f"v1 infer {key}: max abs err {a.max():.2e}"
        else:
            rel = _rel_err(ours, theirs)
            assert rel.max() < 1e-3, f"v1 infer {key}: max rel err {rel.max():.2e}"
    np.testing.assert_allclose(
        np.asarray(out_j["intrinsics"]),
        out_t["intrinsics"].numpy(),
        rtol=1e-3,
        atol=1e-3,
        err_msg="v1 infer intrinsics",
    )

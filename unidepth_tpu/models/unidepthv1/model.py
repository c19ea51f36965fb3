"""UniDepthV1: fixed-shape preprocessing + spherical z-buffer backprojection.

Public API parity with reference unidepth/models/unidepthv1/unidepthv1.py:
``infer(rgbs, intrinsics, skip_camera)`` resizes/pads into the fixed
network shape (462x616 in shipped configs), averages the three multi-scale
depth outputs, and back-projects through (theta, phi, z) spherical
coordinates. One jitted XLA program per input-shape bucket.
"""

from __future__ import annotations

import json
import math
import warnings
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from unidepth_tpu.geometry.rays import generate_rays, spherical_zbuffer_to_euclidean
from unidepth_tpu.models.backbones.dinov2 import VIT_PRESETS, DinoViT, ViTConfig
from unidepth_tpu.models.serving import ServingPrecisionMixin
from unidepth_tpu.models.unidepthv1.decoder import DecoderV1
from unidepth_tpu.ops.resize import resize
from unidepth_tpu.utils.misc import JitCache
from unidepth_tpu.utils.constants import IMAGENET_DATASET_MEAN, IMAGENET_DATASET_STD

V1_OUTPUT_IDX = {"vits14": (3, 6, 9, 12), "vitb14": (3, 6, 9, 12), "vitl14": (5, 12, 18, 24)}


def _v1_shapes(image_shape, network_shape):
    """(reference unidepthv1.py:38-46)."""
    h, w = image_shape
    input_ratio = w / h
    output_ratio = network_shape[1] / network_shape[0]
    if output_ratio > input_ratio:
        ratio = network_shape[0] / h
    else:
        ratio = network_shape[1] / w
    return (math.ceil(h * ratio - 0.5), math.ceil(w * ratio - 0.5)), ratio


def _v1_paddings(image_shape, network_shape):
    ch, cw = image_shape
    h, w = network_shape
    pt, pb = (h - ch) // 2, h - ch - (h - ch) // 2
    pl, pr = (w - cw) // 2, w - cw - (w - cw) // 2
    return pl, pr, pt, pb


class UniDepthV1(ServingPrecisionMixin):
    PATCH = 14
    # V1's depth head is exp(logit) (reference unidepthv1/decoder.py:~430):
    # blanket int8 GEMM noise exponentiates (~12% mean rel depth drift vs
    # ~1.5% for V2's structure), so int8 serving requires the per-stage
    # sensitivity calibration (ServingPrecisionMixin.calibrate_int8_stages)
    INT8_REQUIRES_CALIBRATION = True

    def __init__(
        self,
        encoder_cfg: ViTConfig,
        hidden_dim: int = 512,
        decoder_depths: tuple[int, ...] = (3, 2, 1),
        num_heads: int = 8,
        expansion: int = 4,
        image_shape: tuple[int, int] = (462, 616),
        attn_impl: str = "nystrom",
        dtype: Any = None,
        params=None,
        encoder_module=None,
    ):
        if dtype is None:
            dtype = jnp.bfloat16 if jax.default_backend() not in ("cpu",) else jnp.float32
        self.dtype = dtype
        self.encoder_cfg = encoder_cfg
        self.encoder = encoder_module or DinoViT(
            cfg=encoder_cfg, stacking="max_cls", dtype=dtype
        )
        # stochastic-depth rate regardless of backbone family (ViTConfig and
        # ConvNeXtConfig both carry drop_path_rate)
        _cfg = encoder_cfg if encoder_cfg is not None else getattr(self.encoder, "cfg", None)
        self.drop_path_rate = float(getattr(_cfg, "drop_path_rate", 0.0) or 0.0)
        num_levels = 4
        self.decoder = DecoderV1(
            input_dims=(encoder_cfg.embed_dim,) * num_levels
            if encoder_cfg is not None
            else (0,) * num_levels,
            hidden_dim=hidden_dim,
            num_heads=num_heads,
            expansion=expansion,
            depths=tuple(decoder_depths),
            attn_impl=attn_impl,
            dtype=dtype,
        )
        self.image_shape = tuple(image_shape)
        self.params = params
        self._jit_cache = JitCache()  # bounded LRU; utils/misc.py
        # bf16 pre-cast + opt-in int8 serving (models/serving.py); the
        # ConvNeXt-encoder variant supports the pre-cast but rejects int8
        self._init_serving()

    @classmethod
    def from_config(cls, config: dict, params=None, dtype=None) -> "UniDepthV1":
        enc_name = config["model"]["pixel_encoder"]["name"]
        preset = enc_name.replace("dinov2_", "")
        dec = config["model"]["pixel_decoder"]
        if "convnext" in enc_name:
            from unidepth_tpu.models.backbones.convnext import (
                CONVNEXT_PRESETS,
                ConvNeXt,
            )

            import dataclasses as _dc

            enc_over = {
                k: tuple(config["model"]["pixel_encoder"][k])
                for k in ("depths", "dims")
                if k in config["model"]["pixel_encoder"]
            }
            ccfg = _dc.replace(
                CONVNEXT_PRESETS[enc_name],
                drop_path_rate=config["model"]["pixel_encoder"].get(
                    "drop_path", config.get("training", {}).get("drop_path", 0.0)
                ),
                **enc_over,
            )
            if dtype is None:
                dtype = (
                    jnp.bfloat16
                    if jax.default_backend() not in ("cpu",)
                    else jnp.float32
                )
            model = cls(
                encoder_cfg=None,
                hidden_dim=dec["hidden_dim"],
                decoder_depths=tuple(dec.get("depths", (3, 2, 1))),
                num_heads=config["model"].get("num_heads", 8),
                expansion=config["model"].get("expansion", 4),
                image_shape=tuple(config.get("data", {}).get("image_shape", (462, 616))),
                dtype=dtype,
                params=params,
                encoder_module=ConvNeXt(cfg=ccfg, stacking="max_cls", dtype=dtype),
            )
            model.attention_logit_bound = config["model"].get("attention_logit_bound")
            return model
        vit = VIT_PRESETS[preset]
        enc_cfg = ViTConfig(
            embed_dim=vit.embed_dim,
            depth=vit.depth,
            num_heads=vit.num_heads,
            output_idx=tuple(
                config["model"]["pixel_encoder"].get("output_idx", V1_OUTPUT_IDX[preset])
            ),
            use_norm=False,
            drop_path_rate=config["model"]["pixel_encoder"].get(
                "drop_path", config.get("training", {}).get("drop_path", 0.0)
            ),
            # reference UniDepthV1.build hardcodes interpolate_offset=0.1
            # into its encoder config (unidepthv1.py:416-424)
            interpolate_offset=0.1,
        )
        dec = config["model"]["pixel_decoder"]
        model = cls(
            encoder_cfg=enc_cfg,
            hidden_dim=dec["hidden_dim"],
            decoder_depths=tuple(dec.get("depths", (3, 2, 1))),
            num_heads=config["model"].get("num_heads", 8),
            expansion=config["model"].get("expansion", 4),
            image_shape=tuple(config.get("data", {}).get("image_shape", (462, 616))),
            dtype=dtype,
            params=params,
        )
        # conversion-audited max |prescaled attention logit| (scripts/
        # convert.py --verify); absent -> serving keeps row-max softmax
        model.attention_logit_bound = config["model"].get("attention_logit_bound")
        return model

    @classmethod
    def from_pretrained(cls, name_or_path: str, dtype=None) -> "UniDepthV1":
        from unidepth_tpu.io.hub import load_checkpoint

        config, params = load_checkpoint(name_or_path, version=1)
        return cls.from_config(config, params=params, dtype=dtype)

    def init_params(self, seed: int = 0):
        k1, k2 = jax.random.split(jax.random.key(seed))
        h, w = self.image_shape
        img = jnp.zeros((1, h, w, 3), jnp.float32)
        enc_vars = self.encoder.init(k1, img)
        feats, cls_tokens = jax.eval_shape(
            lambda p, x: self.encoder.apply(p, x), enc_vars, img
        )
        feats_z = [jnp.zeros(f.shape, jnp.float32) for f in feats]
        cls_z = [jnp.zeros(c.shape, jnp.float32) for c in cls_tokens]
        dec_vars = self.decoder.init(k2, feats_z, cls_z, (h, w))
        self.params = {"encoder": enc_vars["params"], "decoder": dec_vars["params"]}
        return self.params

    # ------------------------------------------------------------------
    def encode_decode(
        self, params, image, rays_gt=None, K_gt=None, skip_camera=False, rng=None
    ):
        _, h, w, _ = image.shape
        train = rng is not None and self.drop_path_rate > 0.0
        feats, cls_tokens = self.encoder.apply(
            {"params": params["encoder"]},
            image.astype(self.dtype),
            *((train,) if train else ()),
            rngs={"droppath": rng} if train else None,
        )
        K, preds, depth_features = self.decoder.apply(
            {"params": params["decoder"]},
            feats,
            cls_tokens,
            (h, w),
            rays_gt=rays_gt,
            skip_camera=skip_camera,
            K_gt=K_gt,
        )
        # mean of the three upsampled scales (reference unidepthv1.py:196-207)
        pred = sum(
            resize(p, (h, w), mode="bilinear", align_corners=False, antialias=True)
            for p in preds
        ) / len(preds)
        rays, angles = generate_rays(K, (h, w))
        angles = angles.reshape(-1, h, w, 2)
        points = spherical_zbuffer_to_euclidean(
            jnp.concatenate([angles, pred], axis=-1)
        )
        return {
            "intrinsics": K,
            "depth": pred,
            "points": points,
            "rays": rays.reshape(-1, h, w, 3),
            "angles": angles,
            "depth_features": depth_features,
        }

    def _infer_fn(self, key):
        if key in self._jit_cache:
            return self._jit_cache[key]
        (H, W, scaled, pads, ratio, has_K, skip_camera, normalize) = key
        sh, sw = scaled
        pl, pr, pt, pb = pads
        nh, nw = self.image_shape

        def run(params, rgb, K):
            with self._serving_trace_ctx():
                return body(params, rgb, K)

        def body(params, rgb, K):
            # rgb arrives in [0,1] (host pre-scales uint8) or pre-normalized
            x = rgb
            if normalize:
                mean = jnp.asarray(IMAGENET_DATASET_MEAN)
                std = jnp.asarray(IMAGENET_DATASET_STD)
                x = (x - mean) / std
            x = resize(x, (sh, sw), mode="bilinear", align_corners=False, antialias=True)
            x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))

            rays_gt = None
            K_net = None
            if has_K:
                K_net = K.at[:, 0, 0].multiply(ratio).at[:, 1, 1].multiply(ratio)
                K_net = (
                    K_net.at[:, 0, 2].set(K[:, 0, 2] * ratio + pl)
                    .at[:, 1, 2].set(K[:, 1, 2] * ratio + pt)
                )
                rays_gt, _ = generate_rays(K_net, (nh, nw))

            feats, cls_tokens = self._serving_encoder().apply(
                {"params": params["encoder"]}, x.astype(self.dtype)
            )
            K_pred, preds, _ = self.decoder.apply(
                {"params": params["decoder"]},
                feats,
                cls_tokens,
                (nh, nw),
                rays_gt=rays_gt,
                skip_camera=skip_camera and has_K,
                K_gt=K_net,
            )
            pred = sum(
                resize(p, (nh, nw), mode="bilinear", align_corners=False, antialias=True)
                for p in preds
            ) / len(preds)
            pred = pred[:, pt : nh - pb, pl : nw - pr]
            pred = resize(pred, (H, W), mode="bilinear", align_corners=False, antialias=True)

            K_out = (
                K_pred.at[:, 0, 0].divide(ratio)
                .at[:, 1, 1].divide(ratio)
                .at[:, 0, 2].set((K_pred[:, 0, 2] - pl) / ratio)
                .at[:, 1, 2].set((K_pred[:, 1, 2] - pt) / ratio)
            )
            # NOTE parity: with a GT camera the reference back-projects with
            # the *network-scaled* intrinsics over the original grid
            # (unidepthv1.py:357-363) — mirrored here.
            K_bp = K_net if has_K else K_out
            _, angles = generate_rays(K_bp, (H, W))
            angles = angles.reshape(-1, H, W, 2)
            points = spherical_zbuffer_to_euclidean(
                jnp.concatenate([angles, pred], axis=-1)
            )
            return {
                "intrinsics": K_out,
                "points": points,
                "depth": pred,
            }

        fn = jax.jit(run)
        self._jit_cache[key] = fn
        return fn

    def infer(self, rgbs, intrinsics=None, skip_camera: bool = False) -> dict:
        rgbs = np.asarray(rgbs) if not isinstance(rgbs, jnp.ndarray) else rgbs
        if rgbs.ndim == 3:
            rgbs = rgbs[None]
        if rgbs.shape[1] == 3 and rgbs.shape[-1] != 3:
            rgbs = jnp.transpose(jnp.asarray(rgbs), (0, 2, 3, 1))
        rgbs = jnp.asarray(rgbs, jnp.float32)
        B, H, W, _ = rgbs.shape
        # reference heuristic (unidepthv1.py:300-307): raw uint8/[0,255]
        # scales to [0,1]; anything already in [0,1] gets ImageNet-normalized;
        # pre-normalized inputs (values outside [0,1], e.g. negatives) pass
        # through untouched.
        mx = float(jnp.max(rgbs))
        mn = float(jnp.min(rgbs))
        if mx > 5.0:
            rgbs = rgbs / 255.0
            normalize = True
        else:
            normalize = mn >= 0.0 and mx <= 1.0

        K = None
        if intrinsics is not None:
            K = jnp.asarray(intrinsics, jnp.float32)
            if K.ndim == 2:
                K = K[None]

        scaled, ratio = _v1_shapes((H, W), self.image_shape)
        pads = _v1_paddings(scaled, self.image_shape)
        key = (H, W, scaled, pads, ratio, K is not None, skip_camera, normalize)
        return self._infer_fn(key)(self._serving_params(), rgbs, K)

    def _audit_preprocess(self, rgb):
        """Normalized network-shape batch for ``audit_attention_logits``
        (same resize/pad as the serving program; raw 0..255 input)."""
        rgb = jnp.asarray(rgb, jnp.float32)
        if rgb.ndim == 3:
            rgb = rgb[None]
        _, H, W, _ = rgb.shape
        scaled, _ = _v1_shapes((H, W), self.image_shape)
        pad_l, pad_r, pad_t, pad_b = _v1_paddings(scaled, self.image_shape)
        mean = jnp.asarray(IMAGENET_DATASET_MEAN)
        std = jnp.asarray(IMAGENET_DATASET_STD)
        x = (rgb / 255.0 - mean) / std
        x = resize(x, scaled, mode="bilinear", align_corners=False, antialias=True)
        return jnp.pad(x, ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)))

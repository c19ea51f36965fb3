"""UniDepthV2old: the intermediate architecture (V1 layout + wave-artifact
fix) — reference unidepth/models/unidepthv2/{unidepthv2_old,decoder_old}.py.

Distinct pieces vs V1/V2: a GlobalHead regressing a scale/shift pair from
cls tokens + ray context; pixel-shuffle residual upsamplers; Nystrom blocks
at every level; logdepth spatial layer-norm then ``(exp(ln(d)) + shift) *
scale`` with softplus; token-count (not pixel-count) resolution bounds.
"""

from __future__ import annotations

import math
import warnings
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from unidepth_tpu.geometry.rays import generate_rays, spherical_zbuffer_to_euclidean
from unidepth_tpu.models.backbones.dinov2 import VIT_PRESETS, DinoViT, ViTConfig
from unidepth_tpu.models.unidepthv1.decoder import AdapterItem
from unidepth_tpu.models.serving import ServingPrecisionMixin
from unidepth_tpu.nn.layers import MLP, AttentionBlock
from unidepth_tpu.nn.nystrom import NystromBlock
from unidepth_tpu.nn.upsample import ConvUpsampleShuffleResidual
from unidepth_tpu.ops.fourier import generate_fourier_features, position_embedding_sine
from unidepth_tpu.ops.resize import flat_interpolate, resize
from unidepth_tpu.utils.misc import JitCache
from unidepth_tpu.utils.constants import IMAGENET_DATASET_MEAN, IMAGENET_DATASET_STD

Dtype = jnp.dtype


def _embed_rays_old(rays, old_shape, new_shape, camera_dim):
    r = flat_interpolate(rays, old=old_shape, new=new_shape, antialias=True)
    r = r / jnp.linalg.norm(r, axis=-1, keepdims=True).clip(1e-12)
    return generate_fourier_features(
        r, dim=camera_dim, max_freq=max(new_shape) // 2, use_log=True, cat_orig=True
    )


class CameraHeadOld(nn.Module):
    hidden_dim: int
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features_list, cls_tokens, pos_embed, original_shapes):
        b = cls_tokens.shape[0]
        cls_tokens = MLP(self.hidden_dim, expansion=4, dtype=self.dtype, name="project_cls")(cls_tokens)
        latents_pos = self.param(
            "latents_pos", nn.initializers.normal(1.0), (1, 4, self.hidden_dim)
        )
        latents_pos = jnp.broadcast_to(latents_pos, (b, 4, self.hidden_dim))
        stack = jnp.concatenate(features_list, axis=1) + pos_embed.astype(self.dtype)
        stack = MLP(self.hidden_dim, expansion=2, dtype=self.dtype, name="in_features")(stack)
        context = jnp.concatenate([stack, cls_tokens], axis=1)
        x = AttentionBlock(
            dim=self.hidden_dim, num_heads=1, expansion=self.expansion,
            dtype=self.dtype, name="aggregate1",
        )(cls_tokens, context=context, pos_embed=latents_pos)
        x = AttentionBlock(
            dim=self.hidden_dim, num_heads=1, expansion=self.expansion,
            dtype=self.dtype, name="aggregate2",
        )(x, context=context, pos_embed=latents_pos)
        x = MLP(self.hidden_dim, expansion=2, output_dim=1, dtype=self.dtype, name="out")(x)
        x = x[..., 0].astype(jnp.float32)
        h, w = original_shapes
        mx = max(original_shapes) / 2.0
        fx = jnp.exp(x[:, 0]) * mx
        fy = jnp.exp(x[:, 1]) * mx
        cx = nn.sigmoid(x[:, 2]) * w
        cy = nn.sigmoid(x[:, 3]) * h
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        return jnp.stack(
            [
                jnp.stack([fx, z, cx], -1),
                jnp.stack([z, fy, cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )


class GlobalHeadOld(nn.Module):
    """Scale/shift regression (reference decoder_old.py:89-147)."""

    hidden_dim: int
    camera_dim: int = 96
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features_list, cls_tokens, rays, shapes, original_shapes):
        cls_tokens = MLP(self.hidden_dim, expansion=4, dtype=self.dtype, name="project_cls")(cls_tokens)
        remb = _embed_rays_old(rays, original_shapes, shapes, self.camera_dim)
        remb = nn.Dense(self.hidden_dim, dtype=self.dtype, name="project_rays")(remb.astype(self.dtype))
        remb = jnp.tile(remb, (1, len(features_list), 1))
        stack = jnp.concatenate(features_list, axis=1) + remb
        stack = nn.Dense(self.hidden_dim, dtype=self.dtype, name="in_features")(stack)
        context = jnp.concatenate([stack, cls_tokens], axis=1)
        x = AttentionBlock(
            dim=self.hidden_dim, num_heads=1, expansion=self.expansion,
            dtype=self.dtype, name="aggregate1",
        )(cls_tokens, context=context)
        x = AttentionBlock(
            dim=self.hidden_dim, num_heads=1, expansion=self.expansion,
            dtype=self.dtype, name="aggregate2",
        )(x, context=context)
        x = MLP(self.hidden_dim, expansion=2, output_dim=1, dtype=self.dtype, name="out")(x)
        x = x[..., 0].astype(jnp.float32)  # (B, 2)
        scale = jnp.exp(x[:, 0]).reshape(-1, 1, 1, 1)
        shift = x[:, 1].reshape(-1, 1, 1, 1)
        return scale, shift


class DepthHeadOld(nn.Module):
    """(reference decoder_old.py:149-343)."""

    hidden_dim: int
    num_heads: int = 8
    expansion: int = 4
    depths: tuple[int, ...] = (6, 0, 0)
    camera_dim: int = 96
    attn_impl: str = "nystrom"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features_list, rays_hr, pos_embed, level_embed, shapes, original_shapes):
        hd = self.hidden_dim
        b = features_list[0].shape[0]
        gh, gw = shapes

        rembs = []
        for i in range(len(self.depths)):
            e = _embed_rays_old(
                rays_hr, original_shapes, (gh * 2**i, gw * 2**i), self.camera_dim
            )
            rembs.append(
                nn.Dense(hd // 2**i, dtype=self.dtype, name=f"rays_layers_{i}")(e.astype(self.dtype))
            )

        feats_cat = jnp.concatenate(features_list, axis=-1)
        f16 = nn.Dense(hd, dtype=self.dtype, name="features_channel_cat")(feats_cat)
        latents = f16 + MLP(hd, expansion=2, dtype=self.dtype, name="to_latents")(f16)
        latents = AttentionBlock(
            dim=hd, num_heads=1, expansion=self.expansion, context_dim=hd,
            dtype=self.dtype, name="aggregate_16",
        )(
            latents,
            context=jnp.concatenate(features_list, axis=1),
            pos_embed_context=(pos_embed + level_embed).astype(self.dtype),
        )
        latents = AttentionBlock(
            dim=hd, num_heads=1, expansion=self.expansion, context_dim=hd,
            dtype=self.dtype, name="prompt_camera",
        )(latents, context=rembs[0])

        out_features = []
        cur = (gh, gw)
        for i, depth in enumerate(self.depths):
            dim_i = hd // 2**i
            for j in range(depth):
                latents = NystromBlock(
                    dim=dim_i, num_heads=max(1, self.num_heads >> i),
                    expansion=self.expansion, attn_impl=self.attn_impl,
                    dtype=self.dtype, name=f"process_layers_{i}_{j}",
                )(latents, pos_embed=rembs[i])
            grid = (latents + rembs[i]).reshape(b, *cur, dim_i)
            latents = ConvUpsampleShuffleResidual(
                dim_i, expansion=self.expansion, kernel_size=7, num_layers=2,
                dtype=self.dtype, name=f"ups_{i}",
            )(grid)
            cur = (cur[0] * 2, cur[1] * 2)
            out_features.append(latents.reshape(b, *cur, dim_i // 2))

        def fuse(prefix):
            outs = []
            for i in reversed(range(len(self.depths))):
                o = MLP(
                    self.hidden_dim // 2 ** (i + 1), expansion=1, output_dim=16,
                    dtype=self.dtype, name=f"{prefix}_mlp_{i}",
                )(out_features[i])
                o = resize(o, original_shapes, mode="bilinear", align_corners=False)
                outs.append(o)
            return jnp.concatenate(outs, axis=-1)

        from unidepth_tpu.nn.conv import Conv2d

        logdepth = Conv2d(1, kernel_size=7, padding_mode="reflect", dtype=self.dtype, name="to_depth")(
            fuse("depth")
        )
        confidence = Conv2d(1, kernel_size=7, padding_mode="reflect", dtype=self.dtype, name="to_confidence")(
            fuse("confidence")
        )
        confidence = nn.sigmoid(confidence.astype(jnp.float32))
        return logdepth.astype(jnp.float32), confidence, latents


class DecoderV2Old(nn.Module):
    """(reference decoder_old.py:346-585)."""

    input_dims: tuple[int, ...]
    hidden_dim: int
    num_heads: int = 8
    expansion: int = 4
    depths: tuple[int, ...] = (6, 0, 0)
    camera_dim: int = 96
    attn_impl: str = "nystrom"
    dtype: Dtype = jnp.float32

    def setup(self):
        n = len(self.input_dims)
        self.input_adapter = [
            AdapterItem(self.hidden_dim, dtype=self.dtype, name=f"input_adapter_{i}")
            for i in range(n)
        ]
        self.camera_token_adapter = [
            AdapterItem(self.hidden_dim, dtype=self.dtype, name=f"camera_token_adapter_{i}")
            for i in range(4)
        ]
        self.global_token_adapter = [
            AdapterItem(self.hidden_dim, dtype=self.dtype, name=f"global_token_adapter_{i}")
            for i in range(2)
        ]
        self.camera_layer = CameraHeadOld(
            hidden_dim=self.hidden_dim, expansion=self.expansion, dtype=self.dtype, name="camera_layer"
        )
        self.global_layer = GlobalHeadOld(
            hidden_dim=self.hidden_dim, camera_dim=self.camera_dim,
            expansion=self.expansion, dtype=self.dtype, name="global_layer"
        )
        self.depth_layer = DepthHeadOld(
            hidden_dim=self.hidden_dim,
            num_heads=self.num_heads,
            expansion=self.expansion,
            depths=tuple(self.depths),
            camera_dim=self.camera_dim,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            name="depth_layer",
        )
        self.level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0), (len(self.input_dims), self.hidden_dim)
        )
        self.le_fc1 = nn.Dense(self.hidden_dim, dtype=self.dtype, name="le_fc1")
        self.le_fc2 = nn.Dense(self.hidden_dim, dtype=self.dtype, name="le_fc2")
        self.le_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="le_norm")

    def __call__(self, features, camera_tokens, global_tokens, image_shape, rays_gt=None):
        H, W = image_shape
        b, gh, gw, _ = features[0].shape
        feats = [
            ad(f.reshape(b, gh * gw, -1))
            for ad, f in zip(self.input_adapter, features)
        ]
        cam_cls = jnp.concatenate(
            [ad(t) for ad, t in zip(self.camera_token_adapter, camera_tokens)], axis=1
        )
        glob_cls = jnp.concatenate(
            [ad(t) for ad, t in zip(self.global_token_adapter, global_tokens)], axis=1
        )

        le = self.le_fc2(nn.gelu(self.le_fc1(self.level_embeds.astype(self.dtype)), approximate=False))
        le = self.le_norm(le).astype(self.dtype)
        level_embed = jnp.broadcast_to(
            jnp.repeat(le, gh * gw, axis=0)[None],
            (b, len(feats) * gh * gw, self.hidden_dim),
        )
        pos = position_embedding_sine(gh, gw, num_pos_feats=self.hidden_dim // 2, normalize=True)
        pos = pos.reshape(1, gh * gw, -1)
        pos_embed = jnp.broadcast_to(
            jnp.tile(pos, (1, len(feats), 1)), (b, len(feats) * gh * gw, self.hidden_dim)
        )

        K = self.camera_layer(feats, cam_cls, pos_embed + level_embed, (H, W))
        if rays_gt is None:
            rays, _ = generate_rays(K, (H, W))
        else:
            rays = rays_gt
        scale, shift = self.global_layer(feats, glob_cls, rays, (gh, gw), (H, W))
        logdepth, confidence, depth_features = self.depth_layer(
            feats, rays, pos_embed, level_embed, (gh, gw), (H, W)
        )
        # spatial layer-norm in log space, then scale/shift + softplus
        mean = jnp.mean(logdepth, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(logdepth, axis=(1, 2, 3), keepdims=True)
        depth_n = jnp.exp((logdepth - mean) / jnp.sqrt(var + 1e-5))
        depth = (depth_n + shift) * scale
        depth = jax.nn.softplus(depth * 10.0) / 10.0
        return {
            "K": K,
            "depth": depth,
            "confidence": confidence,
            "depth_features": depth_features,
            "rays": rays,
        }


class UniDepthV2old(ServingPrecisionMixin):
    """Model wrapper with token-budget resolution control
    (reference unidepthv2_old.py:45-117)."""

    PATCH = 14
    RESOLUTION_LEVELS = 10

    def __init__(self, encoder_cfg: ViTConfig, hidden_dim: int = 512,
                 decoder_depths=(6, 0, 0), num_heads: int = 8, expansion: int = 4,
                 pixels_bounds=(1400, 2400), dtype: Any = None, params=None,
                 attn_impl: str = "nystrom"):
        if dtype is None:
            dtype = jnp.bfloat16 if jax.default_backend() not in ("cpu",) else jnp.float32
        self.dtype = dtype
        self.encoder_cfg = encoder_cfg
        self.encoder = DinoViT(cfg=encoder_cfg, dtype=dtype)
        self.decoder = DecoderV2Old(
            input_dims=(encoder_cfg.embed_dim,) * 4,
            hidden_dim=hidden_dim,
            num_heads=num_heads,
            expansion=expansion,
            depths=tuple(decoder_depths),
            attn_impl=attn_impl,
            dtype=dtype,
        )
        self.pixels_bounds = tuple(pixels_bounds)  # in TOKENS
        self.resolution_level: int | None = None
        self.params = params
        self._jit_cache = JitCache()  # bounded LRU; utils/misc.py
        self._init_serving()  # bf16 pre-cast + opt-in int8 (models/serving.py)

    @classmethod
    def from_config(cls, config: dict, params=None, dtype=None) -> "UniDepthV2old":
        enc_name = config["model"]["pixel_encoder"]["name"]
        preset = enc_name.replace("dinov2_", "")
        vit = VIT_PRESETS[preset]
        enc_cfg = ViTConfig(
            embed_dim=vit.embed_dim,
            depth=vit.depth,
            num_heads=vit.num_heads,
            output_idx=tuple(
                config["model"]["pixel_encoder"].get(
                    "output_idx", [vit.depth - 3, vit.depth - 2, vit.depth - 1, vit.depth]
                )
            ),
            use_norm=config["model"]["pixel_encoder"].get("use_norm", False),
        )
        dec = config["model"]["pixel_decoder"]
        model = cls(
            encoder_cfg=enc_cfg,
            hidden_dim=dec["hidden_dim"],
            decoder_depths=tuple(dec.get("depths", (6, 0, 0))),
            num_heads=config["model"].get("num_heads", 8),
            expansion=config["model"].get("expansion", 4),
            dtype=dtype,
            params=params,
        )
        # conversion-audited max |prescaled attention logit| (scripts/
        # convert.py --verify); absent -> serving keeps row-max softmax
        model.attention_logit_bound = config["model"].get("attention_logit_bound")
        return model

    @classmethod
    def from_pretrained(cls, name_or_path: str, dtype=None) -> "UniDepthV2old":
        from unidepth_tpu.io.hub import load_checkpoint

        config, params = load_checkpoint(name_or_path, version=2)
        return cls.from_config(config, params=params, dtype=dtype)

    def init_params(self, seed: int = 0, image_shape=(112, 140)):
        k1, k2 = jax.random.split(jax.random.key(seed))
        h, w = image_shape
        img = jnp.zeros((1, h, w, 3), jnp.float32)
        enc_vars = self.encoder.init(k1, img)
        feats, cls_tokens = jax.eval_shape(
            lambda p, x: self.encoder.apply(p, x), enc_vars, img
        )
        feats_z = [jnp.zeros(f.shape, jnp.float32) for f in feats]
        cls_z = [jnp.zeros(c.shape, jnp.float32) for c in cls_tokens]
        cam = [cls_z[-3], cls_z[-2], cls_z[-1], cls_z[-2]]
        glob = [cls_z[-2], cls_z[-1]]
        dec_vars = self.decoder.init(k2, feats_z, cam, glob, (h, w))
        self.params = {"encoder": enc_vars["params"], "decoder": dec_vars["params"]}
        return self.params

    def _shapes(self, image_shape):
        """(reference unidepthv2_old.py:70-93): token-budget resize."""
        h, w = image_shape
        ratio = w / h
        lo, hi = sorted(self.pixels_bounds)
        # resolution_level None defaults to max resolution
        # (reference unidepthv2_old.py:45-67)
        lvl = self.RESOLUTION_LEVELS if self.resolution_level is None else self.resolution_level
        lvl = min(max(lvl, 0), self.RESOLUTION_LEVELS)
        n = lo + math.ceil((hi - lo) * lvl / self.RESOLUTION_LEVELS)
        lo = hi = n
        tokens = (h / self.PATCH) * (w / self.PATCH)
        tokens = max(min(tokens, hi), lo)
        th = math.ceil((tokens / ratio) ** 0.5 - 0.5)
        tw = math.ceil(th * ratio - 0.5)
        scale = th / h * self.PATCH
        return (th * self.PATCH, tw * self.PATCH), scale

    def encode_decode(self, params, image, rays_gt=None, rng=None):
        _, h, w, _ = image.shape
        train = rng is not None and self.encoder_cfg.drop_path_rate > 0.0
        feats, cls_tokens = self.encoder.apply(
            {"params": params["encoder"]},
            image.astype(self.dtype),
            *((train,) if train else ()),
            rngs={"droppath": rng} if train else None,
        )
        # stacking 'last': stage outputs are blocks output_idx; v2old uses
        # per-block tails (reference unidepthv2_old.py:150-160)
        cam = [cls_tokens[-3], cls_tokens[-2], cls_tokens[-1], cls_tokens[-2]]
        glob = [cls_tokens[-2], cls_tokens[-1]]
        out = self.decoder.apply(
            {"params": params["decoder"]}, feats, cam, glob, (h, w), rays_gt=rays_gt
        )
        angles = generate_rays(out["K"], (h, w))[1].reshape(-1, h, w, 2)
        depth = resize(out["depth"], (h, w), mode="bilinear", align_corners=False, antialias=True)
        points = spherical_zbuffer_to_euclidean(
            jnp.concatenate([angles, depth], axis=-1)
        )
        out["points"] = points
        return out

    def _infer_fn(self, key):
        if key in self._jit_cache:
            return self._jit_cache[key]
        (H, W, scaled, ratio, has_K) = key
        sh, sw = scaled

        def run(params, rgb, K):
            with self._serving_trace_ctx():
                return body(params, rgb, K)

        def body(params, rgb, K):
            mean = jnp.asarray(IMAGENET_DATASET_MEAN) * 255.0
            std = jnp.asarray(IMAGENET_DATASET_STD) * 255.0
            x = (rgb - mean) / std
            x = resize(x, (sh, sw), mode="bilinear", align_corners=False, antialias=True)
            rays_gt = None
            if has_K:
                Kn = K.at[:, :2].multiply(ratio)
                rays_gt, _ = generate_rays(Kn, (sh, sw))
            feats, cls_tokens = self._serving_encoder().apply(
                {"params": params["encoder"]}, x.astype(self.dtype)
            )
            cam = [cls_tokens[-3], cls_tokens[-2], cls_tokens[-1], cls_tokens[-2]]
            glob = [cls_tokens[-2], cls_tokens[-1]]
            out = self.decoder.apply(
                {"params": params["decoder"]}, feats, cam, glob, (sh, sw), rays_gt=rays_gt
            )
            depth = resize(out["depth"], (H, W), mode="nearest-exact")
            conf = resize(out["confidence"], (H, W), mode="bilinear", align_corners=False, antialias=True)
            K_out = out["K"].at[:, :2].divide(ratio)
            angles = generate_rays(K_out, (H, W))[1].reshape(-1, H, W, 2)
            points = spherical_zbuffer_to_euclidean(
                jnp.concatenate([angles, depth], axis=-1)
            )
            return {
                "depth": depth,
                "confidence": conf,
                "intrinsics": K_out,
                "points": points,
            }

        fn = jax.jit(run)
        self._jit_cache[key] = fn
        return fn

    def infer(self, rgbs, intrinsics=None) -> dict:
        rgbs = np.asarray(rgbs) if not isinstance(rgbs, jnp.ndarray) else rgbs
        if rgbs.ndim == 3:
            rgbs = rgbs[None]
        if rgbs.shape[1] == 3 and rgbs.shape[-1] != 3:
            rgbs = jnp.transpose(jnp.asarray(rgbs), (0, 2, 3, 1))
        rgbs = jnp.asarray(rgbs, jnp.float32)
        B, H, W, _ = rgbs.shape
        K = None
        if intrinsics is not None:
            K = jnp.asarray(intrinsics, jnp.float32)
            if K.ndim == 2:
                K = K[None]
        scaled, ratio = self._shapes((H, W))
        key = (H, W, scaled, ratio, K is not None)
        return self._infer_fn(key)(self._serving_params(), rgbs, K)

    def _audit_preprocess(self, rgb):
        """Normalized network-shape batch for ``audit_attention_logits``
        (same normalize/resize as the serving program; raw 0..255 input)."""
        rgb = jnp.asarray(rgb, jnp.float32)
        if rgb.ndim == 3:
            rgb = rgb[None]
        _, H, W, _ = rgb.shape
        scaled, _ = self._shapes((H, W))
        mean = jnp.asarray(IMAGENET_DATASET_MEAN) * 255.0
        std = jnp.asarray(IMAGENET_DATASET_STD) * 255.0
        x = (rgb - mean) / std
        return resize(x, scaled, mode="bilinear", align_corners=False, antialias=True)

"""UniDepthV1 decoder: multi-resolution attention with SH ray conditioning.

TPU re-design of reference unidepth/models/unidepthv1/decoder.py: camera
head aggregates cls tokens against the full feature sequence; the depth
head embeds rays as degree-8 real spherical harmonics at three scales and
runs AttentionBlocks at 1/16 plus Nystrom (landmark) blocks at 1/8 and 1/4
with ConvUpsample stages, emitting multi-scale log-depths (out8/4/2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from unidepth_tpu.nn.conv import Conv2d
from unidepth_tpu.nn.layers import MLP, AttentionBlock
from unidepth_tpu.nn.nystrom import NystromBlock
from unidepth_tpu.nn.upsample import ConvUpsample
from unidepth_tpu.ops.fourier import position_embedding_sine
from unidepth_tpu.ops.resize import flat_interpolate
from unidepth_tpu.parallel.mesh import constrain
from unidepth_tpu.ops.sht import rsh_cart_8
from unidepth_tpu.geometry.rays import generate_rays

Dtype = jnp.dtype


class AdapterItem(nn.Module):
    """LN -> Linear -> GELU (reference v1 ListAdapter, decoder.py:21-36)."""

    hidden_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear")(x.astype(self.dtype))
        return nn.gelu(x, approximate=False)


class CameraHeadV1(nn.Module):
    """(reference unidepthv1/decoder.py:39-107)."""

    input_dim: int
    hidden_dim: int
    num_heads: int = 8
    expansion: int = 4
    depth: int = 2
    layer_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features_list, cls_tokens, pos_embed, original_shapes):
        b = cls_tokens.shape[0]
        cls_tokens = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="cls_norm")(cls_tokens)
        cls_tokens = nn.Dense(self.hidden_dim // 2, dtype=self.dtype, name="cls_fc1")(
            cls_tokens.astype(self.dtype)
        )
        cls_tokens = nn.gelu(cls_tokens, approximate=False)
        cls_tokens = nn.Dense(self.hidden_dim, dtype=self.dtype, name="cls_fc2")(cls_tokens)

        stack = jnp.concatenate(features_list, axis=1) + pos_embed.astype(self.dtype)
        stack = MLP(self.hidden_dim, expansion=2, dtype=self.dtype, name="in_features")(stack)
        context = jnp.concatenate([stack, cls_tokens], axis=1)

        latents_pos = self.param(
            "latents_pos", nn.initializers.normal(1.0), (1, 4, self.hidden_dim)
        )
        latents_pos = jnp.broadcast_to(latents_pos, (b, 4, self.hidden_dim))
        x = AttentionBlock(
            dim=self.hidden_dim,
            num_heads=1,
            expansion=self.expansion,
            layer_scale=self.layer_scale,
            dtype=self.dtype,
            name="aggregate",
        )(cls_tokens, context=context, pos_embed=latents_pos)
        for i in range(self.depth):
            x = AttentionBlock(
                dim=self.hidden_dim,
                num_heads=self.num_heads,
                expansion=self.expansion,
                layer_scale=self.layer_scale,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, pos_embed=latents_pos)
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
        K = jnp.stack(
            [
                jnp.stack([fx, z, cx], -1),
                jnp.stack([z, fy, cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )
        return K


class DepthHeadV1(nn.Module):
    """(reference unidepthv1/decoder.py:110-300)."""

    hidden_dim: int
    num_heads: int = 8
    expansion: int = 4
    depths: tuple[int, ...] = (3, 2, 1)
    camera_dim: int = 81
    attn_impl: str = "nystrom"
    layer_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features_list, rays_hr, pos_embed, level_embed, shapes, original_shapes):
        hd = self.hidden_dim
        b = features_list[0].shape[0]
        rays_hr = jax.lax.stop_gradient(rays_hr)

        def rays_embed(new_shape, proj_dim, name):
            r = flat_interpolate(
                rays_hr, old=original_shapes, new=new_shape, antialias=True
            )
            r = r / jnp.linalg.norm(r, axis=-1, keepdims=True).clip(1e-12)
            sh = rsh_cart_8(r).astype(self.dtype)
            return MLP(
                self.camera_dim,
                expansion=self.expansion,
                output_dim=proj_dim,
                dtype=self.dtype,
                name=name,
            )(sh)

        h16, w16 = shapes
        emb16 = rays_embed((h16, w16), hd, "project_rays16")
        emb8 = rays_embed((h16 * 2, w16 * 2), hd // 2, "project_rays8")
        emb4 = rays_embed((h16 * 4, w16 * 4), hd // 4, "project_rays4")

        tokens = jnp.concatenate(features_list, axis=1)
        tokens_pos = (pos_embed + level_embed).astype(self.dtype)

        feats_cat = jnp.concatenate(features_list, axis=-1)
        feats16 = nn.Dense(hd, dtype=self.dtype, name="features_channel_cat")(feats_cat)
        latents = MLP(hd, expansion=2, dtype=self.dtype, name="to_latents")(feats16)

        latents = AttentionBlock(
            dim=hd, num_heads=1, expansion=self.expansion, layer_scale=self.layer_scale,
            context_dim=hd, dtype=self.dtype, name="aggregate_16",
        )(latents, context=tokens, pos_embed_context=tokens_pos)
        latents = AttentionBlock(
            dim=hd, num_heads=1, expansion=self.expansion, layer_scale=self.layer_scale,
            context_dim=hd, dtype=self.dtype, name="prompt_camera",
        )(latents, context=emb16)

        outs = []
        embs = [emb16, emb8, emb4]
        dims = [hd, hd // 2, hd // 4]
        heads = [max(1, self.num_heads >> li) for li in range(3)]
        cur_shape = (h16, w16)
        depth_features = None
        for li, depth in enumerate(self.depths):
            emb = embs[li]
            for bi in range(depth):
                if li == 0:
                    latents = AttentionBlock(
                        dim=dims[li], num_heads=heads[li], expansion=self.expansion,
                        layer_scale=self.layer_scale, dtype=self.dtype,
                        name=f"layers_{16 >> li}_{bi}",
                    )(latents, pos_embed=emb)
                else:
                    latents = NystromBlock(
                        dim=dims[li], num_heads=heads[li], expansion=self.expansion,
                        layer_scale=self.layer_scale, attn_impl=self.attn_impl,
                        dtype=self.dtype, name=f"layers_{16 >> li}_{bi}",
                    )(latents, pos_embed=emb)
            if li == 0:
                depth_features = latents.reshape(b, *cur_shape, -1)
            grid = (latents + emb).reshape(b, *cur_shape, dims[li])
            latents = ConvUpsample(
                dims[li], expansion=self.expansion, layer_scale=self.layer_scale,
                dtype=self.dtype, name=f"up{8 >> li}",
            )(grid)
            cur_shape = (cur_shape[0] * 2, cur_shape[1] * 2)
            out = Conv2d(1, kernel_size=3, dtype=self.dtype, name=f"out{8 >> li}")(
                latents.reshape(b, *cur_shape, dims[li] // 2)
            )
            outs.append(jnp.exp(jnp.clip(out.astype(jnp.float32), -10.0, 10.0)))

        return outs[0], outs[1], outs[2], depth_features


class DecoderV1(nn.Module):
    """(reference unidepthv1/decoder.py:303-533)."""

    input_dims: tuple[int, ...]
    hidden_dim: int
    num_heads: int = 8
    expansion: int = 4
    depths: tuple[int, ...] = (3, 2, 1)
    attn_impl: str = "nystrom"
    layer_scale: float = 1.0
    dtype: Dtype = jnp.float32

    def setup(self):
        n = len(self.input_dims)
        self.input_adapter = [
            AdapterItem(self.hidden_dim, dtype=self.dtype, name=f"input_adapter_{i}")
            for i in range(n)
        ]
        self.token_adapter = [
            AdapterItem(self.hidden_dim, dtype=self.dtype, name=f"token_adapter_{i}")
            for i in range(n)
        ]
        self.camera_layer = CameraHeadV1(
            input_dim=self.hidden_dim,
            hidden_dim=self.hidden_dim,
            num_heads=self.num_heads,
            expansion=self.expansion,
            layer_scale=self.layer_scale,
            dtype=self.dtype,
            name="camera_layer",
        )
        self.depth_layer = DepthHeadV1(
            hidden_dim=self.hidden_dim,
            num_heads=self.num_heads,
            expansion=self.expansion,
            depths=tuple(self.depths),
            attn_impl=self.attn_impl,
            layer_scale=self.layer_scale,
            dtype=self.dtype,
            name="depth_layer",
        )
        self.level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0), (len(self.input_dims), self.hidden_dim)
        )
        self.le_fc1 = nn.Dense(self.hidden_dim, dtype=self.dtype, name="le_fc1")
        self.le_fc2 = nn.Dense(self.hidden_dim, dtype=self.dtype, name="le_fc2")
        self.le_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="le_norm")

    def __call__(self, features, cls_tokens, image_shape, rays_gt=None, skip_camera=False, K_gt=None):
        """features: list of (B, h, w, C) max-stacked per stage; cls_tokens:
        list of (B, 1, C) (last-4-block tokens, natural order)."""
        H, W = image_shape
        b = features[0].shape[0]
        # common grid = second-smallest level resolution (1/16 for ConvNeXt
        # pyramids, identity for ViT; reference v1 decoder.py:384-404)
        shapes_per_level = [tuple(f.shape[1:3]) for f in features]
        level_shapes = sorted(set(shapes_per_level), reverse=True)
        gh, gw = level_shapes[-2] if len(level_shapes) > 1 else level_shapes[0]
        # Seam constraint: each adapted level fans out to both the camera
        # and depth heads; without pinning the layout here their backward
        # cotangents arrive differently sharded and GSPMD's add_any falls
        # back to involuntary full rematerialization (2x2x2 dryrun,
        # transpose(jvp(DecoderV1))/input_adapter_*). The constraint
        # differentiates to itself, so it pins the cotangent layout too.
        # No-op without an ambient mesh.
        feats = [
            constrain(
                adapter(
                    flat_interpolate(
                        f.reshape(b, f.shape[1] * f.shape[2], -1),
                        old=tuple(f.shape[1:3]),
                        new=(gh, gw),
                        antialias=True,
                    )
                ),
                ("data", "fsdp"),
            )
            for adapter, f in zip(self.input_adapter, features)
        ]
        # reference reverses block order for the camera tokens
        cams = [
            constrain(adapter(t), ("data", "fsdp"))
            for adapter, t in zip(self.token_adapter, cls_tokens[::-1])
        ]
        cls_cat = jnp.concatenate(cams, axis=1)

        le = self.le_fc2(nn.gelu(self.le_fc1(self.level_embeds.astype(self.dtype)), approximate=False))
        le = self.le_norm(le).astype(self.dtype)  # (num_levels, hidden)
        level_embed = jnp.broadcast_to(
            jnp.repeat(le, gh * gw, axis=0)[None],
            (b, len(feats) * gh * gw, self.hidden_dim),
        )
        pos = position_embedding_sine(gh, gw, num_pos_feats=self.hidden_dim // 2, normalize=True)
        pos = pos.reshape(1, gh * gw, -1)
        pos_embed = jnp.broadcast_to(
            jnp.tile(pos, (1, len(feats), 1)), (b, len(feats) * gh * gw, self.hidden_dim)
        )

        if skip_camera and K_gt is not None:
            intrinsics = K_gt
            rays = rays_gt
        else:
            intrinsics = self.camera_layer(
                feats, cls_cat, (pos_embed + level_embed), (H, W)
            )
            if rays_gt is None:
                rays, _ = generate_rays(intrinsics, (H, W))
            else:
                rays = rays_gt

        out8, out4, out2, depth_features = self.depth_layer(
            feats, rays, pos_embed, level_embed, (gh, gw), (H, W)
        )
        return intrinsics, (out8, out4, out2), depth_features

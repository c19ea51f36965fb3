"""UniDepthV2 decoder: self-promptable camera head + depth head.

TPU re-design of reference unidepth/models/unidepthv2/decoder.py: the
camera head regresses 4 pinhole parameters from the encoder cls tokens via
two self-attention blocks; the predicted (or ground-truth) rays condition
the depth head through camera-prompted cross-attention; a ConvTranspose
feature pyramid + residual bilinear upsamplers produce log-depth and
log-confidence. All spatial ops are NHWC; every interpolate is the exact
torch-semantics matmul resize.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from unidepth_tpu.nn.conv import Conv2d, PatchConvTranspose
from unidepth_tpu.nn.layers import MLP, AttentionBlock, AttentionLayer
from unidepth_tpu.nn.upsample import ResUpsampleBil
from unidepth_tpu.ops.fourier import generate_fourier_features, position_embedding_sine
from unidepth_tpu.ops.resize import flat_interpolate, resize
from unidepth_tpu.geometry.coords import coords_grid

Dtype = jnp.dtype


class CameraHead(nn.Module):
    """cls tokens -> (fx, fy, cx, cy) (reference decoder.py:48-114)."""

    hidden_dim: int
    num_heads: int = 8
    expansion: int = 4
    layer_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cls_tokens: jnp.ndarray, shapes: tuple[int, int]):
        b = cls_tokens.shape[0]
        latents_pos = self.param(
            "latents_pos",
            nn.initializers.normal(1.0),
            (1, 4, self.hidden_dim),
        )
        latents_pos = jnp.broadcast_to(latents_pos, (b, 4, self.hidden_dim))
        tokens = MLP(self.hidden_dim, expansion=1, output_dim=self.hidden_dim, dtype=self.dtype, name="project")(cls_tokens)
        for i in (1, 2):
            tokens = AttentionBlock(
                dim=self.hidden_dim,
                num_heads=self.num_heads,
                expansion=self.expansion,
                layer_scale=self.layer_scale,
                use_bias=False,
                dtype=self.dtype,
                name=f"aggregate{i}",
            )(tokens, pos_embed=latents_pos)
        x = MLP(self.hidden_dim, expansion=1, output_dim=1, dtype=self.dtype, name="out_pinhole")(tokens)
        x = x[..., 0].astype(jnp.float32)  # (B, 4)

        h, w = shapes
        diag = float(np.sqrt(h * h + w * w))
        fx = jnp.exp(x[:, 0]) * (0.7 * diag)
        fy = jnp.exp(x[:, 1]) * (0.7 * diag)
        cx = nn.sigmoid(x[:, 2]) * w
        cy = nn.sigmoid(x[:, 3]) * h
        return jnp.stack([fx, fy, cx, cy], axis=1)


class DepthHead(nn.Module):
    """Camera-conditioned multi-scale depth/confidence decoder
    (reference decoder.py:117-333)."""

    hidden_dim: int
    num_heads: int = 8
    expansion: int = 4
    depths: tuple[int, ...] = (2, 2, 2)
    out_dim: int = 64
    kernel_size: int = 3
    layer_scale: float = 1.0
    use_norm: bool = False
    num_prompt_blocks: int = 1
    dtype: Dtype = jnp.float32

    def setup(self):
        hd = self.hidden_dim
        mult = 2
        num_levels = len(self.depths)
        self.prompt_camera = [
            AttentionLayer(
                num_blocks=self.num_prompt_blocks,
                dim=hd,
                num_heads=self.num_heads,
                expansion=self.expansion,
                layer_scale=-1.0,
                context_dim=hd,
                use_bias=False,
                dtype=self.dtype,
                name=f"prompt_camera_{i}",
            )
            for i in range(4)
        ]
        self.to_latents = nn.Dense(hd, dtype=self.dtype, name="to_latents")

        ups, process, depth_mlp_dims = [], [], []
        current_dims, out_dims = [], []
        for i, depth in enumerate(self.depths):
            current_dim = min(hd, mult * hd // int(2**i))
            next_dim = mult * hd // int(2 ** (i + 1))
            output_dim = max(next_dim, self.out_dim)
            current_dims.append(current_dim)
            out_dims.append(output_dim)
            process.append(
                PatchConvTranspose(
                    current_dim,
                    # level i's cond map must reach the 2^i-upsampled latent
                    # grid (max(1, 2*i) coincides only for i <= 2)
                    scale=2**i,
                    dtype=self.dtype,
                    name=f"process_features_{i}",
                )
            )
            ups.append(
                ResUpsampleBil(
                    current_dim,
                    output_dim=output_dim,
                    num_layers=depth,
                    kernel_size=self.kernel_size,
                    layer_scale=self.layer_scale,
                    use_norm=self.use_norm,
                    dtype=self.dtype,
                    name=f"ups_{i}",
                )
            )
        self.ups = ups
        self.process_features = process
        self.final_dim = out_dims[-1]

        self.depth_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="depth_norm")
        self.depth_linear = nn.Dense(self.final_dim, dtype=self.dtype, name="depth_linear")
        self.conf_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="conf_norm")
        self.conf_linear = nn.Dense(self.final_dim, dtype=self.dtype, name="conf_linear")

        self.to_depth_lr = Conv2d(
            self.final_dim // 2, kernel_size=3, padding_mode="reflect", dtype=self.dtype, name="to_depth_lr"
        )
        self.to_conf_lr = Conv2d(
            self.final_dim // 2, kernel_size=3, padding_mode="reflect", dtype=self.dtype, name="to_conf_lr"
        )
        self.to_depth_hr1 = Conv2d(32, kernel_size=3, padding_mode="reflect", dtype=self.dtype, name="to_depth_hr1")
        self.to_depth_hr2 = Conv2d(1, kernel_size=1, padding=0, dtype=self.dtype, name="to_depth_hr2")
        self.to_conf_hr1 = Conv2d(32, kernel_size=3, padding_mode="reflect", dtype=self.dtype, name="to_conf_hr1")
        self.to_conf_hr2 = Conv2d(1, kernel_size=1, padding=0, dtype=self.dtype, name="to_conf_hr2")

    def embed_rays(self, rays, shapes, original_shapes):
        """rays (B, H*W, 3) at original res -> fourier embedding at the
        low-res token grid (reference decoder.py:234-253)."""
        r = flat_interpolate(rays, old=original_shapes, new=shapes, antialias=True)
        r = r / jnp.linalg.norm(r, axis=-1, keepdims=True).clip(1e-4)
        x, y, z = r[..., 0], r[..., 1], r[..., 2]
        # clip strictly inside (-1, 1): d/dz arccos diverges at |z|=1 and a
        # ray through the principal point would poison the backward pass.
        polar = jnp.arccos(jnp.clip(z, -1.0 + 1e-7, 1.0 - 1e-7))
        x_c = jnp.maximum(jnp.abs(x), 1e-3) * jnp.where(x >= 0, 1.0, -1.0)
        azimuth = jnp.arctan2(y, x_c)
        ang = jnp.stack([polar, azimuth], axis=-1)
        return generate_fourier_features(
            ang,
            dim=self.hidden_dim,
            max_freq=max(shapes) // 2,
            use_log=True,
        )

    def __call__(self, features, rays_hr, shapes, original_shapes):
        """features: list of 4 (B, N, hidden); rays_hr (B, H*W, 3)."""
        h, w = shapes
        b = features[0].shape[0]
        rays_embedding = self.embed_rays(rays_hr, shapes, original_shapes).astype(self.dtype)

        conditioned = [
            prompter(feat, context=rays_embedding)
            for prompter, feat in zip(self.prompt_camera, features)
        ]
        init_latents = self.to_latents(conditioned[0])
        latents = init_latents.reshape(b, h, w, -1)
        cond_maps = [c.reshape(b, h, w, -1) for c in conditioned]

        out_features = []
        for i, up in enumerate(self.ups):
            latents = latents + self.process_features[i](cond_maps[i + 1])
            latents = up(latents)
            out_features.append(latents)

        # depth projection (only the last level feeds the output,
        # reference decoder.py:284-303)
        final = out_features[-1]
        logdepth = self.depth_linear(self.depth_norm(final).astype(self.dtype))
        logdepth = self.to_depth_lr(logdepth)
        logdepth = resize(logdepth, original_shapes, mode="bilinear", align_corners=True)
        logdepth = self.to_depth_hr1(logdepth)
        logdepth = nn.leaky_relu(logdepth, negative_slope=0.01)
        logdepth = self.to_depth_hr2(logdepth)

        confidence = self.conf_linear(self.conf_norm(final).astype(self.dtype))
        confidence = self.to_conf_lr(confidence)
        confidence = resize(confidence, original_shapes, mode="bilinear", align_corners=True)
        confidence = self.to_conf_hr1(confidence)
        confidence = nn.leaky_relu(confidence, negative_slope=0.01)
        confidence = self.to_conf_hr2(confidence)

        return logdepth, confidence, init_latents


class Decoder(nn.Module):
    """Full V2 decoder (reference decoder.py:336-524)."""

    input_dims: tuple[int, ...]
    hidden_dim: int
    num_heads: int = 8
    expansion: int = 4
    depths: tuple[int, ...] = (2, 2, 2)
    out_dim: int = 64
    kernel_size: int = 3
    layer_scale: float = 1.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.input_adapter = [
            nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"input_adapter_{i}")
            for i in range(len(self.input_dims))
        ]
        self.camera_token_adapter = [
            nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"camera_token_adapter_{i}")
            for i in range(len(self.input_dims))
        ]
        self.camera_layer = CameraHead(
            hidden_dim=self.hidden_dim,
            num_heads=self.num_heads,
            expansion=self.expansion,
            layer_scale=self.layer_scale,
            dtype=self.dtype,
            name="camera_layer",
        )
        self.depth_layer = DepthHead(
            hidden_dim=self.hidden_dim,
            num_heads=self.num_heads,
            expansion=self.expansion,
            depths=self.depths,
            out_dim=self.out_dim,
            kernel_size=self.kernel_size,
            layer_scale=self.layer_scale,
            dtype=self.dtype,
            name="depth_layer",
        )
        # orthonormal level embeddings: a frozen buffer in the reference
        # (decoder.py:519-524); loaded from checkpoints, QR-init otherwise.
        self.level_embeds = self.param(
            "level_embeds",
            nn.initializers.orthogonal(),
            (len(self.input_dims), self.hidden_dim),
        )

    def run_camera(self, cls_tokens, shapes):
        """Predict intrinsics and back-project the pixel grid to unit rays
        (reference decoder.py:361-403)."""
        h, w = shapes
        intrinsics = self.camera_layer(cls_tokens, shapes)  # (B, 4) fp32
        fx, fy, cx, cy = (intrinsics[:, i] for i in range(4))
        uv = coords_grid(h, w)  # (H, W, 2), +0.5 centers
        x = (uv[None, ..., 0] - cx[:, None, None]) / fx[:, None, None]
        y = (uv[None, ..., 1] - cy[:, None, None]) / fy[:, None, None]
        rays = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True).clip(1e-5)

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
        return K, rays.reshape(rays.shape[0], h * w, 3)

    def __call__(self, features, cls_tokens, image_shape, rays_gt=None):
        """features/cls_tokens: 4-lists from the encoder; image_shape (H,W);
        rays_gt optional (B, H*W, 3) overriding predicted rays."""
        H, W = image_shape
        b, gh, gw, _ = features[0].shape
        feats = [
            adapter(f.reshape(b, gh * gw, -1))
            for adapter, f in zip(self.input_adapter, features)
        ]
        cam_tokens = [
            adapter(t)
            for adapter, t in zip(self.camera_token_adapter, cls_tokens)
        ]
        intrinsics, rays = self.run_camera(
            jnp.concatenate(cam_tokens, axis=1), (H, W)
        )
        if rays_gt is not None:
            rays = rays_gt

        logdepth, logconf, depth_features = self.depth_layer(
            feats, rays, (gh, gw), (H, W)
        )
        logdepth = logdepth.astype(jnp.float32)
        logconf = logconf.astype(jnp.float32)
        radius = jnp.exp(jnp.clip(logdepth, -8.0, 8.0) + 2.0)
        confidence = jnp.exp(jnp.clip(logconf, -8.0, 8.0))
        return {
            "radius": radius,  # (B, H, W, 1)
            "confidence": confidence,  # (B, H, W, 1)
            "depth_features": depth_features,  # (B, N, hidden)
            "intrinsics": intrinsics,  # (B, 3, 3)
            "rays": rays,  # (B, H*W, 3)
        }

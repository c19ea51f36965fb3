"""Upsampling stacks used by the depth heads.

TPU re-design of reference unidepth/layers/upsample.py and convnext.py:
residual conv units + 1x1-projection + bilinear 2x upsample (V2), and
ConvNeXt-block + upsample variants (V1). Bilinear 2x upsampling reuses the
matmul resize (exact torch semantics, align_corners=False).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from unidepth_tpu.nn.conv import Conv2d
from unidepth_tpu.ops.resize import resize
from unidepth_tpu.parallel.mesh import constrain

Dtype = jnp.dtype


class CvnxtBlock(nn.Module):
    """ConvNeXt block: dw-conv7 -> LN -> pw-MLP -> layer scale
    (reference layers/convnext.py:5-45)."""

    dim: int
    kernel_size: int = 7
    expansion: int = 4
    layer_scale: float = 1.0
    padding_mode: str = "zeros"
    fused: str = "auto"  # 'auto' | 'on' | 'off': LN -> pwconv1 -> GELU in one
    # Pallas kernel (ops/fused_block.ln_dense) — same gating as the ConvNeXt
    # encoder block (models/backbones/convnext.py): TPU, lane-tiled dims,
    # no ambient mesh
    dtype: Dtype = jnp.float32

    def _use_fused(self) -> bool:
        import jax

        from unidepth_tpu.ops.fused_block import ln_dense_supported

        if self.fused == "off" or not ln_dense_supported(
            self.dim, self.expansion * self.dim
        ):
            return False
        if self.fused == "on":
            return True
        if jax.default_backend() in ("cpu",):
            return False
        from unidepth_tpu.parallel.mesh import ambient_mesh

        return ambient_mesh() is None

    @nn.compact
    def __call__(self, x):
        # Seam constraint: upstream attention blocks leave activations
        # tp-sharded over channels; the grouped dwconv cannot consume that
        # layout and GSPMD falls back to involuntary full rematerialization
        # (observed on the 2x2x2 dryrun in jvp(DecoderV1)/depth_layer/up*).
        # These decoder maps are small — batch-shard, channel-replicate.
        # No-op without an ambient mesh (parallel/mesh.py:constrain).
        x = constrain(x, ("data", "fsdp"))
        inp = x
        x = Conv2d(
            self.dim,
            kernel_size=self.kernel_size,
            feature_group_count=self.dim,
            padding_mode=self.padding_mode,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        if self._use_fused():
            from unidepth_tpu.nn.layers import DenseParams, LNParams
            from unidepth_tpu.ops.fused_block import ln_dense

            g, bt = LNParams(name="norm")(self.dim)
            w1, b1 = DenseParams(self.expansion * self.dim, name="pwconv1")(self.dim)
            # torch LayerNorm default eps (reference convnext.py:25 passes none)
            x = ln_dense(x, w1.astype(self.dtype), b1, g, bt, 1e-5, "gelu")
        else:
            # torch nn.LayerNorm default eps (reference convnext.py:25)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
            x = x.astype(self.dtype)
            x = nn.Dense(self.expansion * self.dim, dtype=self.dtype, name="pwconv1")(x)
            x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale), (self.dim,)
        )
        return inp + x * gamma.astype(self.dtype)


class ResidualConvUnit(nn.Module):
    """LeakyReLU -> conv -> LeakyReLU -> conv with scaled residual
    (reference layers/upsample.py:137-180)."""

    dim: int
    kernel_size: int = 3
    layer_scale: float = 1.0
    padding_mode: str = "zeros"
    use_norm: bool = False
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.leaky_relu(x, negative_slope=0.01)
        out = Conv2d(
            self.dim,
            kernel_size=self.kernel_size,
            padding=self.dilation * (self.kernel_size - 1) // 2,
            padding_mode=self.padding_mode,
            dtype=self.dtype,
            name="conv1",
        )(out)
        if self.use_norm:
            out = nn.GroupNorm(num_groups=self.dim // 16, epsilon=1e-5, dtype=jnp.float32, name="norm1")(out)
            out = out.astype(self.dtype)
        out = nn.leaky_relu(out, negative_slope=0.01)
        out = Conv2d(
            self.dim,
            kernel_size=self.kernel_size,
            padding=self.dilation * (self.kernel_size - 1) // 2,
            padding_mode=self.padding_mode,
            dtype=self.dtype,
            name="conv2",
        )(out)
        if self.use_norm:
            out = nn.GroupNorm(num_groups=self.dim // 16, epsilon=1e-5, dtype=jnp.float32, name="norm2")(out)
            out = out.astype(self.dtype)
        if self.layer_scale > 0.0:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale), (self.dim,)
            )
            out = out * gamma.astype(self.dtype)
        return out + x


class ResUpsampleBil(nn.Module):
    """N residual conv units, 1x1 projection, bilinear 2x upsample
    (reference layers/upsample.py:183-223). Input/output NHWC."""

    hidden_dim: int
    output_dim: int | None = None
    num_layers: int = 2
    kernel_size: int = 3
    layer_scale: float = 1.0
    padding_mode: str = "zeros"
    use_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_dim = self.output_dim if self.output_dim is not None else self.hidden_dim // 2
        for i in range(self.num_layers):
            x = ResidualConvUnit(
                self.hidden_dim,
                kernel_size=self.kernel_size,
                layer_scale=self.layer_scale,
                padding_mode=self.padding_mode,
                use_norm=self.use_norm,
                dtype=self.dtype,
                name=f"convs_{i}",
            )(x)
        x = Conv2d(self.output_dim or out_dim, kernel_size=1, padding=0, dtype=self.dtype, name="up_proj")(x)
        b, h, w, _ = x.shape
        return resize(x, (2 * h, 2 * w), mode="bilinear", align_corners=False)


class ConvUpsample(nn.Module):
    """V1 upsampler: CvnxtBlocks then conv1x1 -> bilinear(align_corners=True)
    2x -> conv3x3; returns flattened tokens (reference layers/upsample.py:13-45
    — nn.UpsamplingBilinear2d uses align_corners=True)."""

    hidden_dim: int
    num_layers: int = 2
    expansion: int = 4
    layer_scale: float = 1.0
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = CvnxtBlock(
                self.hidden_dim,
                kernel_size=self.kernel_size,
                expansion=self.expansion,
                layer_scale=self.layer_scale,
                dtype=self.dtype,
                name=f"convs_{i}",
            )(x)
        x = Conv2d(self.hidden_dim // 2, kernel_size=1, padding=0, dtype=self.dtype, name="up_conv1")(x)
        b, h, w, c = x.shape
        x = resize(x, (2 * h, 2 * w), mode="bilinear", align_corners=True)
        x = Conv2d(self.hidden_dim // 2, kernel_size=3, dtype=self.dtype, name="up_conv2")(x)
        return x.reshape(b, 4 * h * w, -1)


class ConvUpsampleShuffleResidual(nn.Module):
    """PixelShuffle upsampler with depthwise smoothing and a bilinear
    residual (reference layers/upsample.py:82-134). NHWC."""

    hidden_dim: int
    num_layers: int = 2
    expansion: int = 4
    layer_scale: float = 1.0
    kernel_size: int = 7
    padding_mode: str = "zeros"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = CvnxtBlock(
                self.hidden_dim,
                kernel_size=self.kernel_size,
                expansion=self.expansion,
                layer_scale=self.layer_scale,
                padding_mode=self.padding_mode,
                dtype=self.dtype,
                name=f"convs_{i}",
            )(x)
        b, h, w, c = x.shape
        # pixel shuffle r=2 (torch channel order c*r*r + i*r + j)
        ps = x.reshape(b, h, w, c // 4, 2, 2)
        ps = ps.transpose(0, 1, 4, 2, 5, 3).reshape(b, 2 * h, 2 * w, c // 4)
        y = Conv2d(
            c // 4,
            kernel_size=7,
            feature_group_count=c // 4,
            padding_mode=self.padding_mode,
            dtype=self.dtype,
            name="up_dw",
        )(ps)
        y = nn.relu(y)
        y = Conv2d(
            c // 2,
            kernel_size=3,
            padding_mode=self.padding_mode,
            dtype=self.dtype,
            name="up_pw",
        )(y)
        res = Conv2d(c // 2, kernel_size=1, padding=0, dtype=self.dtype, name="residual_proj")(x)
        res = resize(res, (2 * h, 2 * w), mode="bilinear", align_corners=True)
        out = y + res
        return out.reshape(b, 4 * h * w, c // 2)

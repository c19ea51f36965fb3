"""Convolution helpers (NHWC, TPU layouts).

Includes torch-semantics padding modes (zeros/reflect/replicate) and a
stride==kernel ConvTranspose expressed as one dense matmul + pixel
rearrangement — the form XLA maps best onto the MXU (used by the V2 depth
head's feature pyramid, reference unidepthv2/decoder.py:165-173).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype

_PAD_MODES = {"zeros": "constant", "reflect": "reflect", "replicate": "edge"}


class Conv2d(nn.Module):
    """NHWC conv with torch-style symmetric padding and padding modes."""

    features: int
    kernel_size: tuple[int, int] | int = 3
    stride: int = 1
    padding: int | None = None  # default: same-resolution for odd kernels
    padding_mode: str = "zeros"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kh, kw = (k, k) if isinstance(k, int) else k
        pad = self.padding if self.padding is not None else (kh - 1) // 2
        if pad > 0:
            mode = _PAD_MODES[self.padding_mode]
            x = jnp.pad(
                x,
                ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                mode=mode,
            )
        return nn.Conv(
            self.features,
            kernel_size=(kh, kw),
            strides=(self.stride, self.stride),
            padding="VALID",
            feature_group_count=self.feature_group_count,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class PatchConvTranspose(nn.Module):
    """ConvTranspose2d with kernel_size == stride == ``scale``.

    out[b, i*s+di, j*s+dj, o] = sum_c x[b,i,j,c] W[c,di,dj,o] + bias —
    a single (C -> s*s*O) matmul followed by a depth-to-space rearrange.
    ``scale == 1`` degenerates to a 1x1 conv (pure matmul).
    """

    features: int
    scale: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        s, o = self.scale, self.features
        kernel = self.param(
            "kernel",
            nn.initializers.truncated_normal(0.02),
            (c, s, s, o),
        )
        bias = self.param("bias", nn.initializers.zeros, (o,))
        y = jnp.einsum(
            "bhwc,cklo->bhwklo",
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        y = y + bias.astype(self.dtype)
        y = y.transpose(0, 1, 3, 2, 4, 5)  # b, h, k, w, l, o
        return y.reshape(b, h * s, w * s, o)

"""ConvNeXt(-V2) encoder, TPU-native (NHWC).

Functional parity with reference unidepth/models/backbones/convnext.py
(timm-style ConvNeXt-L whose forward returns block-granular features at
``output_idx`` plus mean-pooled per-block tokens, convnext.py:460-471) and
convnext2.py (GRN variant). Blocks run under ``nn.scan`` — one compiled
body per stage — and the V1 ``max_stack`` reduction over each stage happens
in-stage so per-block maps are never materialized:

  * stacking='last'    -> stage-final feature per stage (V2-style);
  * stacking='max_cls' -> elementwise max over each stage's blocks, with
    pooled tokens of the last 4 blocks (the V1 consumption pattern,
    reference unidepthv1/decoder.py:373-380).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from unidepth_tpu.nn.conv import Conv2d

Dtype = jnp.dtype


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: tuple[int, ...] = (3, 3, 27, 3)
    dims: tuple[int, ...] = (192, 384, 768, 1536)
    use_grn: bool = False  # ConvNeXt-V2
    drop_path_rate: float = 0.0

    @property
    def output_idx(self) -> tuple[int, ...]:
        out, acc = [], 0
        for d in self.depths:
            acc += d
            out.append(acc)
        return tuple(out)

    @property
    def embed_dims(self) -> list[int]:
        out = []
        for d, dim in zip(self.depths, self.dims):
            out.extend([dim] * d)
        return out


CONVNEXT_PRESETS = {
    "convnext_large": ConvNeXtConfig(),
    "convnext_large_pt": ConvNeXtConfig(),
    "convnextv2_large": ConvNeXtConfig(use_grn=True),
    "convnextv2_base": ConvNeXtConfig(dims=(128, 256, 512, 1024), use_grn=True),
    "convnextv2_huge": ConvNeXtConfig(dims=(352, 704, 1408, 2816), use_grn=True),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    use_grn: bool = False
    ls_init: float = 1e-6
    fused: str = "auto"  # 'auto' | 'on' | 'off': LN -> pwconv1 -> GELU in
    # one Pallas kernel (ops/fused_block.ln_dense, the r5 ViT win applied
    # to the ConvNeXt MLP); 'auto' engages on TPU when the stage is
    # lane-tiled (C, 4C multiples of 128 — stages 1-3 of ConvNeXt-L) and
    # no mesh is ambient (GSPMD cannot partition an opaque pallas_call)
    dtype: Dtype = jnp.float32

    def _use_fused(self) -> bool:
        import jax

        from unidepth_tpu.ops.fused_block import ln_dense_supported

        if self.fused == "off" or not ln_dense_supported(self.dim, 4 * self.dim):
            return False
        if self.fused == "on":
            return True
        if jax.default_backend() in ("cpu",):
            return False
        from unidepth_tpu.parallel.mesh import ambient_mesh

        return ambient_mesh() is None

    @nn.compact
    def __call__(self, x, rate=None):
        """``rate``: optional per-block stochastic-depth rate threaded as a
        scanned input at train time (None = eval / drop_path 0), like the
        ViT blocks (dinov2.py:76); reference ConvNeXt threads timm
        drop_path rates the same way (reference convnext.py:130-226)."""
        inp = x
        x = Conv2d(
            self.dim,
            kernel_size=7,
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        if self._use_fused():
            # dwconv -> [LN + pwconv1 + exact GELU in ONE Pallas kernel]
            # -> pwconv2: the normalized rows and the erf-GELU never touch
            # HBM (docs/PERF.md "ConvNeXt serving anatomy", r5). Params are
            # declared with the exact nn.LayerNorm / nn.Dense trees so the
            # checkpoint layout is byte-identical to the unfused path.
            from unidepth_tpu.nn.layers import DenseParams, LNParams
            from unidepth_tpu.ops.fused_block import ln_dense

            g, bt = LNParams(name="norm")(self.dim)
            w1, b1 = DenseParams(4 * self.dim, name="pwconv1")(self.dim)
            x = ln_dense(x, w1.astype(self.dtype), b1, g, bt, 1e-6, "gelu")
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
            x = nn.Dense(
                4 * self.dim, dtype=self.dtype, name="pwconv1"
            )(x.astype(self.dtype))
            x = nn.gelu(x, approximate=False)
        if self.use_grn:
            gx = jnp.sqrt(jnp.sum(jnp.square(x), axis=(1, 2), keepdims=True) + 1e-12)
            nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
            ggamma = self.param("grn_gamma", nn.initializers.zeros, (4 * self.dim,))
            gbeta = self.param("grn_beta", nn.initializers.zeros, (4 * self.dim,))
            x = ggamma.astype(self.dtype) * (x * nx) + gbeta.astype(self.dtype) + x
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        if not self.use_grn:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.ls_init), (self.dim,)
            )
            x = x * gamma.astype(self.dtype)
        if rate is not None:
            from unidepth_tpu.nn.layers import drop_path

            x = drop_path(x, rate, self.make_rng("droppath"), deterministic=False)
        out = inp + x
        return out, out


class ConvNeXt(nn.Module):
    cfg: ConvNeXtConfig
    stacking: str = "last"  # 'last' | 'max_cls'
    fused: str = "auto"  # fused LN->pwconv1->GELU kernel (ConvNeXtBlock.fused)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False):
        """``train=True`` enables stochastic depth when cfg.drop_path_rate
        > 0 (linear ramp over all blocks, timm convention mirrored by the
        reference backbone)."""
        cfg = self.cfg
        x = nn.Conv(
            cfg.dims[0], kernel_size=(4, 4), strides=(4, 4), padding="VALID",
            dtype=self.dtype, name="stem_conv",
        )(image.astype(self.dtype))
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="stem_norm")(x)
        x = x.astype(self.dtype)

        feats: list[jnp.ndarray] = []
        tokens: list[jnp.ndarray] = []
        tail_tokens: list[jnp.ndarray] = []
        num_stages = len(cfg.depths)
        use_dp = train and cfg.drop_path_rate > 0.0
        dpr = (
            np.linspace(0.0, cfg.drop_path_rate, sum(cfg.depths))
            if use_dp
            else None
        )
        block0 = 0
        for si, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
            if si > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"down_norm_{si}")(x)
                x = nn.Conv(
                    dim, kernel_size=(2, 2), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name=f"down_conv_{si}",
                )(x.astype(self.dtype))
            Scanned = nn.scan(
                nn.remat(ConvNeXtBlock),
                variable_axes={"params": 0},
                split_rngs={"params": True, "droppath": True},
                length=depth,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            rates = (
                jnp.asarray(dpr[block0 : block0 + depth], jnp.float32)
                if use_dp
                else None
            )
            block0 += depth
            x, ys = Scanned(
                dim=dim,
                use_grn=cfg.use_grn,
                fused=self.fused,
                dtype=self.dtype,
                name=f"stage_{si}",
            )(x, rates)
            if self.stacking == "max_cls":
                feats.append(jnp.max(ys, axis=0))
                # pooled tokens of the tail blocks (last num_stages overall)
                for bi in range(depth):
                    blocks_after = sum(cfg.depths[si + 1 :]) + (depth - 1 - bi)
                    if blocks_after < num_stages:
                        tail_tokens.append(jnp.mean(ys[bi], axis=(1, 2))[:, None, :])
            else:
                feats.append(x)
                tokens.append(jnp.mean(x, axis=(1, 2))[:, None, :])
        if self.stacking == "max_cls":
            tokens = tail_tokens  # natural (depth) order; decoder reverses
        return feats, tokens

"""DINOv2 Vision Transformer encoder, TPU-native.

Functional parity with reference unidepth/models/backbones/dinov2.py and
metadinov2/ (ViT-S/B/L-14, per-block feature + cls-token outputs, bicubic
pos-embed interpolation), re-designed for XLA:

  * patch embedding as space-to-depth + one dense matmul (MXU-friendly;
    equivalent to the stride-14 conv at reference metadinov2/patch_embed.py);
  * the block stack runs as ``nn.scan`` segments — one compiled block body
    per output stage instead of ``depth`` unrolled blocks;
  * attention uses fused QKV and fp32-softmax SDPA (Pallas flash kernel for
    long sequences);
  * pos-embed interpolation is a pair of static bicubic resize matmuls
    (reference dinov2.py:267-304, antialias=False, interpolate_offset=0).

Outputs: list of ``(B, h, w, C)`` feature maps and ``(B, 1, C)`` cls tokens,
one per entry in ``output_idx`` (see the ``stacking`` options on DinoViT).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from unidepth_tpu.nn.layers import DenseParams as _DenseParams
from unidepth_tpu.nn.layers import LNParams as _LNParams
from unidepth_tpu.ops.attention import sdpa
from unidepth_tpu.ops.resize import resize

Dtype = jnp.dtype


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int = 14
    mlp_ratio: float = 4.0
    pos_embed_size: int = 37  # 518 // 14 grid, matches released checkpoints
    num_register_tokens: int = 0
    init_values: float = 1.0  # layerscale
    ffn_layer: str = "mlp"  # "mlp" | "swiglu"
    output_idx: tuple[int, ...] = (5, 12, 18, 24)
    use_norm: bool = True
    drop_path_rate: float = 0.0  # linear per-block ramp (dinov2.py:204-205)
    # DINO's historical pos-embed kludge: V1 builds its encoder with
    # interpolate_offset=0.1 hardcoded (reference unidepthv1.py:416-424),
    # which switches torch interpolate to scale_factor=(grid+0.1)/37
    # semantics; V2/V2old use 0.0 (size-based grid). Found by the
    # real-reference parity suite (tests/test_reference_parity.py).
    interpolate_offset: float = 0.0

    @property
    def num_patches(self) -> int:
        return self.pos_embed_size * self.pos_embed_size


VIT_PRESETS: dict[str, ViTConfig] = {
    "vits14": ViTConfig(embed_dim=384, depth=12, num_heads=6, output_idx=(3, 6, 9, 12)),
    "vitb14": ViTConfig(embed_dim=768, depth=12, num_heads=12, output_idx=(3, 6, 9, 12)),
    "vitl14": ViTConfig(embed_dim=1024, depth=24, num_heads=16, output_idx=(6, 12, 18, 24)),
}


class ViTBlock(nn.Module):
    """Pre-LN transformer block with LayerScale (metadinov2/block.py:34-110)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 1.0
    ffn_layer: str = "mlp"
    collect: bool = False  # emit the block output as a scan ys
    attn_impl: str = "auto"  # 'auto' | 'flash' | 'xla'
    quant: bool = False  # int8 serving GEMMs (ops/quant.py); params must
    # carry the QuantDense layout (kernel int8 + scale) for qkv/proj/fc1/fc2
    fused: str = "auto"  # 'auto' | 'on' | 'off': fused LN->GEMM Pallas
    # kernels + QKV-direct ragged attention (ops/fused_block.py); 'auto'
    # enables them whenever the flash kernel is active, the block is a
    # plain-MLP non-quant one, dims are lane-tiled and no mesh is ambient
    dtype: Dtype = jnp.float32

    def _dense(self, features: int, name: str):
        if self.quant:
            from unidepth_tpu.ops.quant import QuantDense

            return QuantDense(features, dtype=self.dtype, name=name)
        return nn.Dense(features, dtype=self.dtype, name=name)

    def _audit_logits(self, qkv, b, n, c, h, prescaled: bool):
        """Under ``collect_attention_logits()``: max |prescaled logit| of
        this block, computed from the fused projection output (the torch
        (3, H, D) channel layout puts q/k in the first/middle C channels,
        head-major). Returns None outside an audit — the value is threaded
        out of the block scan as an extra output (a trace-time ambient sink
        cannot cross a ``lax.scan`` body boundary)."""
        from unidepth_tpu.ops.attention import auditing_logits

        if not auditing_logits():
            return None
        d = c // h
        q = qkv[..., :c].reshape(b, n, h, d).astype(jnp.float32)
        k = qkv[..., c : 2 * c].reshape(b, n, h, d).astype(jnp.float32)
        m = jnp.max(jnp.abs(jnp.einsum("bnhd,bmhd->bhnm", q, k)))
        return m if prescaled else m * jnp.float32(d**-0.5)

    def _use_fused(self, n: int, c: int, use_flash: bool) -> bool:
        from unidepth_tpu.ops.fused_block import ln_dense_supported

        if self.fused == "off" or self.quant or self.ffn_layer != "mlp":
            return False
        d = c // self.num_heads
        shapes_ok = (
            ln_dense_supported(c, 3 * c)
            and ln_dense_supported(c, int(c * self.mlp_ratio))
            and (d == 128 or (d < 128 and 128 % d == 0))
        )
        if not shapes_ok:
            return False
        if self.fused == "on":
            return True
        if not use_flash:
            return False
        # GSPMD cannot partition an opaque pallas_call: under a mesh the
        # packed attention runs through its shard_map wrapper, but the
        # fused LN->GEMM kernels have none yet — keep the unfused path
        from unidepth_tpu.parallel.mesh import ambient_mesh

        return ambient_mesh() is None

    @nn.compact
    def __call__(self, x, rate=None):
        """``rate``: optional per-block stochastic-depth rate, threaded as a
        scanned input at train time (None = eval / drop_path 0)."""
        b, n, c = x.shape
        h = self.num_heads
        use_flash = self.attn_impl == "flash" or (
            self.attn_impl == "auto"
            and n >= 1024
            and jax.default_backend() not in ("cpu",)
        )
        use_fused = self._use_fused(n, c, use_flash)
        if use_fused:
            # r5 A/B (scripts/fused_ab.py, docs/PERF.md "r5 fused block"):
            # LN1 + qkv stay an XLA fusion (the Pallas LN->GEMM measured
            # SLOWER there, 0.78 vs 0.59 ms — XLA pipelines the fp32 LN
            # into the F=3C GEMM better than one Mosaic kernel does), with
            # the softmax scale folded into q's weight columns (exact:
            # power-of-two for ViT head dims) so the attention kernel reads
            # the raw projection output directly — no q/k/v slice/pad/
            # unslice HBM copies around the opaque pallas_call.
            from unidepth_tpu.ops.flash_attention import flash_attention_qkv
            from unidepth_tpu.ops.fused_block import _xla_ln_dense

            wqkv, bqkv = _DenseParams(3 * c, name="qkv")(c)
            g1, bt1 = _LNParams(name="norm1")(c)
            scale = (c // h) ** -0.5
            colmul = jnp.concatenate(
                [
                    jnp.full((c,), scale, jnp.float32),
                    jnp.ones((2 * c,), jnp.float32),
                ]
            )
            qkv = _xla_ln_dense(
                x, (wqkv * colmul).astype(self.dtype), bqkv * colmul, g1, bt1,
                1e-6, None,
            )
            audit_val = self._audit_logits(qkv, b, n, c, h, prescaled=True)
            attn = flash_attention_qkv(qkv, h)
        else:
            y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
            y = y.astype(self.dtype)
            qkv = self._dense(3 * c, "qkv")(y)
            audit_val = self._audit_logits(qkv, b, n, c, h, prescaled=False)
            if use_flash:
                # Head-packed kernel: the torch qkv layout (B,N,3,H,D) means
                # the first/middle/last C channels of the fused projection
                # ARE q/k/v in head-major (H,D) order, so the Pallas kernel
                # reads each head's slab straight from the projection output
                # and writes the merged (B,N,C) layout the out-projection
                # consumes — no head split/merge transposes on either side
                # (~4 layout copies per block removed at 518px). Mesh-aware:
                # under tensor parallelism it runs in a shard_map (batch over
                # data*fsdp, channels/heads over tp) so --tp keeps the flash
                # kernel.
                from unidepth_tpu.ops.flash_attention import (
                    sharded_flash_attention_packed,
                )

                attn = sharded_flash_attention_packed(
                    qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :], h
                )
            else:
                # torch layout: reshape(B,N,3,H,D) -> q,k,v
                qkv = qkv.reshape(b, n, 3, h, c // h)
                q = qkv[:, :, 0].transpose(0, 2, 1, 3)
                k = qkv[:, :, 1].transpose(0, 2, 1, 3)
                v = qkv[:, :, 2].transpose(0, 2, 1, 3)
                attn = sdpa(q, k, v).transpose(0, 2, 1, 3).reshape(b, n, c)
        attn = self._dense(c, "proj")(attn)
        if self.init_values:
            gamma1 = self.param(
                "ls1_gamma", nn.initializers.constant(self.init_values), (c,)
            )
            attn = attn * gamma1.astype(self.dtype)
        if rate is not None:
            from unidepth_tpu.nn.layers import drop_path

            attn = drop_path(
                attn, rate, self.make_rng("droppath"), deterministic=False
            )
        x = x + attn

        hidden = int(c * self.mlp_ratio)
        if use_fused:
            # LN2 + fc1 + exact GELU in ONE Pallas kernel — the big r5 A/B
            # win (2.04 -> 1.06 ms at the ViT-L serving shape: XLA spends
            # ~1 ms on erf-GELU traffic + the LN round trip that the fused
            # epilogue/prologue absorb). fc2 stays XLA: its epilogue fuses
            # bias/LayerScale/residual already.
            from unidepth_tpu.ops.fused_block import ln_dense

            w1, b1 = _DenseParams(hidden, name="fc1")(c)
            g2, bt2 = _LNParams(name="norm2")(c)
            y = ln_dense(x, w1.astype(self.dtype), b1, g2, bt2, 1e-6, "gelu")
            y = self._dense(c, "fc2")(y)
        else:
            y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
            y = y.astype(self.dtype)
            if self.ffn_layer == "mlp":
                y = self._dense(hidden, "fc1")(y)
                y = nn.gelu(y, approximate=False)
                y = self._dense(c, "fc2")(y)
            elif self.ffn_layer == "swiglu":
                w12 = self._dense(2 * ((hidden * 2 // 3 + 7) // 8 * 8), "w12")(y)
                a, g = jnp.split(w12, 2, axis=-1)
                y = self._dense(c, "w3")(nn.silu(a) * g)
            else:
                raise ValueError(self.ffn_layer)
        if self.init_values:
            gamma2 = self.param(
                "ls2_gamma", nn.initializers.constant(self.init_values), (c,)
            )
            y = y * gamma2.astype(self.dtype)
        if rate is not None:
            from unidepth_tpu.nn.layers import drop_path

            y = drop_path(y, rate, self.make_rng("droppath"), deterministic=False)
        out = x + y
        ys = out if self.collect else None
        # audit mode threads the per-block logit max through the scan as a
        # second collected output (static structure: auditing is resolved
        # at trace time, consistently here and at the DinoViT unpack)
        return out, (ys if audit_val is None else (ys, audit_val))


class DinoViT(nn.Module):
    """DINOv2 encoder producing per-stage features and cls tokens.

    ``stacking``:
      * 'last' — features/cls of the stage-final block (V2 shipped configs,
        reference unidepthv2.py:364-372 with stacking_fn='last'; cheapest:
        only the scan carry materializes);
      * 'max' | 'mean' | 'first' | 'softmax' — reduce every block output in
        the stage with utils/misc.STACKING_FNS (the reference's other
        stacking_fn options);
      * 'max_cls' — V1 behaviour: per-block features get their cls token
        added (reference unidepthv1.py:321-326), stages reduce with an
        elementwise max (max_stack), and the returned cls tokens are those
        of the last ``len(output_idx)`` blocks in natural order
        (reference unidepthv1/decoder.py:373-380).
    """

    cfg: ViTConfig
    stacking: str = "last"
    attn_impl: str = "auto"  # 'auto' | 'flash' | 'xla'
    remat: bool = True  # rematerialize blocks under grad (no fwd-only cost)
    unroll: int = 1  # lax.scan unroll factor (XLA can pipeline across blocks)
    quant: bool | tuple = False  # int8 serving GEMMs (ops/quant.py): one
    # bool for every block, or a per-STAGE tuple (len(output_idx)) for
    # sensitivity-calibrated selective quantization (exp-head V1 serving:
    # ServingPrecisionMixin.calibrate_int8_stages)
    fused: str = "auto"  # fused LN->GEMM + QKV-direct attention (ViTBlock.fused)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False):
        """image: (B, H, W, 3), H and W multiples of patch_size.

        ``train=True`` enables stochastic depth when cfg.drop_path_rate > 0
        (requires a 'droppath' rng in apply; reference metadinov2/block.py
        drop_path1 on both residual branches, linear ramp dinov2.py:204)."""
        cfg = self.cfg
        b, h, w, _ = image.shape
        p = cfg.patch_size
        gh, gw = h // p, w // p
        c = cfg.embed_dim

        # --- patch embed as space-to-depth + matmul ---------------------
        # batch-sharded activation constraints at the reshape/transpose
        # seams: without them GSPMD can fail the layout transition and fall
        # back to "involuntary full rematerialization" (a full all-gather
        # of the activation) — seen on the (B, gh*gw, p*p*3) reshape under
        # a dp x fsdp x tp mesh. No-ops without an ambient mesh.
        from unidepth_tpu.parallel.mesh import constrain

        image = constrain(image, ("data", "fsdp"))
        patches = image.reshape(b, gh, p, gw, p, 3)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * 3)
        patches = constrain(patches, ("data", "fsdp"))
        kernel = self.param(
            "patch_kernel",
            nn.initializers.truncated_normal(0.02),
            (p * p * 3, c),
        )
        bias = self.param("patch_bias", nn.initializers.zeros, (c,))
        x = (
            jnp.dot(
                patches.astype(self.dtype),
                kernel.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + bias
        ).astype(self.dtype)

        # --- cls token + interpolated pos embed --------------------------
        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, c))
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, cfg.num_patches + 1, c),
        )
        cls_pos = pos_embed[:, :1]
        patch_pos = pos_embed[:, 1:].reshape(
            1, cfg.pos_embed_size, cfg.pos_embed_size, c
        )
        if (gh, gw) != (cfg.pos_embed_size, cfg.pos_embed_size):
            # reference dinov2.py:293-301: bicubic, antialias=False, resized
            # to the (rows, cols) patch grid and flattened row-major. With
            # interpolate_offset (V1 only), torch switches to explicit
            # scale_factor=(grid+offset)/pos_size semantics (dinov2.py:283-291).
            scales = (
                (
                    (gh + cfg.interpolate_offset) / cfg.pos_embed_size,
                    (gw + cfg.interpolate_offset) / cfg.pos_embed_size,
                )
                if cfg.interpolate_offset
                else None
            )
            patch_pos = resize(
                patch_pos, (gh, gw), mode="bicubic", align_corners=False,
                scale_factors=scales,
            )
        patch_pos = patch_pos.reshape(1, gh * gw, c)
        x = x + patch_pos.astype(self.dtype)
        cls = jnp.broadcast_to(cls_token, (b, 1, c)) + cls_pos
        cls = cls.astype(self.dtype)

        if cfg.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.normal(1e-6),
                (1, cfg.num_register_tokens, c),
            )
            reg = jnp.broadcast_to(reg, (b, cfg.num_register_tokens, c)).astype(self.dtype)
            x = jnp.concatenate([cls, reg, x], axis=1)
        else:
            x = jnp.concatenate([cls, x], axis=1)
        x = constrain(x, ("data", "fsdp"))

        # --- block stack as scanned segments -----------------------------
        boundaries = [0, *cfg.output_idx]
        feats: list[jnp.ndarray] = []
        cls_tokens: list[jnp.ndarray] = []
        final_norm = (
            # eps=1e-6: DINOv2 builds ALL norms (block + final) with
            # partial(nn.LayerNorm, eps=1e-6) (reference dinov2.py:167)
            nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")
            if cfg.use_norm
            else None
        )
        reg = cfg.num_register_tokens
        all_cls: list[jnp.ndarray] = []
        use_dp = train and cfg.drop_path_rate > 0.0
        dpr = np.linspace(0.0, cfg.drop_path_rate, cfg.depth) if use_dp else None
        for si in range(len(cfg.output_idx)):
            seg_len = boundaries[si + 1] - boundaries[si]
            collect_ys = self.stacking != "last"
            block_cls = nn.remat(ViTBlock) if self.remat else ViTBlock
            Scanned = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "droppath": True},
                length=seg_len,
                unroll=self.unroll,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            rates = (
                jnp.asarray(dpr[boundaries[si] : boundaries[si + 1]], jnp.float32)
                if use_dp
                else None
            )
            x, ys = Scanned(
                dim=c,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                init_values=cfg.init_values,
                ffn_layer=cfg.ffn_layer,
                collect=collect_ys,
                attn_impl=self.attn_impl,
                quant=self.quant
                if isinstance(self.quant, bool)
                else bool(self.quant[si]),
                fused=self.fused,
                dtype=self.dtype,
                name=f"stage_{si}",
            )(x, rates)
            from unidepth_tpu.ops.attention import auditing_logits, record_logit_max

            if auditing_logits():
                # outside the scan the per-block maxima are a stacked (L,)
                # tracer of THIS trace — legal to hand to the ambient sink
                ys, seg_logit_max = ys
                record_logit_max(jnp.max(seg_logit_max))
            # clean resharding seam at every scan-stage boundary
            x = constrain(x, ("data", "fsdp"))
            if self.stacking == "max_cls":
                seg_cls = ys[:, :, :1]  # (L, B, 1, C)
                seg_patches = ys[:, :, 1 + reg :]
                combined = jnp.max(seg_patches + seg_cls, axis=0)
                feats.append(combined.reshape(b, gh, gw, c))
                all_cls.extend([seg_cls[i] for i in range(seg_len)])
            elif self.stacking != "last":
                outs = ys
                if final_norm is not None:
                    outs = final_norm(outs).astype(self.dtype)
                if self.stacking == "max":
                    red = jnp.max(outs, axis=0)
                elif self.stacking == "mean":
                    red = jnp.mean(outs, axis=0)
                elif self.stacking == "first":
                    red = outs[0]
                elif self.stacking == "softmax":
                    red = jnp.sum(jax.nn.softmax(outs, axis=0) * outs, axis=0)
                else:
                    raise ValueError(self.stacking)
                cls_tokens.append(red[:, :1])
                feats.append(red[:, 1 + reg :].reshape(b, gh, gw, c))
            else:
                out = x
                if final_norm is not None:
                    out = final_norm(out).astype(self.dtype)
                cls_tokens.append(out[:, :1])
                feats.append(out[:, 1 + reg :].reshape(b, gh, gw, c))
        if self.stacking == "max_cls":
            cls_tokens = all_cls[-len(cfg.output_idx) :]
        return feats, cls_tokens

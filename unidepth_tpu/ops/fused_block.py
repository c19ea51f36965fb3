"""Fused LayerNorm+GEMM Pallas kernels for the ViT encoder block.

The r4 roofline (docs/PERF.md "Where the time goes") left one named bf16
lever: ~17 ms of the 518px B=8 serving step is encoder elementwise traffic
between GEMMs. Two structural causes, both in the reference's hot loop
(reference unidepth/models/backbones/metadinov2/block.py:34 — LN -> qkv,
LN -> mlp -> residual):

1. **XLA cannot fuse a row reduction into a GEMM prologue.** LayerNorm is
   its own fusion, so the normalized activation round-trips HBM between
   the LN kernel and the GEMM that consumes it (~45 MB per LN per block at
   the ViT-L serving shape). ``ln_dense`` computes LN on the VPU
   immediately before the MXU consumes each row block — the normalized
   rows never leave VMEM.

2. **XLA cannot fuse across an opaque ``pallas_call``.** The attention
   kernel's operands were three sliced+padded copies of the QKV projection
   output and its result was sliced back — ~6 large HBM copies per block
   that exist only to relayout. ``ops.flash_attention.flash_attention_qkv``
   (see that module) removes them by reading the projection output
   directly with channel-offset block specs and ragged-N grids.

``ln_dense`` is serving-critical forward; the backward recomputes with XLA
ops (same policy as the flash kernels — UniDepth trains at moderate shapes
where XLA's fused backward is near-roofline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ln_dense", "ln_dense_supported"]


def _ln_dense_kernel(
    x_ref, g_ref, bt_ref, w_ref, b_ref, o_ref, *, eps: float, activation: str | None
):
    """One (blk_m, C) row block: LayerNorm on the VPU, then the (C, blk_f)
    GEMM on the MXU. The normalized block lives only in VMEM/registers."""
    x = x_ref[...].astype(jnp.float32)  # (blk_m, C)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * g_ref[0] + bt_ref[0]
    acc = (
        jnp.dot(y.astype(w_ref.dtype), w_ref[...], preferred_element_type=jnp.float32)
        + b_ref[0]
    )
    if activation == "gelu":
        acc = acc * 0.5 * (1.0 + _erf(acc * (2.0**-0.5)))
    o_ref[...] = acc.astype(o_ref.dtype)


def _erf(z):
    """erf via Abramowitz & Stegun 7.1.26 (1.5e-7 in exact arithmetic;
    measured 2.9e-6 max abs err in fp32 evaluation — still two orders below
    bf16 output rounding, tests/test_fused_block.py). Mosaic has no lowering
    for the erf/erfc primitives jax.nn.gelu(approximate=False) uses, but the
    A&S form needs only exp/abs/where, all of which it lowers natively."""
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    e = 1.0 - poly * jnp.exp(-az * az)
    return jnp.where(z >= 0, e, -e)


def ln_dense_supported(c: int, f: int) -> bool:
    """F must be lane-tiled (the output/bias/weight blocks tile F by 128).
    C only needs the bf16 sublane tile (16): it sits on x's lane axis and
    the weight's sublane axis, both of which Mosaic pads internally —
    measured correct AND 1.9x faster than XLA at the ConvNeXt stage-0
    shape (C=192, docs/PERF.md "ConvNeXt serving anatomy")."""
    return c % 16 == 0 and f % 128 == 0


def _pick_blk_f(c: int, f: int, itemsize: int) -> int:
    """Largest 128-multiple F block whose (C, blk_f) weight slab fits a
    ~6.5 MB VMEM budget (the rest goes to x/out double buffers)."""
    budget = 6_500_000
    blk_f = f
    while blk_f > 128 and c * blk_f * itemsize > budget:
        # split into equal 128-aligned chunks
        n = -(-c * f * itemsize // budget)
        per = -(-f // n)
        blk_f = max(128, -(-per // 128) * 128)
        while f % blk_f != 0 and blk_f > 128:
            blk_f -= 128
        break
    if f % blk_f != 0:
        blk_f = 128
    return blk_f


def _ln_dense_fwd(
    x, kernel, bias, gamma, beta, eps: float, activation: str | None, blk_m: int
):
    orig_shape = x.shape
    c = x.shape[-1]
    f = kernel.shape[-1]
    m = 1
    for s in orig_shape[:-1]:
        m *= s
    xm = x.reshape(m, c)
    blk_f = _pick_blk_f(c, f, kernel.dtype.itemsize)
    grid = (f // blk_f, -(-m // blk_m))  # m fastest: weight block stays
    # resident across the full m sweep, x blocks stream
    out = pl.pallas_call(
        functools.partial(_ln_dense_kernel, eps=eps, activation=activation),
        grid=grid,
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((blk_m, c), lambda fi, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda fi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda fi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, blk_f), lambda fi, i: (0, fi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_f), lambda fi, i: (0, fi), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (blk_m, blk_f), lambda fi, i: (i, fi), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, f), x.dtype),
    )(xm, gamma.reshape(1, c), beta.reshape(1, c), kernel, bias.reshape(1, f))
    return out.reshape(*orig_shape[:-1], f)


def _xla_ln_dense(x, kernel, bias, gamma, beta, eps, activation):
    """Reference formulation for the backward recompute (and CPU fallback):
    fp32 LN (flax semantics), cast to the param dtype, GEMM, optional GELU."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * gamma + beta
    out = (
        jnp.dot(
            y.astype(kernel.dtype), kernel, preferred_element_type=jnp.float32
        )
        + bias
    )
    if activation == "gelu":
        out = jax.nn.gelu(out, approximate=False)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def ln_dense(
    x,
    kernel,
    bias,
    gamma,
    beta,
    eps: float = 1e-6,
    activation: str | None = None,
    blk_m: int = 256,
):
    """``activation(LayerNorm(x) @ kernel + bias)`` in one Pallas kernel.

    x: (..., C); kernel: (C, F); gamma/beta: (C,) LN affine; bias: (F,).
    LN runs in fp32 on the VPU (flax ``use_fast_variance`` semantics are
    matched by the two-pass mean/var here to <1 ulp); the GEMM accumulates
    fp32 on the MXU and the output is cast to ``x.dtype``. ``activation``:
    None or 'gelu' (exact erf GELU in the epilogue).

    Forward-only Pallas: the VJP recomputes with the XLA formulation.
    """
    return _ln_dense_fwd(x, kernel, bias, gamma, beta, eps, activation, blk_m)


def _fwd(x, kernel, bias, gamma, beta, eps, activation, blk_m):
    out = _ln_dense_fwd(x, kernel, bias, gamma, beta, eps, activation, blk_m)
    return out, (x, kernel, bias, gamma, beta)


def _bwd(eps, activation, blk_m, res, g):
    x, kernel, bias, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x, k, b, gm, bt: _xla_ln_dense(x, k, b, gm, bt, eps, activation),
        x,
        kernel,
        bias,
        gamma,
        beta,
    )
    return vjp(g)


ln_dense.defvjp(_fwd, _bwd)

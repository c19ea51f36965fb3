"""Pallas conv kernels for low-output-channel 3x3 convolutions on TPU.

The V2 depth/confidence heads run 3x3 convs with 32-64 output channels at
full image resolution (reference unidepth/models/unidepthv2/decoder.py:
199-226 ``to_depth_lr/hr`` chains). XLA's conv lowering puts the output
channels on the 128-lane MXU axis, so Cout=32 fills a quarter of the MXU
(~10 TFLOP/s measured at 518px on v5e, docs/PERF.md). This kernel
restructures the conv as ONE tap-stacked GEMM per row-strip:

    out9[(dy,dx,co), w] = W9[(dy,dx,co), ci] @ x[ci, w]     (per image row)
    out[co, i, w]       = sum_{dy,dx} out9[(dy,dx,co), i+dy, w+dx]

so the GEMM shape is (9*Cout, Cin) x (Cin, W-lanes): the output minor dim
is the image row (128-lane full), M=9*Cout fills the streaming dim, and
the tap reduction becomes cheap VPU shifted adds on (Cout, W) tiles.
Input rows are manually DMA'd HBM->VMEM with double buffering so the
next strip's copy overlaps the current strip's GEMMs.

Measured ~2.5x over XLA's conv at (518^2, 64->32, bf16) on v5e.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_lowchannel"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(x_hbm, w_ref, o_ref, xb, o9, sem, *, rows: int, cin: int, cout: int,
            wp: int, wv: int, n_row_blocks: int):
    b = pl.program_id(0)
    r = pl.program_id(1)

    def start_copy(slot, row_block):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(row_block * rows, rows + 2)],
            xb.at[slot],
            sem.at[slot],
        )

    # double buffer: warm-up copy for the first strip of this image
    @pl.when(r == 0)
    def _():
        start_copy(0, 0).start()

    slot = jax.lax.rem(r, 2)
    nxt = jax.lax.rem(r + 1, 2)

    @pl.when(r + 1 < n_row_blocks)
    def _():
        start_copy(nxt, r + 1).start()

    start_copy(slot, r).wait()

    # tap-stacked GEMMs, one per input row of the strip (static unroll).
    # o9 has one extra lane tile so the dx-shifted reads below never go
    # out of bounds; those lanes are never written and feed only output
    # lanes >= wp-2, which are sliced away on the host.
    for j in range(rows + 2):
        o9[j, :, :wp] = jax.lax.dot_general(
            w_ref[:],
            xb[slot, j],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # shifted tap reduction: out[co, w] of row i sums taps (dy, dx) from
    # o9[i+dy, (3*dy+dx)*cout : ..., w+dx]
    for i in range(rows):
        acc = jnp.zeros((cout, wv), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                t = 3 * dy + dx
                acc = acc + o9[i + dy, t * cout : (t + 1) * cout, dx : dx + wv]
        o_ref[0, i] = acc.astype(o_ref.dtype)


def _conv3x3_fwd(x, w, bias, *, padding_mode: str, rows: int):
    """x: (B, H, W, Cin); w: (3, 3, Cin, Cout); returns (B, H, W, Cout)."""
    b, h, wdt, cin = x.shape
    cout = w.shape[-1]
    dtype = x.dtype

    mode = {"zeros": "constant", "reflect": "reflect", "replicate": "edge"}[
        padding_mode
    ]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)

    # (B, H+2, Cin, Wp): rows major, channels on sublanes, W on lanes
    xt = jnp.transpose(xp, (0, 1, 3, 2))
    wp = _cdiv(wdt + 2, 128) * 128
    # shrink the strip until the fp32 tap buffer + double-buffered input
    # rows fit comfortably in VMEM (~12 MB budget of the 16 MB core)
    itemsize = np.dtype(dtype).itemsize
    while rows > 1 and (
        (rows + 2) * 9 * cout * wp * 4 + 2 * (rows + 2) * cin * wp * itemsize
    ) > 12 * 1024 * 1024:
        rows //= 2
    n_row_blocks = _cdiv(h, rows)
    hp = n_row_blocks * rows + 2
    xt = jnp.pad(xt, ((0, 0), (0, hp - (h + 2)), (0, 0), (0, wp - (wdt + 2))))

    # W9[(3*dy+dx)*Cout + co, ci] = w[dy, dx, ci, co]
    w9 = jnp.transpose(w, (0, 1, 3, 2)).reshape(9 * cout, cin).astype(dtype)

    wv = _cdiv(wdt, 128) * 128  # valid output lanes, padded

    kern = functools.partial(
        _kernel,
        rows=rows,
        cin=cin,
        cout=cout,
        wp=wp,
        wv=wv,
        n_row_blocks=n_row_blocks,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, n_row_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * cout, cin), lambda bb, rr: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, cout, wv), lambda bb, rr: (bb, rr, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_row_blocks * rows, cout, wv), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2, cin, wp), dtype),
            pltpu.VMEM((rows + 2, 9 * cout, wp + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * wdt * 9 * cin * cout,
            bytes_accessed=xt.size * xt.dtype.itemsize
            + b * h * wdt * cout * np.dtype(dtype).itemsize,
            transcendentals=0,
        ),
    )(xt, w9)

    out = out[:, :h, :, :wdt]  # (B, H, Cout, W)
    out = jnp.transpose(out, (0, 1, 3, 2))  # NHWC
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


def _xla_conv3x3(x, w, bias, padding_mode: str):
    mode = {"zeros": "constant", "reflect": "reflect", "replicate": "edge"}[
        padding_mode
    ]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
    out = jax.lax.conv_general_dilated(
        xp,
        w.astype(x.dtype),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_lowchannel(x, w, bias, padding_mode: str = "zeros", rows: int = 8):
    """3x3 stride-1 'same' conv tuned for small Cout (TPU serving path).

    Forward runs the tap-stacked Pallas GEMM kernel; backward falls back
    to XLA's conv gradients (training shapes are small and XLA's fused
    backward is fine there)."""
    return _conv3x3_fwd(x, w, bias, padding_mode=padding_mode, rows=rows)


def _fwd(x, w, bias, padding_mode, rows):
    out = _conv3x3_fwd(x, w, bias, padding_mode=padding_mode, rows=rows)
    return out, (x, w, bias)


def _bwd(padding_mode, rows, res, g):
    x, w, bias = res
    _, vjp = jax.vjp(lambda x, w, b: _xla_conv3x3(x, w, b, padding_mode), x, w, bias)
    return vjp(g)


conv3x3_lowchannel.defvjp(_fwd, _bwd)

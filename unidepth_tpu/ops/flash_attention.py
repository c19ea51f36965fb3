"""Blockwise (flash) attention Pallas kernel for TPU.

Covers the reference's xformers memory-efficient attention
(metadinov2/attention.py:65-82) and SDPA blocks: online-softmax over key
blocks with fp32 running statistics, bf16 MXU matmuls, no N^2
materialization. Forward runs as a Pallas kernel; the backward pass
recomputes attention with XLA ops (UniDepth trains at moderate sequence
lengths where XLA's fused backward is already near-roofline, so the
custom kernel is reserved for the serving-critical forward).

Layout: q, k, v are (BH, N, D) — batch*heads flattened into the grid's
first axis; D <= 128 (ViT head dims are 64).
"""

from __future__ import annotations

import contextlib
import functools
import threading

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "flash_attention",
    "flash_attention_qkv",
    "sharded_flash_attention",
    "safe_attention",
]

_NEG_INF = -1e30

# Trace-time default for ``safe_softmax`` at the public entry points.
# The serving default (False) is the guarded max-free softmax, which relies
# on trained prescaled ViT logits staying far below the min(s, 80) clamp; a
# training run has no such bound (a diverging row would silently saturate
# instead of NaN-ing, and an all-very-negative row underflows to 0 output).
# The train step wraps its forward in ``safe_attention()`` so every
# attention call it traces — encoder blocks and decoder cross-attention
# alike, with no per-module plumbing — takes the row-max kernels, which are
# exact for any logits. jit executes the Python body at trace time, so the
# flag is baked into the traced program. Thread-local: a concurrent trace
# on another thread must not observe this thread's flag.
_SAFE_ATTENTION = threading.local()


@contextlib.contextmanager
def safe_attention():
    """While active, attention calls that don't pin ``safe_softmax`` use the
    safe row-max softmax kernels instead of the serving-default guarded
    max-free variant. Wrap any forward whose logits are not known-bounded
    (training, fine-tuning) — see ``training/step.py``.

    The flag is resolved at TRACE time: enter this context inside the
    function being jitted (as training/step.py and utils/validation.py do),
    never around an already-jitted callable — a jit cache hit would replay
    whichever kernels the first trace baked in."""
    _SAFE_ATTENTION.depth = getattr(_SAFE_ATTENTION, "depth", 0) + 1
    try:
        yield
    finally:
        _SAFE_ATTENTION.depth -= 1


def _resolve_safe(safe_softmax: bool | None) -> bool:
    if safe_softmax is None:
        return bool(getattr(_SAFE_ATTENTION, "depth", 0))
    return safe_softmax


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *, blk_k: int, n_real: int, safe_softmax: bool = True
):
    """q arrives PRE-SCALED (q * softmax_scale is folded into the epilogue
    of the producing GEMM outside the kernel) — the in-kernel fp32
    score-matrix multiply it replaces cost ~14% of kernel wall time
    (docs/PERF.md r3 kernel work)."""
    q = q_ref[0]  # (blk_q, d)
    n_pad = k_ref.shape[1]
    blk_q, d = q.shape
    num_kb = n_pad // blk_k

    if num_kb == 1:
        # whole-K single pass: plain softmax, no running-stat corrections
        s = jax.lax.dot_general(
            q,
            k_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (blk_q, n_pad), 1)
        if not safe_softmax:
            # guarded max-free softmax (see _packed_kernel_tr: the row-max
            # reduce is the one VPU pass that does not hide under the MXU;
            # the clamp makes fp32 exp overflow impossible)
            s = jnp.where(col < n_real, jnp.minimum(s, 80.0), _NEG_INF)
            p = jnp.exp(s)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(v_ref.dtype),
                v_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
            return
        s = jnp.where(col < n_real, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        # plain PV: (blk_q, n_pad) @ (n_pad, d). Measured on v5e at the
        # serving shape this ties the r2 transposed-PV trick while
        # skipping both transposes (docs/PERF.md r3 kernel work).
        acc = jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return

    def body(i, carry):
        acc, m_i, l_i = carry
        k_blk = k_ref[0, pl.ds(i * blk_k, blk_k), :]
        v_blk = v_ref[0, pl.ds(i * blk_k, blk_k), :]
        s = jax.lax.dot_general(
            q,
            k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # mask padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1) + i * blk_k
        s = jnp.where(col < n_real, s, _NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype),
            v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((blk_q, d), jnp.float32)
    m0 = jnp.full((blk_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


def _flash_fwd(
    q, k, v, *, blk_q: int, blk_k: int, scale: float, safe_softmax: bool = False
):
    bh, nq, d = q.shape
    nk = k.shape[1]
    # fold the softmax scale into q before the kernel: XLA fuses the scalar
    # multiply into the producing GEMM's epilogue (free), and for the ViT
    # head dims (d = power of 4 -> scale a power of 2) the bf16 product is
    # exact, so kernel numerics are unchanged
    q = (q * jnp.asarray(scale, jnp.float32)).astype(q.dtype)
    n_pad_q = -(-nq // blk_q) * blk_q
    n_pad_k = -(-nk // blk_k) * blk_k
    qp = jnp.pad(q, ((0, 0), (0, n_pad_q - nq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad_k - nk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad_k - nk), (0, 0)))

    grid = (bh, n_pad_q // blk_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, blk_k=blk_k, n_real=nk, safe_softmax=safe_softmax
        ),
        grid=grid,
        # CPU (tests / virtual meshes): run the kernel in interpret mode so
        # sharded-flash parity is testable without TPU hardware
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad_k, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad_k, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blk_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad_q, d), q.dtype),
    )(qp, kp, vp)
    return out[:, :nq]


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits * scale, axis=-1)
    return jnp.einsum(
        "bnm,bmd->bnd", w.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


def _pick_blocks(nq: int, nk: int, blk_q: int | None, blk_k: int | None):
    """Measured on v5e (d=64): large q blocks and whole-K blocks win for
    UniDepth's 1.4-3k token range (single-pass online softmax). In the
    whole-K regime the q blocks are balanced like the packed kernel's
    (fewest blocks within the VMEM score-slab budget, sized to
    ceil(nq/blocks)): at N=1369 that is two 688-row blocks instead of
    three of 512 — 10% less padded work (docs/PERF.md r3 kernel work)."""
    if blk_k is None:
        n_pad = -(-nk // 512) * 512
        blk_k = n_pad if n_pad <= 4096 else 1024
    if blk_q is None:
        if blk_k >= nk:  # whole-K single pass
            blk_q = _pick_blk_q_packed(nq, -(-nk // 128) * 128)
        else:
            blk_q = 512
    return blk_q, blk_k


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q,
    k,
    v,
    blk_q: int | None = None,
    blk_k: int | None = None,
    scale: float | None = None,
    safe_softmax: bool | None = None,
):
    """q, k, v: (BH, N, D) -> (BH, N, D). fp32 softmax, bf16-friendly.
    ``safe_softmax=None`` resolves to the ambient ``safe_attention()``
    flag (False outside it: serving-default guarded max-free softmax)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    blk_q, blk_k = _pick_blocks(q.shape[1], k.shape[1], blk_q, blk_k)
    return _flash_fwd(
        q, k, v, blk_q=blk_q, blk_k=blk_k, scale=scale,
        safe_softmax=_resolve_safe(safe_softmax),
    )


def _packed_kernel_tr(
    q_ref, k_ref, v_ref, o_ref, *, n_real: int, d: int, mask_v: bool = False
):
    """r4 serving kernel: transposed orientation + guarded max-free softmax.

    Two r4 A/B findings (scripts/kernel_ab.py, docs/PERF.md "r4 kernel
    work") shape this variant:

    1. **Max-free softmax with a clamp guard.** The per-query row-max
       reduce was the ONE VPU pass Mosaic could not hide under the MXU
       (exp/sum/mask all overlap: removing exp measured 0%). Raw
       ``exp(s)`` is fp32-safe for any score <= 88; prescaled trained-ViT
       logits sit well below the ``min(s, 80)`` clamp, which makes
       overflow impossible (a pathological row with logits > 80 saturates
       — it never NaNs). Measured -8.7% kernel time alone.

    2. **Transposed orientation.** ``sT = k @ qT`` emits a full-width
       (n_pad, blk_q) score slab (no output-lane padding on the MXU), and
       the transposed PV ``vT @ pT`` contracts over the full n_pad with a
       (d, blk_q) output — the only padded GEMM dim left is QK's
       inherent 64-deep contraction. Softmax reductions run over the
       SUBLANE axis. Another -3% on top of (1).

    Total: 1.03 -> 0.91 ms at the serving shape (B=8 H=16 N=1370 D=64),
    68 TFLOP/s. Callers that cannot bound their logits use
    ``safe_softmax=True`` -> the row-max kernel below."""
    n_pad = k_ref.shape[1]
    blk_c = q_ref.shape[2]
    blk_q = q_ref.shape[1]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (n_pad, blk_q), 0)
    for off in range(0, blk_c, d):
        q = q_ref[0, :, off : off + d]
        sT = jax.lax.dot_general(
            k_ref[0, :, off : off + d],
            q,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_pad, blk_q)
        sT = jnp.where(rowi < n_real, jnp.minimum(sT, 80.0), _NEG_INF)
        pT32 = jnp.exp(sT)
        l = jnp.sum(pT32, axis=0, keepdims=True)  # (1, blk_q)
        pT = pT32.astype(v_ref.dtype)
        v = v_ref[0, :, off : off + d]
        if mask_v:
            # ragged-N inputs: rows past n_real hold Mosaic edge garbage;
            # p's tail is exactly 0 but 0 * NaN = NaN in the PV contraction
            vmaskr = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
            v = jnp.where(vmaskr < n_real, v, jnp.zeros_like(v))
        vT = v.T  # (d, n_pad)
        accT = jax.lax.dot_general(
            vT,
            pT,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, blk_q)
        outT = accT / jnp.maximum(l, 1e-30)
        o_ref[0, :, off : off + d] = outT.T.astype(o_ref.dtype)


def _packed_kernel(
    q_ref, k_ref, v_ref, o_ref, *, n_real: int, d: int, mask_v: bool = False
):
    """Single-pass attention over a 128-lane block holding ``128 // d``
    head slabs side by side (Mosaic requires lane-dim blocks of 128): each
    head's (blk_q, d) slice is processed independently with static lane
    slices — the contraction never crosses the head boundary. q arrives
    PRE-SCALED (see _flash_kernel). This is the ``safe_softmax=True``
    variant (full per-query row max); the serving default is
    ``_packed_kernel_tr`` above."""
    n_pad = k_ref.shape[1]
    blk_c = q_ref.shape[2]
    blk_q = q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (blk_q, n_pad), 1)
    for off in range(0, blk_c, d):
        q = q_ref[0, :, off : off + d]
        s = jax.lax.dot_general(
            q,
            k_ref[0, :, off : off + d],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(col < n_real, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, :, off : off + d]
        if mask_v:
            # see _packed_kernel_tr: zero ragged-edge garbage before PV
            vmaskr = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
            v = jnp.where(vmaskr < n_real, v, jnp.zeros_like(v))
        # plain PV, no transposes (see _flash_kernel)
        acc = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, off : off + d] = (acc / jnp.maximum(l, 1e-30)).astype(
            o_ref.dtype
        )


def _flash_fwd_packed(
    q, k, v, *, blk_q: int, scale: float, num_heads: int, safe_softmax: bool = False
):
    """Head-packed layout: q, k, v are (B, N, H*D) — the raw slices of a
    fused QKV projection output. The grid walks 128-lane head groups and
    the block specs read each group's (N, 128) slab straight out of the
    packed array, so NO transpose/copy is needed on either side of the
    kernel: the output lands back in (B, N, H*D), exactly what the
    out-projection GEMM consumes. Removes ~4 large layout copies per ViT
    block vs the flattened (B*H, N, D) path."""
    b, nq, c = q.shape
    d = c // num_heads
    blk_c = 128 if d <= 128 else d
    nk = k.shape[1]
    # prescale q (see _flash_fwd: fused into the producing GEMM by XLA,
    # exact in bf16 for power-of-two scales)
    q = (q * jnp.asarray(scale, jnp.float32)).astype(q.dtype)
    n_pad_q = -(-nq // blk_q) * blk_q
    # whole-K single pass (the UniDepth serving regime; _pick_blocks
    # already selects whole-K for every shipped shape)
    n_pad_k = -(-nk // 128) * 128
    qp = jnp.pad(q, ((0, 0), (0, n_pad_q - nq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad_k - nk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad_k - nk), (0, 0)))

    grid = (b, c // blk_c, n_pad_q // blk_q)
    kernel = _packed_kernel if safe_softmax else _packed_kernel_tr
    out = pl.pallas_call(
        functools.partial(kernel, n_real=nk, d=d),
        grid=grid,
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            pl.BlockSpec((1, blk_q, blk_c), lambda b, g, i: (b, i, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad_k, blk_c), lambda b, g, i: (b, 0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad_k, blk_c), lambda b, g, i: (b, 0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blk_q, blk_c), lambda b, g, i: (b, i, g), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_pad_q, c), q.dtype),
    )(qp, kp, vp)
    return out[:, :nq]


def _xla_attention_packed(q, k, v, scale, num_heads):
    b, n, c = q.shape
    d = c // num_heads
    qh = q.reshape(b, n, num_heads, d)
    kh = k.reshape(b, k.shape[1], num_heads, d)
    vh = v.reshape(b, v.shape[1], num_heads, d)
    logits = jnp.einsum("bnhd,bmhd->bhnm", qh, kh, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", w.astype(vh.dtype), vh, preferred_element_type=jnp.float32
    )
    return out.reshape(b, n, c).astype(v.dtype)


def _pick_blk_q_packed(nq: int, n_pad_k: int) -> int:
    """Balanced q blocks: split nq into the fewest blocks whose fp32 score
    slab (+ bf16 p copy, ~6 B/elem) stays inside a ~10 MB VMEM working
    budget, then size the block to ceil(nq/blocks) rounded up to the
    16-sublane granule (the bf16 Mosaic tile; also divisible by fp32's 8).
    At the ViT-L serving shape (N=1370) this yields two blocks of 688
    instead of three of 512 — measured 4% faster (12% less padded work,
    fewer grid steps)."""
    budget_rows = max(128, (10_000_000 // (6 * n_pad_k)) // 16 * 16)
    max_blk = min(704, budget_rows)
    nb = -(-nq // max_blk)
    per = -(-nq // nb)
    return -(-per // 16) * 16


def _packed_supported(nk: int, c: int, num_heads: int) -> bool:
    """The packed kernel is whole-K single-pass with 128-lane head groups:
    head dim must tile 128 lanes and the fp32 score block (blk_q x N) must
    fit VMEM (same 4096-token bound as _pick_blocks' whole-K regime)."""
    d = c // num_heads
    if d > 128 or (d < 128 and (128 % d != 0 or c % 128 != 0)):
        return False
    return -(-nk // 128) * 128 <= 4096


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_packed(
    q, k, v, num_heads: int, scale: float | None = None,
    safe_softmax: bool | None = None,
):
    """Flash attention on the head-packed (B, N, H*D) layout (see
    ``_flash_fwd_packed``). The serving-critical forward runs as the Pallas
    kernel; the backward recomputes with XLA ops (same policy as
    ``flash_attention``). Shapes outside the packed kernel's regime route
    through the generic (B*H, N, D) kernel (head split/merge transposes
    reappear, correctness unchanged). ``safe_softmax=None`` resolves to the
    ambient ``safe_attention()`` flag (False outside it)."""
    b, n, c = q.shape
    d = c // num_heads
    if scale is None:
        scale = d**-0.5
    safe_softmax = _resolve_safe(safe_softmax)
    if not _packed_supported(k.shape[1], c, num_heads):
        def heads(x):
            return x.reshape(b, x.shape[1], num_heads, d).transpose(0, 2, 1, 3).reshape(
                b * num_heads, x.shape[1], d
            )

        out = flash_attention(
            heads(q), heads(k), heads(v), None, None, scale, safe_softmax
        )
        return out.reshape(b, num_heads, n, d).transpose(0, 2, 1, 3).reshape(b, n, c)
    blk_q = _pick_blk_q_packed(n, -(-k.shape[1] // 128) * 128)
    return _flash_fwd_packed(
        q, k, v, blk_q=blk_q, scale=scale, num_heads=num_heads,
        safe_softmax=safe_softmax,
    )


def _xla_attention_qkv(qkv, num_heads):
    c = qkv.shape[-1] // 3
    return _xla_attention_packed(
        qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :], 1.0, num_heads
    )


def _flash_fwd_qkv(qkv, *, num_heads: int, safe_softmax: bool):
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    g = c // 128
    n_pad_k = -(-n // 128) * 128
    blk_q = _pick_blk_q_packed(n, n_pad_k)
    grid = (b, g, -(-n // blk_q))
    kernel = _packed_kernel if safe_softmax else _packed_kernel_tr
    out = pl.pallas_call(
        functools.partial(kernel, n_real=n, d=d, mask_v=n != n_pad_k),
        grid=grid,
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            # three channel-offset views of the SAME (B, N, 3C) buffer:
            # q lanes at group gi, k at gi + G, v at gi + 2G. No slicing,
            # padding, or relayout copies exist anywhere around the kernel —
            # blocks ragged in N are handled by Mosaic's edge padding plus
            # the kernel's own n_real column mask / dropped tail writes.
            pl.BlockSpec(
                (1, blk_q, 128), lambda b, gi, i: (b, i, gi), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_pad_k, 128),
                lambda b, gi, i, G=g: (b, 0, gi + G),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_pad_k, 128),
                lambda b, gi, i, G=g: (b, 0, gi + 2 * G),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, blk_q, 128), lambda b, gi, i: (b, i, gi), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
    )(qkv, qkv, qkv)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def flash_attention_qkv(qkv, num_heads: int, safe_softmax: bool | None = None):
    """Head-packed flash attention reading the raw (B, N, 3C) fused QKV
    projection output DIRECTLY — no q/k/v slice, pad, or output-slice
    copies around the opaque ``pallas_call`` (each was a full HBM round
    trip XLA could not fuse away; ~0.2 ms/block at the ViT-L serving
    shape). The kernel's three input specs are channel-offset views of the
    same buffer, and the N axis runs ragged (Mosaic edge handling + the
    kernel's n_real mask) instead of being padded to the block multiple.

    CONTRACT: q arrives PRE-SCALED — fold the softmax scale into the
    projection's q columns (exact in bf16 for the power-of-two ViT scales;
    see ViTBlock's fused path). ``safe_softmax=None`` resolves to the
    ambient ``safe_attention()`` flag.
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    safe_softmax = _resolve_safe(safe_softmax)
    if not _packed_supported(n, c, num_heads):
        return flash_attention_packed(
            qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :],
            num_heads, 1.0, safe_softmax,
        )
    return _flash_fwd_qkv(qkv, num_heads=num_heads, safe_softmax=safe_softmax)


def _fwd_qkv(qkv, num_heads, safe_softmax):
    return flash_attention_qkv(qkv, num_heads, safe_softmax), (qkv,)


def _bwd_qkv(num_heads, safe_softmax, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(lambda t: _xla_attention_qkv(t, num_heads), qkv)
    return vjp(g)


flash_attention_qkv.defvjp(_fwd_qkv, _bwd_qkv)


def _fwd_packed(q, k, v, num_heads, scale, safe_softmax):
    return flash_attention_packed(q, k, v, num_heads, scale, safe_softmax), (q, k, v)


def _bwd_packed(num_heads, scale, safe_softmax, res, g):
    q, k, v = res
    d = q.shape[-1] // num_heads
    if scale is None:
        scale = d**-0.5
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_attention_packed(q, k, v, scale, num_heads), q, k, v
    )
    return vjp(g)


flash_attention_packed.defvjp(_fwd_packed, _bwd_packed)


def sharded_flash_attention_packed(q, k, v, num_heads: int):
    """Mesh-aware ``flash_attention_packed``: under an ambient mesh the
    kernel runs in a shard_map — batch over (data, fsdp), the packed
    channel dim over tp. Heads are channel-major in the packed layout, so
    a tp-contiguous channel chunk is exactly a head subset and each shard
    runs the kernel on its local heads."""
    from unidepth_tpu.parallel.mesh import ambient_mesh

    b, n, c = q.shape

    mesh = ambient_mesh()
    if mesh is None:
        return flash_attention_packed(q, k, v, num_heads)
    batch_axes = tuple(a for a in ("data", "fsdp") if mesh.shape.get(a, 1) > 1)
    tp = mesh.shape.get("tp", 1)
    b_div = int(np.prod([mesh.shape[a] for a in batch_axes])) if batch_axes else 1
    if (not batch_axes and tp == 1) or b % b_div != 0 or num_heads % tp != 0:
        return flash_attention_packed(q, k, v, num_heads)
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    spec = P(batch_axes if batch_axes else None, None, "tp" if tp > 1 else None)
    local_heads = num_heads // tp

    fn = shard_map(
        lambda q, k, v: flash_attention_packed(q, k, v, local_heads),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def sharded_flash_attention(q, k, v, scale: float | None = None):
    """Flash attention over ``(B, H, N, D)`` that survives tensor/data
    parallelism: with an ambient mesh (parallel.mesh.use_sharding) the
    kernel runs under ``shard_map`` — batch split over (data, fsdp), heads
    over tp — so Megatron-sharded attention keeps the Pallas kernel instead
    of falling back to XLA attention (heads are embarrassingly parallel:
    softmax is over N, which stays local). Without a mesh, or when the
    shapes don't divide the mesh axes, this is exactly ``flash_attention``
    on the flattened (B*H, N, D) layout.

    Covers the reference's memory-efficient attention under DDP
    (metadinov2/attention.py:65-82 + DDP wrap, reference train.py:131).
    """
    from unidepth_tpu.parallel.mesh import ambient_mesh

    b, h, n, d = q.shape

    def _flat(q, k, v):
        bb, hh = q.shape[0], q.shape[1]
        out = flash_attention(
            q.reshape(bb * hh, q.shape[2], d),
            k.reshape(bb * hh, k.shape[2], d),
            v.reshape(bb * hh, v.shape[2], d),
            None,
            None,
            scale,
        )
        return out.reshape(bb, hh, q.shape[2], d)

    mesh = ambient_mesh()
    if mesh is None:
        return _flat(q, k, v)
    batch_axes = tuple(
        a for a in ("data", "fsdp") if mesh.shape.get(a, 1) > 1
    )
    tp = mesh.shape.get("tp", 1)
    b_div = int(np.prod([mesh.shape[a] for a in batch_axes])) if batch_axes else 1
    if (not batch_axes and tp == 1) or b % b_div != 0 or h % tp != 0:
        return _flat(q, k, v)
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    spec = P(batch_axes if batch_axes else None, "tp" if tp > 1 else None)
    fn = shard_map(
        _flat,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def _fwd(q, k, v, blk_q, blk_k, scale, safe_softmax):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    blk_q, blk_k = _pick_blocks(q.shape[1], k.shape[1], blk_q, blk_k)
    out = _flash_fwd(
        q, k, v, blk_q=blk_q, blk_k=blk_k, scale=scale,
        safe_softmax=_resolve_safe(safe_softmax),
    )
    return out, (q, k, v)


def _bwd(blk_q, blk_k, scale, safe_softmax, res, g):
    q, k, v = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)

"""Nystrom attention vs an independent numpy oracle of the xformers
algorithm, and the V1 serving-default drift bound.

The reference V1 depth head runs xformers ``NystromAttention``
(num_landmarks=128, reference layers/nystrom_attention.py:44-46, pinned
xformers>=0.0.26). That exact source is not importable here (zero egress,
xformers not installed), so the oracle below is a from-scratch float64
numpy transcription of the published algorithm with the xformers defaults,
written against its documented behavior:

  * landmark pooling = segment means; non-divisible N splits into
    ``m - N%m`` segments of ``N//m`` tokens then ``N%m`` of ``N//m + 1``
    (every token in exactly one landmark);
  * kernel_1 = softmax(q k_l^T / sqrt(d)),  kernel_2 = softmax(q_l k_l^T
    / sqrt(d)),  kernel_3 = softmax(q_l k^T / sqrt(d)) @ v;
  * pinv(kernel_2) by 6 Newton-Schulz (Razavi) iterations, init
    ``K^T / max(colsum)`` (xformers ``pinverse_original_init=False``);
  * out = kernel_1 @ pinv(kernel_2) @ kernel_3; exact SDPA when N <= m.

The drift bound (nystrom vs exact at the REAL V1 token counts) is the
number PARITY.md cites for the V1 serving default.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from unidepth_tpu.nn.nystrom import nystrom_attention
from unidepth_tpu.ops.attention import sdpa

pytestmark = pytest.mark.mid


# ---------------------------------------------------------------------------
# numpy oracle (float64, fully independent of the jax implementation)
# ---------------------------------------------------------------------------
def _softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def _pool_oracle(x, m):
    b, h, n, d = x.shape
    seg, r = divmod(n, m)
    if r == 0:
        return x.reshape(b, h, m, seg, d).mean(axis=3)
    n_round = m - r
    split = n_round * seg
    head = x[:, :, :split].reshape(b, h, n_round, seg, d).mean(axis=3)
    tail = x[:, :, split:].reshape(b, h, r, seg + 1, d).mean(axis=3)
    return np.concatenate([head, tail], axis=2)


def _pinv_oracle(mat, iters=6):
    col = np.sum(mat, axis=-2).max(axis=-1)
    z = np.swapaxes(mat, -1, -2) / col[..., None, None]
    eye = np.eye(mat.shape[-1])
    for _ in range(iters):
        kz = mat @ z
        z = 0.25 * z @ (13.0 * eye - kz @ (15.0 * eye - kz @ (7.0 * eye - kz)))
    return z


def _nystrom_oracle(q, k, v, m=128):
    d = q.shape[-1]
    scale = d**-0.5
    n = q.shape[2]
    if n <= m:
        return _softmax((q @ np.swapaxes(k, -1, -2)) * scale) @ v
    q_l = _pool_oracle(q, m)
    k_l = _pool_oracle(k, m)
    k1 = _softmax((q @ np.swapaxes(k_l, -1, -2)) * scale)
    k2 = _softmax((q_l @ np.swapaxes(k_l, -1, -2)) * scale)
    k3 = _softmax((q_l @ np.swapaxes(k, -1, -2)) * scale) @ v
    return k1 @ (_pinv_oracle(k2) @ k3)


def _exact_oracle(q, k, v, chunk=2048):
    """Memory-light exact attention (row-chunked softmax)."""
    d = q.shape[-1]
    scale = d**-0.5
    out = np.empty_like(q)
    for s in range(0, q.shape[2], chunk):
        logits = q[:, :, s : s + chunk] @ np.swapaxes(k, -1, -2) * scale
        out[:, :, s : s + chunk] = _softmax(logits) @ v
    return out


def _qkv(n, b=1, h=4, d=64, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return tuple(
        rng.standard_normal((b, h, n, d)) * scale for _ in range(3)
    )


@pytest.mark.parametrize("n", [512, 1131, 4466])
def test_nystrom_matches_oracle(n):
    """1131 and 4466 are non-divisible by 128 — exercises the xformers
    AvgPool segment split (4466 is the real V1 1/8-scale token count at
    462x616)."""
    q, k, v = _qkv(n)
    ref = _nystrom_oracle(q, k, v, 128)
    out = nystrom_attention(
        jnp.asarray(q, jnp.float32),
        jnp.asarray(k, jnp.float32),
        jnp.asarray(v, jnp.float32),
        128,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_nystrom_exact_fallback_below_landmarks():
    q, k, v = _qkv(100)
    out = nystrom_attention(*(jnp.asarray(t, jnp.float32) for t in (q, k, v)), 128)
    ref = sdpa(*(jnp.asarray(t, jnp.float32) for t in (q, k, v)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_pinv_converges_on_softmax_kernel():
    """Newton-Schulz is an iterative approximation: at the xformers default
    of 6 iterations the residual on a realistically conditioned softmax
    kernel is O(1e-1) — that IS the reference numerics (not a bug); the
    iteration must be contracting and converge when extended."""
    rng = np.random.default_rng(1)
    ql, kl = rng.standard_normal((2, 1, 4, 128, 64))
    k2 = _softmax((ql @ np.swapaxes(kl, -1, -2)) * 64**-0.5)
    eye = np.eye(128)
    err6 = np.abs(_pinv_oracle(k2, 6) @ k2 - eye).max()
    err12 = np.abs(_pinv_oracle(k2, 12) @ k2 - eye).max()
    err24 = np.abs(_pinv_oracle(k2, 24) @ k2 - eye).max()
    assert err12 < err6 < 2.0, (err6, err12)
    assert err24 < 1e-9, err24


def test_nystrom_drift_absolute_at_real_token_counts():
    """Raw-kernel approximation error at the REAL V1 462x616 decoder token
    counts (1/8 scale -> 58x77 = 4466 tokens, 1/4 -> 116x154 = 17864, both
    non-divisible by 128). On unit-scale inputs the landmark approximation
    stays within ~0.15 absolute — but note that random-gaussian attention
    is diffuse (exact output is nearly the global mean of v), so the
    meaningful serving bound is the END-TO-END depth drift below."""
    n = 4466
    q, k, v = _qkv(n, h=2, seed=3)
    approx = np.asarray(
        nystrom_attention(*(jnp.asarray(t, jnp.float32) for t in (q, k, v)), 128),
        np.float64,
    )
    exact = _exact_oracle(q, k, v)
    assert np.abs(approx - exact).max() < 0.25
    assert np.abs(approx - exact).mean() < 0.02


@pytest.mark.slow
def test_v1_depth_drift_nystrom_vs_exact_at_full_resolution():
    """END-TO-END V1 depth drift of the 'nystrom' serving default vs
    'exact' at the REAL network resolution (462x616: NystromBlocks see
    4466 and 17864 tokens). Reduced channel widths keep exact attention's
    N^2 buffer CPU-feasible; the token counts — what the landmark
    approximation actually depends on — are the serving ones. The bound
    asserted here is the number PARITY.md cites."""
    import jax

    from unidepth_tpu.models.backbones.dinov2 import ViTConfig
    from unidepth_tpu.models.unidepthv1.model import UniDepthV1

    enc = ViTConfig(
        embed_dim=192, depth=4, num_heads=3, output_idx=(1, 2, 3, 4), use_norm=False
    )
    outs = {}
    for impl in ("nystrom", "exact"):
        model = UniDepthV1(
            encoder_cfg=enc,
            hidden_dim=64,
            num_heads=2,
            decoder_depths=(2, 1, 1),
            image_shape=(462, 616),
            attn_impl=impl,
            dtype=jnp.float32,
        )
        params = model.init_params(seed=0)  # same seed -> identical params
        img = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, 462, 616, 3)), jnp.float32
        )
        out = jax.jit(model.encode_decode)(params, img)
        outs[impl] = np.asarray(out["depth"], np.float64)
    rel = np.abs(outs["nystrom"] - outs["exact"]) / np.abs(outs["exact"])
    # serving-default bound cited in PARITY.md (measured: median 0.06%,
    # mean 0.16%, p95 0.63%, max 11% on isolated pixels)
    assert float(np.median(rel)) < 0.005, float(np.median(rel))
    assert float(rel.mean()) < 0.02, float(rel.mean())
    assert float(np.percentile(rel, 95)) < 0.05, float(np.percentile(rel, 95))

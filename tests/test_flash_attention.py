"""Flash attention kernel correctness (TPU-interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from unidepth_tpu.ops.attention import sdpa
from unidepth_tpu.ops.flash_attention import flash_attention


def _ref(q, k, v):
    return np.asarray(sdpa(q[:, None], k[:, None], v[:, None]))[:, 0]


@pytest.mark.parametrize("n", [64, 511, 700, 1370])
def test_flash_matches_sdpa(rng, n):
    bh, d = 3, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32) * 0.3)
        for _ in range(3)
    )
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), _ref(q, k, v), rtol=2e-5, atol=2e-5)


def test_flash_gradients_match_xla(rng):
    bh, n, d = 2, 300, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32) * 0.2)
        for _ in range(3)
    )

    def f_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return flash_attention(q, k, v).sum()

    def f_ref(q, k, v):
        return sdpa(q[:, None], k[:, None], v[:, None])[:, 0].sum()

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_flash_bf16_accumulation(rng):
    bh, n, d = 2, 520, 64
    qf = rng.standard_normal((bh, n, d)).astype(np.float32) * 0.3
    kf = rng.standard_normal((bh, n, d)).astype(np.float32) * 0.3
    vf = rng.standard_normal((bh, n, d)).astype(np.float32) * 0.3
    q, k, v = (jnp.asarray(x, jnp.bfloat16) for x in (qf, kf, vf))
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v)
    ref = _ref(jnp.asarray(qf), jnp.asarray(kf), jnp.asarray(vf))
    # bf16 inputs, fp32 softmax: expect ~1e-2 agreement
    assert np.abs(np.asarray(out, np.float32) - ref).max() < 0.05


def test_pick_blk_q_packed_balanced():
    """The packed kernel's q-block chooser: blocks are 8-sublane aligned,
    cover the sequence in the promised number of grid steps, and respect
    the ~10 MB VMEM score-slab budget (docs/PERF.md r3 kernel work)."""
    from unidepth_tpu.ops.flash_attention import _pick_blk_q_packed

    # ViT-L serving shape: two balanced 688-blocks, not three of 512
    assert _pick_blk_q_packed(1370, 1408) == 688
    for nq in (64, 257, 777, 1370, 2048, 3000):
        for n_pad_k in (128, 1408, 4096):
            blk = _pick_blk_q_packed(nq, n_pad_k)
            # 16-sublane aligned: the bf16 Mosaic tile granule
            assert blk % 16 == 0 and blk >= 16
            # the implied grid covers nq with no wholly-padded block
            nb = -(-nq // blk)
            assert nb * blk >= nq
            assert (nb - 1) * blk < nq
            # fp32 scores + bf16 p copy stay within the working budget
            # (floor of 128 rows overrides the budget at huge n_pad_k)
            assert blk <= max(128, 10_000_000 // (6 * n_pad_k) // 16 * 16 + 15)

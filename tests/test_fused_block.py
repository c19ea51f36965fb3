"""r5 fused encoder-block kernels (ops/fused_block.py + flash_attention_qkv).

The fused serving path changes HOW the ViT block computes (LN2+fc1+GELU in
one Pallas kernel, attention reading the raw QKV projection buffer with the
softmax scale folded into q's weight columns) but must not change WHAT it
computes: every test here pins the fused path against the plain flax/XLA
formulation the unfused block uses. Reference hot loop being replaced:
/root/reference/unidepth/models/backbones/metadinov2/block.py:34-110.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unidepth_tpu.ops.flash_attention import (
    _xla_attention_qkv,
    flash_attention_qkv,
    safe_attention,
)
from unidepth_tpu.ops.fused_block import _erf, _xla_ln_dense, ln_dense

pytestmark = pytest.mark.smoke


def test_erf_polynomial_accuracy():
    """A&S 7.1.26 in fp32 vs the exact erf — max abs err must sit well
    under bf16 output rounding (the kernel's stated budget; measured
    2.9e-6, see the _erf docstring)."""
    z = jnp.linspace(-6.0, 6.0, 20001)
    err = np.abs(np.asarray(_erf(z)) - np.asarray(jax.lax.erf(z)))
    assert err.max() < 5e-6


@pytest.mark.parametrize("activation", [None, "gelu"])
@pytest.mark.parametrize("m", [256, 300])  # exact and ragged blk_m
def test_ln_dense_matches_xla(rng, activation, m):
    c, f = 128, 384
    x = jnp.asarray(rng.standard_normal((2, m // 2, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, f)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal((c,)), jnp.float32)
    bt = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    out = ln_dense(x, w, b, g, bt, 1e-6, activation)
    ref = _xla_ln_dense(x, w, b, g, bt, 1e-6, activation)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_ln_dense_bf16_io(rng):
    """bf16 activations/weights, fp32 LN + accumulation inside (the serving
    configuration)."""
    c, f = 128, 512
    x = jnp.asarray(rng.standard_normal((1, 70, c)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((c, f)) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal((c,)), jnp.float32)
    bt = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    out = ln_dense(x, w, b, g, bt, 1e-6, "gelu")
    assert out.dtype == jnp.bfloat16
    ref = _xla_ln_dense(x, w, b, g, bt, 1e-6, "gelu")
    assert np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max() < 0.05


def test_ln_dense_grads_match_xla(rng):
    c, f = 128, 256
    x = jnp.asarray(rng.standard_normal((1, 40, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, f)) * 0.05, jnp.float32)
    b = jnp.zeros((f,), jnp.float32)
    g = jnp.ones((c,), jnp.float32)
    bt = jnp.zeros((c,), jnp.float32)

    def loss_fused(x, w, b, g, bt):
        return jnp.sum(ln_dense(x, w, b, g, bt, 1e-6, "gelu") ** 2)

    def loss_ref(x, w, b, g, bt):
        return jnp.sum(_xla_ln_dense(x, w, b, g, bt, 1e-6, "gelu") ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w, b, g, bt)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w, b, g, bt)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n", [128, 700])  # lane-exact and ragged N
@pytest.mark.parametrize("safe", [False, True])
def test_flash_qkv_matches_xla(rng, n, safe):
    """The QKV-direct kernel reads q/k/v as channel-offset views of one
    (B, N, 3C) buffer and runs the N axis ragged (mask_v path) — both must
    reproduce plain attention on a PRE-SCALED q."""
    b, c, h = 2, 128, 2
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * c)) * 0.3, jnp.float32)
    out = flash_attention_qkv(qkv, h, safe)
    ref = _xla_attention_qkv(qkv, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_qkv_grads_match_xla(rng):
    b, n, c, h = 1, 200, 128, 2
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * c)) * 0.3, jnp.float32)

    def f(t):
        return flash_attention_qkv(t, h, True).sum()

    def f_ref(t):
        return _xla_attention_qkv(t, h).sum()

    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(qkv)),
        np.asarray(jax.grad(f_ref)(qkv)),
        rtol=1e-4,
        atol=1e-5,
    )


def test_flash_qkv_unsafe_ragged_no_nan(rng):
    """The max-free kernel's exp() must not pull NaNs out of the ragged-N
    Mosaic edge garbage (the mask_v guard): large-magnitude values in the
    padded V rows are multiplied by an exactly-zero p tail."""
    b, n, c, h = 1, 130, 128, 2
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * c)) * 0.3, jnp.float32)
    out = flash_attention_qkv(qkv, h, False)
    assert np.isfinite(np.asarray(out)).all()


def _block(fused, c=128, h=2, **kw):
    from unidepth_tpu.models.backbones.dinov2 import ViTBlock

    return ViTBlock(dim=c, num_heads=h, fused=fused, dtype=jnp.float32, **kw)


def _block_params_and_apply(rng, fused, n=140, c=128, h=2):
    blk = _block(fused, c, h)
    x = jnp.asarray(rng.standard_normal((2, n, c)) * 0.5, jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)
    return blk, params, x


def test_vit_block_fused_matches_unfused(rng):
    """Same params, same input: the fused block (scale-folded qkv, Pallas
    LN2+fc1+GELU) must reproduce the unfused flax block. The param trees
    must be byte-identical so checkpoints are interchangeable."""
    blk_off, params, x = _block_params_and_apply(rng, "off")
    blk_on = _block("on")
    p2 = blk_on.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    out_off, _ = blk_off.apply(params, x)
    with safe_attention():
        out_on, _ = blk_on.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), rtol=5e-5, atol=5e-5
    )


def test_vit_block_fused_grads_match_unfused(rng):
    blk_off, params, x = _block_params_and_apply(rng, "off", n=80)
    blk_on = _block("on")

    def loss(blk, p):
        with safe_attention():
            out, _ = blk.apply(p, x)
        return jnp.sum(out**2)

    g_off = jax.grad(lambda p: loss(blk_off, p))(params)
    g_on = jax.grad(lambda p: loss(blk_on, p))(params)
    flat_off = jax.tree_util.tree_leaves_with_path(g_off)
    flat_on = dict(jax.tree_util.tree_leaves_with_path(g_on))
    for path, a in flat_off:
        np.testing.assert_allclose(
            np.asarray(flat_on[path]),
            np.asarray(a),
            rtol=2e-4,
            atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_auto_defers_under_mesh(rng):
    """'auto' must keep the unfused path when a mesh is ambient (GSPMD
    cannot partition the un-shard_mapped ln_dense pallas_call)."""
    from unidepth_tpu.parallel.mesh import ambient_mesh

    blk = _block("auto")
    assert ambient_mesh() is None
    # on CPU use_flash is False -> auto resolves off; 'on' still forces it
    assert blk._use_fused(1370, 128, use_flash=False) is False
    assert blk._use_fused(1370, 128, use_flash=True) is True
    # quant blocks and swiglu ffn never fuse
    assert _block("auto", quant=True)._use_fused(1370, 128, True) is False
    assert _block("auto", ffn_layer="swiglu")._use_fused(1370, 128, True) is False
    # non-lane-tiled dims never fuse
    assert _block("auto", c=96)._use_fused(1370, 96, True) is False


# ---- r5: the same ln_dense fusion applied to the ConvNeXt MLPs ----------
# (encoder ConvNeXtBlock, models/backbones/convnext.py; decoder CvnxtBlock,
# nn/upsample.py — reference hot loops convnext.py:130-226 and
# layers/convnext.py:5-45). docs/PERF.md "ConvNeXt serving anatomy".


@pytest.mark.parametrize("use_grn", [False, True])
def test_convnext_block_fused_matches_unfused(rng, use_grn):
    """Fused ConvNeXtBlock (LN+pwconv1+GELU in one kernel after the dwconv)
    == unfused flax math, with a byte-identical param tree. C=192 covers
    the non-128-multiple lane case the relaxed ln_dense guard admits
    (stage 0 of ConvNeXt-L)."""
    from unidepth_tpu.models.backbones.convnext import ConvNeXtBlock

    c = 192
    x = jnp.asarray(rng.standard_normal((2, 10, 14, c)) * 0.5, jnp.float32)
    blk_off = ConvNeXtBlock(dim=c, use_grn=use_grn, fused="off", dtype=jnp.float32)
    blk_on = ConvNeXtBlock(dim=c, use_grn=use_grn, fused="on", dtype=jnp.float32)
    params = blk_off.init(jax.random.PRNGKey(0), x)
    p2 = blk_on.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    (out_off, _), (out_on, _) = blk_off.apply(params, x), blk_on.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), rtol=5e-5, atol=5e-5
    )


def test_cvnxt_block_fused_matches_unfused(rng):
    """Decoder CvnxtBlock fused path (eps=1e-5) == unfused flax math."""
    from unidepth_tpu.nn.upsample import CvnxtBlock

    c = 128
    x = jnp.asarray(rng.standard_normal((2, 8, 12, c)) * 0.5, jnp.float32)
    blk_off = CvnxtBlock(c, fused="off", dtype=jnp.float32)
    blk_on = CvnxtBlock(c, fused="on", dtype=jnp.float32)
    params = blk_off.init(jax.random.PRNGKey(0), x)
    p2 = blk_on.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    np.testing.assert_allclose(
        np.asarray(blk_on.apply(params, x)),
        np.asarray(blk_off.apply(params, x)),
        rtol=5e-5,
        atol=5e-5,
    )


def test_convnext_block_fused_grads_match(rng):
    from unidepth_tpu.models.backbones.convnext import ConvNeXtBlock

    c = 128
    x = jnp.asarray(rng.standard_normal((1, 6, 8, c)) * 0.5, jnp.float32)
    blk_off = ConvNeXtBlock(dim=c, fused="off", dtype=jnp.float32)
    blk_on = ConvNeXtBlock(dim=c, fused="on", dtype=jnp.float32)
    params = blk_off.init(jax.random.PRNGKey(0), x)

    def loss(blk, p):
        out, _ = blk.apply(p, x)
        return jnp.sum(out**2)

    g_off = jax.tree_util.tree_leaves_with_path(
        jax.grad(lambda p: loss(blk_off, p))(params)
    )
    g_on = dict(
        jax.tree_util.tree_leaves_with_path(jax.grad(lambda p: loss(blk_on, p))(params))
    )
    for path, a in g_off:
        np.testing.assert_allclose(
            np.asarray(g_on[path]),
            np.asarray(a),
            rtol=2e-4,
            atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_conv_fused_auto_defers_on_cpu_and_mesh():
    """'auto' resolves off on CPU and under an ambient mesh; 'on' forces;
    non-lane-tiled expansions never fuse."""
    from unidepth_tpu.models.backbones.convnext import ConvNeXtBlock
    from unidepth_tpu.nn.upsample import CvnxtBlock

    assert ConvNeXtBlock(dim=192, fused="auto")._use_fused() is False  # cpu
    assert ConvNeXtBlock(dim=192, fused="on")._use_fused() is True
    assert ConvNeXtBlock(dim=100, fused="on")._use_fused() is False  # 400 % 128
    assert CvnxtBlock(96, expansion=4, fused="on")._use_fused() is True  # f=384
    assert CvnxtBlock(96, expansion=3, fused="on")._use_fused() is False  # f=288

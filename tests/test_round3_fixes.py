"""Regression tests for the round-3 advisor/verdict findings (ragged
multi-process validation, loader num_copies degeneration, global batch
divisibility)."""

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.smoke


def test_metric_accumulator_sample_mask_drops_padding():
    """Padded val samples (pad_mask=False) must not contribute to metrics:
    multi-process validation pads every shard to an equal SPMD batch count
    (scripts/train.py _val_loaders), so their metrics are NaN'd and dropped
    by the nanmean reduction."""
    from unidepth_tpu.utils.validation import MetricAccumulator

    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(1.0, 5.0, (4, 8, 8, 1)), jnp.float32)
    pred = gt * 1.1
    mask = jnp.ones((4, 8, 8, 1), bool)

    ref = MetricAccumulator("ref")
    ref.accumulate(gt[:2], pred[:2], mask[:2])
    expected = ref.get_evaluation()

    acc = MetricAccumulator("padded")
    # last two samples are padding: give them garbage predictions — if the
    # mask is honored they cannot move the result
    bad = pred.at[2:].mul(37.0)
    acc.accumulate(gt, bad, mask, sample_mask=np.array([1, 1, 0, 0], bool))
    got = acc.get_evaluation()
    for k, v in expected.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-6, err_msg=k)


def test_metric_accumulator_all_masked_is_nan_not_crash():
    from unidepth_tpu.utils.validation import MetricAccumulator

    gt = jnp.ones((2, 4, 4, 1), jnp.float32)
    acc = MetricAccumulator("empty")
    acc.accumulate(gt, gt, jnp.ones((2, 4, 4, 1), bool), sample_mask=np.zeros(2, bool))
    out = acc.get_evaluation()
    assert all(np.isnan(v) for v in out.values())


def test_loader_warns_on_num_copies_without_get_single_item():
    """num_copies > 1 over a dataset exposing only __getitem__ yields
    byte-identical copies — the SelfDistill invariance loss silently
    degenerates to ~0. Must warn loudly at construction (ADVICE r2)."""
    from unidepth_tpu.datasets.dummy import Dummy
    from unidepth_tpu.datasets.loader import Loader, WeightedConcat

    with pytest.warns(UserWarning, match="identical"):
        Loader(
            WeightedConcat([Dummy(image_shape=(28, 28), length=8)]),
            batch_size=2,
            num_copies=2,
            num_threads=0,
        )


def test_constrain_skips_indivisible_dims():
    """with_sharding_constraint under the ambient mesh must not reject the
    batch-1 traces that legitimately run inside a training process (param
    init at (1,H,W,3), small artifact batches): entries whose dim doesn't
    divide the mapped mesh axes are dropped, divisible ones still apply."""
    import jax
    import jax.numpy as jnp

    from unidepth_tpu.parallel.mesh import constrain, make_mesh, use_sharding

    mesh = make_mesh(data=4, fsdp=2, tp=1)
    with use_sharding(mesh):
        x1 = jnp.zeros((1, 7, 3))
        out1 = jax.jit(lambda x: constrain(x, ("data", "fsdp"), None, None))(x1)
        assert out1.shape == x1.shape  # no divisibility error

        x8 = jnp.zeros((8, 7, 3))
        out8 = jax.jit(lambda x: constrain(x, ("data", "fsdp"), None, None))(x8)
        assert "data" in str(out8.sharding.spec)

    # no ambient mesh: strict no-op
    y = jnp.zeros((5, 5))
    assert constrain(y, "data", None) is y


def test_loader_no_warning_with_get_single_item(recwarn):
    from unidepth_tpu.datasets.dummy import Dummy
    from unidepth_tpu.datasets.loader import Loader, WeightedConcat

    class CopyAware(Dummy):
        def get_single_item(self, idx, rng, image_shape=None, base=None):
            return self[idx]

    Loader(
        WeightedConcat([CopyAware(image_shape=(28, 28), length=8)]),
        batch_size=2,
        num_copies=2,
        num_threads=0,
    )
    assert not [w for w in recwarn if "identical" in str(w.message)]

"""orbax checkpoint save/resume round-trip and device prefetch."""

import numpy as np

import jax
import jax.numpy as jnp

from unidepth_tpu.datasets.loader import device_prefetch
from unidepth_tpu.io.checkpoint import load_train_checkpoint, save_checkpoint
from unidepth_tpu.training.ema import ema_init
from unidepth_tpu.training.step import TrainState


def test_checkpoint_roundtrip(tmp_path, rng):
    params = {"w": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))}
    state = TrainState(
        params=params,
        opt_state={"mu": jax.tree.map(jnp.zeros_like, params)},
        ema=ema_init(params),
        step=jnp.asarray(7, jnp.int32),
    )
    path = save_checkpoint(str(tmp_path / "ckpt"), state, 7)
    restored, step = load_train_checkpoint(path, state)
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(params["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(restored.ema.shadow["w"]), np.asarray(params["w"])
    )


def test_device_prefetch_order(rng):
    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
    sharding = jax.devices()[0]
    out = list(device_prefetch(iter(batches), sharding, size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), i)

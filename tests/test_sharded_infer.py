"""Multi-chip serving: batch-sharded inference over the device mesh and
the validation driver end-to-end."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from unidepth_tpu.datasets.dummy import Dummy
from unidepth_tpu.datasets.loader import collate
from unidepth_tpu.models.unidepthv2.model import UniDepthV2
from unidepth_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from unidepth_tpu.utils.validation import validate

pytestmark = pytest.mark.slow

CFG = json.loads(
    (Path(__file__).resolve().parents[1] / "configs/config_v2_vits14.json").read_text()
)


@pytest.fixture(scope="module")
def tiny():
    cfg = json.loads(json.dumps(CFG))
    m = UniDepthV2.from_config(cfg, dtype=jnp.float32)
    m.init_params(seed=0, image_shape=(28, 28))
    return m


@pytest.mark.slow
def test_batch_sharded_encode_decode(tiny):
    mesh = make_mesh(data=8)
    params = jax.device_put(tiny.params, replicated(mesh))
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 28, 28, 3)).astype(np.float32)
    )
    img = jax.device_put(img, batch_sharding(mesh))
    out = jax.jit(tiny.encode_decode)(params, img)
    assert out["depth"].shape == (8, 28, 28, 1)
    # output stays sharded over the batch axis (serving-scale layout)
    assert len(out["depth"].sharding.device_set) == 8
    # matches the unsharded result (different partitioning -> different
    # fusion; observed drift ~1e-4 relative on exp(logdepth) outputs)
    ref = jax.jit(tiny.encode_decode)(tiny.params, jnp.asarray(np.asarray(img)))
    np.testing.assert_allclose(
        np.asarray(out["depth"]), np.asarray(ref["depth"]), rtol=1e-3, atol=5e-3
    )


def test_validate_driver_end_to_end(tiny):
    ds = Dummy(image_shape=(28, 28), length=8)
    rng = np.random.default_rng(0)

    def loader():
        for i in range(0, 8, 4):
            samples = [ds[j] for j in range(i, i + 4)]
            yield collate(samples)

    results = validate(tiny, tiny.params, {"Dummy": loader()}, max_iters=2)
    assert "Dummy" in results
    m = results["Dummy"]
    for key in ("d1", "arel", "rmse", "silog", "d_auc", "tau_ssi"):
        assert key in m and np.isfinite(m[key]), key

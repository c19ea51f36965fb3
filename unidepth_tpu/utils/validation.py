"""Validation driver (reference unidepth/utils/validation.py + the metric
accumulation of base_dataset.py:187-271).

Loops validation loaders, runs the model's test forward, accumulates
per-sample metrics on device, and reduces across processes with a jitted
``process_allgather`` — the collective replacement for the reference's
NCCL ``sync_tensor_across_gpus``.
"""

from __future__ import annotations

from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from unidepth_tpu.utils.evaluation import eval_3d, eval_depth

__all__ = ["MetricAccumulator", "validate"]


class MetricAccumulator:
    """Per-dataset accumulation + cross-process mean
    (reference base_dataset.py:187-271)."""

    def __init__(self, name: str, max_depth: float | None = None):
        self.name = name
        self.max_depth = max_depth
        self._values: dict[str, list[np.ndarray]] = defaultdict(list)

    def accumulate(self, depth_gt, depth_pred, mask, points_gt=None, points_pred=None, thresholds=None):
        metrics = eval_depth(depth_gt, depth_pred, mask, max_depth=self.max_depth)
        for k, v in metrics.items():
            self._values[k].append(np.asarray(v))
        if points_gt is not None and points_pred is not None:
            m3 = eval_3d(points_gt, points_pred, mask, thresholds)
            for k, v in m3.items():
                self._values[k].append(np.asarray(v))

    def get_evaluation(self) -> dict[str, float]:
        out = {}
        for k, vs in self._values.items():
            local = np.concatenate([np.atleast_1d(v) for v in vs])
            if jax.process_count() > 1:
                from jax.experimental.multihost_utils import process_allgather

                local = np.concatenate(process_allgather(local))
            out[k] = float(np.mean(local))
        self._values.clear()
        return out


def validate(model, params, val_loaders: dict, max_iters: int | None = None) -> dict:
    """val_loaders: {name: iterable of collated numpy batches}. Returns
    {dataset: {metric: value}}.

    The forward pass runs under jit (one compile per batch shape): eager
    op-by-op dispatch is unusable on remote/tunneled accelerators.
    """
    fwd = jax.jit(
        lambda p, img, rays: model.encode_decode(p, img, rays_gt=rays)["depth"]
    )
    results = {}
    for name, loader in val_loaders.items():
        acc = MetricAccumulator(name)
        for i, batch in enumerate(loader):
            if max_iters is not None and i >= max_iters:
                break
            depth = fwd(
                params, jnp.asarray(batch["image"]), jnp.asarray(batch["rays"])
            )
            acc.accumulate(
                jnp.asarray(batch["depth"]),
                depth,
                jnp.asarray(batch["depth_mask"]),
            )
        results[name] = acc.get_evaluation()
    return results

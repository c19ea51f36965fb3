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

    def accumulate(
        self,
        depth_gt,
        depth_pred,
        mask,
        points_gt=None,
        points_pred=None,
        thresholds=None,
        mask3d=None,
        sample_mask=None,
    ):
        """``sample_mask``: optional (B,) bool — False marks padding samples
        (val shards padded to equal SPMD batch counts); their metrics are
        recorded as NaN and dropped by the nanmean reduction."""

        def _store(k, v):
            v = np.asarray(v, np.float64)
            if sample_mask is not None:
                v = np.where(np.asarray(sample_mask, bool), v, np.nan)
            self._values[k].append(v)

        metrics = eval_depth(depth_gt, depth_pred, mask, max_depth=self.max_depth)
        for k, v in metrics.items():
            _store(k, v)
        if points_gt is not None and points_pred is not None:
            m3 = eval_3d(
                points_gt, points_pred, mask if mask3d is None else mask3d, thresholds
            )
            for k, v in m3.items():
                _store(k, v)

    def get_evaluation(self) -> dict[str, float]:
        out = {}
        for k, vs in self._values.items():
            local = np.concatenate([np.atleast_1d(v) for v in vs])
            if jax.process_count() > 1:
                from jax.experimental.multihost_utils import process_allgather

                # shards are ragged by up to one sample per batch
                # (DistributedSamplerNoDuplicate semantics) and allgather
                # needs equal shapes: agree on the max length first, pad
                # with NaN, and let nanmean drop the padding
                n = int(np.max(process_allgather(np.asarray([local.size]))))
                if local.size < n:
                    local = np.concatenate(
                        [local, np.full(n - local.size, np.nan, local.dtype)]
                    )
                local = np.concatenate(process_allgather(local))
            out[k] = float(np.nanmean(local)) if np.any(np.isfinite(local)) else float("nan")
        self._values.clear()
        return out


def validate(
    model,
    params,
    val_loaders: dict,
    max_iters: int | None = None,
    with_3d: bool = False,
    depth_ranges: dict | None = None,
) -> dict:
    """val_loaders: {name: iterable of collated numpy batches}. Returns
    {dataset: {metric: value}}.

    The forward pass runs under jit (one compile per batch shape): eager
    op-by-op dispatch is unusable on remote/tunneled accelerators.

    ``with_3d`` adds Chamfer distance + F1-AUC over 100 log-spaced
    thresholds between the dataset's min_depth and max_depth/20 (reference
    base_dataset.py:237-242); points are depth unprojected along the GT
    rays (pred rays when the model outputs them). Point clouds larger than
    240x320 are strided down first, the analogue of the reference's
    nearest resize OOM guard (evaluation_depth.py:154-161).
    """
    # one jitted forward per MODEL, cached across validate() calls: a fresh
    # jax.jit(lambda) every interval would be a new cache key and recompile
    # the full forward each time (train.py makes the same point for its
    # artifact forward)
    fwd = getattr(model, "_val_fwd", None)
    if fwd is None:
        from unidepth_tpu.ops.flash_attention import safe_attention
        from unidepth_tpu.utils.misc import normalize_rgb

        # loader/collate batches are raw 0..255 floats; normalize on
        # device exactly like the jitted serving preprocess. Validation
        # runs on MID-TRAINING params, so like the train step it traces
        # under the safe row-max attention kernels (the serving max-free
        # guard assumes trained logits < 30; a diverging checkpoint must
        # show its real metrics, not silently saturated ones).
        def _fwd(p, img, rays):
            with safe_attention():
                return model.encode_decode(p, normalize_rgb(img), rays_gt=rays)

        fwd = jax.jit(_fwd)
        model._val_fwd = fwd
    results = {}
    for name, loader in val_loaders.items():
        acc = MetricAccumulator(name)
        dmin, dmax = (depth_ranges or {}).get(name, (0.01, 80.0))
        thresholds = jnp.exp(
            jnp.linspace(float(np.log(dmin)), float(np.log(dmax / 20.0)), 100)
        )
        for i, batch in enumerate(loader):
            if max_iters is not None and i >= max_iters:
                break
            out = fwd(params, jnp.asarray(batch["image"]), jnp.asarray(batch["rays"]))
            depth = out["depth"]
            kwargs = {}
            if with_3d:
                b, h, w = depth.shape[:3]
                s = max(1, int(np.ceil((h * w / (240.0 * 320.0)) ** 0.5)))
                gt_d = jnp.asarray(batch["depth"])[:, ::s, ::s]
                pr_d = depth[:, ::s, ::s]
                rays_gt = jnp.asarray(batch["rays"]).reshape(b, h, w, 3)[:, ::s, ::s]
                rz = jnp.clip(jnp.abs(rays_gt[..., 2:3]), 1e-5)
                pts_gt = rays_gt / rz * gt_d
                rays_pr = out.get("rays")
                if rays_pr is not None:
                    rays_pr = rays_pr.reshape(b, h, w, 3)[:, ::s, ::s]
                    rzp = jnp.clip(jnp.abs(rays_pr[..., 2:3]), 1e-5)
                    pts_pr = rays_pr / rzp * pr_d
                else:
                    pts_pr = rays_gt / rz * pr_d
                kwargs = dict(
                    points_gt=pts_gt,
                    points_pred=pts_pr,
                    thresholds=thresholds,
                )
                kwargs["mask3d"] = jnp.asarray(batch["depth_mask"])[:, ::s, ::s]
            acc.accumulate(
                jnp.asarray(batch["depth"]),
                depth,
                jnp.asarray(batch["depth_mask"]),
                sample_mask=batch.get("pad_mask"),
                **kwargs,
            )
        results[name] = acc.get_evaluation()
    return results

"""Optimizer construction: AdamW with layer-decay groups and schedules.

Replaces the reference's param-group machinery
(backbones/dinov2.py:38-105 layer decay, utils/misc.py:81 wd split,
scripts/train.py:336-371 three CosineSchedulers): here the "groups" are
per-leaf scalar trees (lr multiplier, wd mask) applied inside one optax
chain, so the whole optimizer jits and shards with the params.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

from unidepth_tpu.training.schedules import betas_schedule, cosine_warmup

__all__ = ["build_optimizer", "lr_scale_tree", "wd_mask_tree"]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def lr_scale_tree(params, encoder_lr_scale: float, ld: float, num_layers: int):
    """Per-leaf lr multipliers: decoder leaves 1.0; encoder leaves
    ``encoder_lr_scale * ld^(num_layers - layer_id)`` (reference
    dinov2.py:47-105; embeddings/patch count as layer 0). For scanned block
    segments the scale is a per-block array broadcast along the stacked
    leading axis, so layer decay stays exact under nn.scan."""

    # Fast path (shipped configs use ld == 1.0): scalar per leaf.
    if ld == 1.0:
        return jax.tree_util.tree_map_with_path(
            lambda path, x: encoder_lr_scale
            if _path_str(path).startswith("encoder")
            else 1.0,
            params,
        )

    stage_lengths: dict[int, int] = {}

    def leaf_scale(path, x):
        p = _path_str(path)
        if not p.startswith("encoder"):
            return jnp.asarray(1.0, jnp.float32)
        if "stage_" in p:
            seg = int(p.split("stage_")[1].split("/")[0])
            # blocks before this segment:
            offset = sum(stage_lengths.get(i, 0) for i in range(seg))
            L = x.shape[0]
            ids = offset + jnp.arange(L) + 1
            scales = encoder_lr_scale * (ld ** (num_layers - ids)).astype(jnp.float32)
            return scales.reshape((L,) + (1,) * (x.ndim - 1))
        if "/norm/" in p or p.endswith("/norm"):
            # post-block leaves (the final encoder LayerNorm) take the LAST
            # layer id -> scale ld^0 = 1 (reference misc.py:142-143
            # `return num_max_layer - 1` + the ld**(num-id-1) exponent);
            # lumping them with the embeddings would freeze the norm at
            # ld^num_layers
            return jnp.asarray(encoder_lr_scale, jnp.float32)
        # embeddings (patch/pos/cls/register): layer 0 (reference :129-132)
        return jnp.asarray(encoder_lr_scale * (ld**num_layers), jnp.float32)

    # collect segment lengths first
    def collect(path, x):
        p = _path_str(path)
        if p.startswith("encoder") and "stage_" in p:
            seg = int(p.split("stage_")[1].split("/")[0])
            stage_lengths[seg] = max(stage_lengths.get(seg, 0), x.shape[0])
        return x

    jax.tree_util.tree_map_with_path(collect, params)
    return jax.tree_util.tree_map_with_path(leaf_scale, params)


def wd_mask_tree(params):
    """True where weight decay applies: skip 1-D leaves (norms/biases/
    gammas) and embedding tokens (reference misc.py:81-105,
    dinov2.py:54-71). Scanned block leaves have a leading stack axis, so
    the effective rank is ndim-1 there."""

    def mask(path, x):
        p = _path_str(path)
        ndim = x.ndim - (1 if "stage_" in p else 0)
        if ndim <= 1:
            return False
        for kw in ("cls_token", "pos_embed", "register_tokens", "latents_pos", "level_embeds", "gamma"):
            if kw in p:
                return False
        return True

    return jax.tree_util.tree_map_with_path(mask, params)


def _scale_by_tree(scales) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    params,
    lr: float = 1e-4,
    lr_final: float = 1e-6,
    encoder_lr: float = 2e-6,
    wd: float = 0.1,
    wd_final: float = 0.1,
    warmup_iters: int = 75_000,
    total_iters: int = 300_000,
    ld: float = 1.0,
    num_encoder_layers: int = 24,
    clipping: float = 1.0,
    cycle_betas: bool = True,
    lr_warmup: float = 1.0,
):
    """One jittable optax chain implementing the reference's AdamW recipe."""
    lr_sched = cosine_warmup(
        lr, lr_final, warmup_iters, total_iters, init_value=lr * lr_warmup
    )
    wd_sched = cosine_warmup(wd, wd_final, 0, total_iters)
    b1_sched = betas_schedule(cycle_betas, warmup_iters, total_iters)

    scales = lr_scale_tree(params, encoder_lr / lr, ld, num_encoder_layers)
    wd_mask = wd_mask_tree(params)

    def make(lr_v, b1_v, wd_v):
        return optax.chain(
            optax.clip_by_global_norm(clipping),
            optax.scale_by_adam(b1=b1_v, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(wd_v, mask=wd_mask),
            _scale_by_tree(scales),
            optax.scale_by_learning_rate(lr_v),
        )

    opt = optax.inject_hyperparams(make)(
        lr_v=lr_sched, b1_v=b1_sched, wd_v=wd_sched
    )
    return opt

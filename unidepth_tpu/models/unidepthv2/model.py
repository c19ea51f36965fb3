"""UniDepthV2: universal monocular metric depth estimation on TPU.

Public API parity with reference unidepth/models/unidepthv2/unidepthv2.py:
``from_pretrained`` / ``from_config`` construction, ``infer(rgb, camera)``
returning depth / points / rays / intrinsics / confidence, and
``resolution_level`` control. The whole pipeline — ImageNet normalization,
aspect-ratio padding, pixel-budget resize, encoder, decoder, and
back-to-input-resolution postprocessing — runs as ONE jit-compiled XLA
program per input-shape bucket; the host only computes static shape
arithmetic and caches compiled executables.
"""

from __future__ import annotations

import functools
import math
import warnings
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from unidepth_tpu.geometry.cameras import CameraBase, Pinhole
from unidepth_tpu.models.backbones.dinov2 import VIT_PRESETS, DinoViT, ViTConfig
from unidepth_tpu.models.unidepthv2.decoder import Decoder
from unidepth_tpu.models.serving import ServingPrecisionMixin
from unidepth_tpu.ops.resize import resize
from unidepth_tpu.utils.misc import JitCache
from unidepth_tpu.utils.constants import IMAGENET_DATASET_MEAN, IMAGENET_DATASET_STD


def get_paddings(shape: tuple[int, int], ratio_bounds: tuple[float, float]):
    """Pad (H, W) into the aspect-ratio interval; returns (l, r, t, b), new
    (H, W) (reference unidepthv2.py:36-58)."""
    h, w = shape
    ratio = w / h
    if ratio_bounds[0] <= ratio <= ratio_bounds[1]:
        # already in the interval: no padding. (Computing the target shape
        # with int(h * ratio) here can truncate to w-1 and yield a NEGATIVE
        # pad — the torch reference silently crops a pixel through F.pad,
        # jnp.pad would raise.)
        return (0, 0, 0, 0), (h, w)
    if ratio > ratio_bounds[1]:  # too wide: pad vertically
        new_h = max(h, math.ceil(w / ratio_bounds[1]))
        pt = (new_h - h) // 2
        return (0, 0, pt, new_h - h - pt), (new_h, w)
    new_w = max(w, math.ceil(h * ratio_bounds[0]))
    pl = (new_w - w) // 2
    return (pl, new_w - w - pl, 0, 0), (h, new_w)


def get_resize_factor(
    shape: tuple[int, int],
    pixels_bounds: tuple[float, float],
    multiple: int = 14,
):
    """Resize factor into the pixel budget, rounded up to ``multiple``
    (reference unidepthv2.py:61-77)."""
    h, w = shape
    n = h * w
    target = min(pixels_bounds[1], max(pixels_bounds[0], n))
    factor = (target / n) ** 0.5
    new_h = math.ceil(int(h * factor) / multiple) * multiple
    new_w = math.ceil(int(w * factor) / multiple) * multiple
    return factor, (new_h, new_w)


DEFAULT_SHAPE_CONSTRAINTS = {
    "ratio_bounds": (0.5, 2.5),
    "pixels_min": 200_000,
    "pixels_max": 600_000,
    "shape_mult": 14,
}


class UniDepthV2(ServingPrecisionMixin):
    """Stateful convenience wrapper around pure jitted functions.

    Attributes:
      params: fp32 parameter pytree {'encoder': ..., 'decoder': ...}.
      resolution_level: optional int in [0, 10) — selects a slice of the
        pixel-budget interval (reference unidepthv2.py:247-262).
    """

    PATCH = 14

    def __init__(
        self,
        encoder_cfg: ViTConfig,
        hidden_dim: int,
        out_dim: int,
        decoder_depths: tuple[int, ...] = (2, 2, 2),
        num_heads: int = 8,
        expansion: int = 4,
        layer_scale: float = 1.0,
        shape_constraints: dict | None = None,
        dtype: Any = None,
        params=None,
        attn_impl: str | None = None,
        stacking: str = "last",
    ):
        if dtype is None:
            dtype = (
                jnp.bfloat16
                if jax.default_backend() not in ("cpu",)
                else jnp.float32
            )
        if attn_impl is None:
            import os

            attn_impl = os.environ.get("UNIDEPTH_ATTN_IMPL", "auto")
        self.dtype = dtype
        self.encoder_cfg = encoder_cfg
        import os as _os

        self.encoder = DinoViT(
            cfg=encoder_cfg,
            stacking=stacking,
            attn_impl=attn_impl,
            remat=_os.environ.get("UNIDEPTH_VIT_REMAT", "1") == "1",
            unroll=int(_os.environ.get("UNIDEPTH_VIT_UNROLL", "1")),
            dtype=dtype,
        )
        self.decoder = Decoder(
            input_dims=(encoder_cfg.embed_dim,) * 4,
            hidden_dim=hidden_dim,
            num_heads=num_heads,
            expansion=expansion,
            depths=tuple(decoder_depths),
            out_dim=out_dim,
            layer_scale=layer_scale,
            dtype=dtype,
        )
        self.shape_constraints = {**DEFAULT_SHAPE_CONSTRAINTS, **(shape_constraints or {})}
        self.params = params
        self.resolution_level: int | None = None
        self.interpolation_mode = "bilinear"
        self._jit_cache = JitCache()  # bounded LRU; utils/misc.py
        # serving-precision machinery ('default' bf16 pre-cast | opt-in
        # 'int8' encoder GEMMs): models/serving.py ServingPrecisionMixin
        self._init_serving()

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    @classmethod
    def from_config(cls, config: dict, params=None, dtype=None) -> "UniDepthV2":
        """Build from a reference-schema JSON config dict
        (reference unidepthv2.py:418-460)."""
        pe = config["model"]["pixel_encoder"]
        enc_name = pe["name"]  # e.g. dinov2_vitl14
        preset = enc_name.replace("dinov2_", "")
        vit = VIT_PRESETS.get(preset)
        enc_cfg = ViTConfig(
            embed_dim=pe.get("embed_dim", vit.embed_dim if vit else 384),
            depth=pe.get("depth", vit.depth if vit else 12),
            num_heads=pe.get("num_heads", vit.num_heads if vit else 6),
            pos_embed_size=pe.get("pos_embed_size", 37),
            output_idx=tuple(
                pe.get("output_idx", vit.output_idx if vit else (3, 6, 9, 12))
            ),
            num_register_tokens=pe.get("num_register_tokens", 0),
            use_norm=pe.get("use_norm", False),  # reference encoder.py:150 default
            # reference build merges training into the encoder config
            # (unidepthv2.py:421-425), so drop_path comes from either section
            drop_path_rate=pe.get(
                "drop_path", config.get("training", {}).get("drop_path", 0.0)
            ),
        )
        stacking = pe.get("stacking_fn", "last")
        sc = config.get("data", {}).get("augmentations", {}).get("shape_constraints")
        shape_constraints = None
        if sc:
            shape_constraints = {
                "ratio_bounds": tuple(sc["ratio_bounds"]),
                "pixels_min": sc["pixels_min"],
                "pixels_max": sc["pixels_max"],
                "shape_mult": sc.get("shape_mult", 14),
            }
        dec = config["model"]["pixel_decoder"]
        model = cls(
            encoder_cfg=enc_cfg,
            hidden_dim=dec["hidden_dim"],
            out_dim=dec["out_dim"],
            decoder_depths=tuple(dec.get("depths", (2, 2, 2))),
            num_heads=config["model"].get("num_heads", 8),
            expansion=config["model"].get("expansion", 4),
            layer_scale=config["model"].get("layer_scale", 1.0),
            shape_constraints=shape_constraints,
            dtype=dtype,
            params=params,
            stacking=stacking,
        )
        # conversion-audited max |prescaled attention logit| (scripts/
        # convert.py --verify); absent -> serving keeps row-max softmax
        model.attention_logit_bound = config["model"].get("attention_logit_bound")
        return model

    @classmethod
    def from_pretrained(cls, name_or_path: str, dtype=None) -> "UniDepthV2":
        from unidepth_tpu.io.hub import load_checkpoint

        config, params = load_checkpoint(name_or_path, version=2)
        return cls.from_config(config, params=params, dtype=dtype)

    def init_params(self, seed: int = 0, image_shape=(252, 336)):
        """Random init (for tests/benchmarks without a checkpoint)."""
        k1, k2 = jax.random.split(jax.random.key(seed))
        h, w = image_shape
        img = jnp.zeros((1, h, w, 3), jnp.float32)
        enc_vars = self.encoder.init(k1, img)
        feats, cls_tokens = jax.eval_shape(
            lambda p, x: self.encoder.apply(p, x), enc_vars, img
        )
        feats_z = [jnp.zeros(f.shape, jnp.float32) for f in feats]
        cls_z = [jnp.zeros(c.shape, jnp.float32) for c in cls_tokens]
        dec_vars = self.decoder.init(k2, feats_z, cls_z, (h, w))
        self.params = {"encoder": enc_vars["params"], "decoder": dec_vars["params"]}
        return self.params

    # ------------------------------------------------------------------
    # pure forward (one XLA program)
    # ------------------------------------------------------------------
    def _pixels_bounds(self) -> tuple[float, float]:
        lo = self.shape_constraints["pixels_min"]
        hi = self.shape_constraints["pixels_max"]
        if self.resolution_level is not None:
            level = self.resolution_level
            if not (0 <= level < 10):
                raise ValueError("resolution_level should be in [0, 10)")
            interval = (hi - lo) / 10
            return (level * interval + lo, (level + 1) * interval + lo)
        warnings.warn("resolution_level not set, using default pixel bounds")
        return (lo, hi)

    def _infer_fn(self, shape_key):
        """Build + cache the jitted end-to-end program for one shape bucket."""
        if shape_key in self._jit_cache:
            return self._jit_cache[shape_key]
        fn = jax.jit(self._build_run(shape_key))
        self._jit_cache[shape_key] = fn
        return fn

    def _build_run(self, shape_key):
        """The pure (unjitted) end-to-end program for one shape bucket —
        normalize/pad/resize + encoder + decoder + postprocess. Exposed
        separately so bench.py can chain iterations of the real serving
        program inside one jitted fori_loop."""
        (H, W, pads, padded, new_hw, factor, has_camera, normalize, outputs) = shape_key
        pl, pr, pt, pb = pads
        new_h, new_w = new_hw

        def run(params, rgb, camera):
            # rgb: (B, H, W, 3) float32 raw (0..255 or normalized)
            with self._serving_trace_ctx():
                return body(params, rgb, camera)

        def body(params, rgb, camera):
            x = rgb
            if normalize:
                mean = jnp.asarray(IMAGENET_DATASET_MEAN) * 255.0
                std = jnp.asarray(IMAGENET_DATASET_STD) * 255.0
                x = (x - mean) / std
            x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
            x = resize(x, (new_h, new_w), mode="bilinear", align_corners=False)

            rays_gt = None
            if has_camera:
                cam = camera.crop(-pl, -pt).resize(factor)
                rays_gt = cam.get_rays(new_h, new_w, eps=1e-4)
                rays_gt = rays_gt.reshape(rays_gt.shape[0], new_h * new_w, 3)

            feats, cls_tokens = self._serving_encoder().apply(
                {"params": params["encoder"]}, x.astype(self.dtype)
            )
            out = self.decoder.apply(
                {"params": params["decoder"]},
                feats,
                cls_tokens,
                (new_h, new_w),
                rays_gt=rays_gt,
            )

            rays = out["rays"].reshape(-1, new_h, new_w, 3).astype(jnp.float32)
            points = rays * out["radius"]
            core = {
                "points": points,
                "rays": rays,
                "confidence": out["confidence"],
                "intrinsics": out["intrinsics"],
                "depth_features": out["depth_features"],
            }
            return self._postprocess_serving(core, pads, padded, factor, outputs)

        return run

    def _postprocess_serving(self, core, pads, padded, factor, outputs=None):
        """Shared serving postprocess: resize network-resolution maps back
        to the padded input grid, strip pads, renormalize rays, and de-scale
        the intrinsics (reference unidepthv2.py:80-108 _postprocess +
        _postprocess_intrinsics). Single code path for both compile
        granularities — 'full' (_build_run) and 'core' (_infer_core_mode) —
        so their serving numerics cannot fork."""
        pl, pr, pt, pb = pads
        padded_h, padded_w = padded

        def post(t):
            t = resize(
                t,
                (padded_h, padded_w),
                mode=self.interpolation_mode,
                align_corners=False,
            )
            return t[:, pt : padded_h - pb, pl : padded_w - pr]

        points = post(core["points"])
        rays = post(core["rays"])
        rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True).clip(1e-5)
        scale_mat = jnp.asarray(
            [
                [1.0 / factor, 1.0, 1.0 / factor],
                [1.0, 1.0 / factor, 1.0 / factor],
                [1.0, 1.0, 1.0],
            ]
        )
        K = core["intrinsics"] * scale_mat  # fx, fy, cx, cy de-scaled
        K = K.at[:, 0, 2].add(-pl).at[:, 1, 2].add(-pt)
        res = {
            "depth": points[..., 2:3],
            "points": points,
            "rays": rays,
            "confidence": post(core["confidence"]),
            "radius": jnp.linalg.norm(points, axis=-1, keepdims=True),
            "intrinsics": K,
            "depth_features": core["depth_features"],
        }
        if outputs is not None:
            # returning a subset lets XLA dead-code-eliminate unused
            # heads — dropping 'confidence' removes its whole 518px
            # conv chain (~10% of the serving program, docs/PERF.md)
            res = {k: res[k] for k in outputs}
        return res

    # ------------------------------------------------------------------
    # 'core' compile granularity: the expensive encoder+decoder program is
    # keyed ONLY by the network shape; cheap pre/post programs compile per
    # input shape in seconds. Serving arbitrary input sizes then costs one
    # big compile per resolution bucket instead of one per input shape.
    # ------------------------------------------------------------------
    def _core_fn(self, new_hw, has_camera):
        key = ("core", new_hw, has_camera)
        if key in self._jit_cache:
            return self._jit_cache[key]
        new_h, new_w = new_hw

        def core(params, x, rays_gt):
            with self._serving_trace_ctx():
                return core_body(params, x, rays_gt)

        def core_body(params, x, rays_gt):
            feats, cls_tokens = self._serving_encoder().apply(
                {"params": params["encoder"]}, x.astype(self.dtype)
            )
            out = self.decoder.apply(
                {"params": params["decoder"]},
                feats,
                cls_tokens,
                (new_h, new_w),
                rays_gt=rays_gt if has_camera else None,
            )
            rays = out["rays"].reshape(-1, new_h, new_w, 3).astype(jnp.float32)
            points = rays * out["radius"]
            return {
                "points": points,
                "rays": rays,
                "confidence": out["confidence"],
                "intrinsics": out["intrinsics"],
                "depth_features": out["depth_features"],
            }

        fn = jax.jit(core)
        self._jit_cache[key] = fn
        return fn

    def _infer_core_mode(self, rgb, camera, normalize, pads, padded, new_hw, factor):
        pl, pr, pt, pb = pads
        new_h, new_w = new_hw
        pre_key = ("pre", rgb.shape[1:3], pads, new_hw, normalize)
        if pre_key not in self._jit_cache:

            def pre(x):
                if normalize:
                    mean = jnp.asarray(IMAGENET_DATASET_MEAN) * 255.0
                    std = jnp.asarray(IMAGENET_DATASET_STD) * 255.0
                    x = (x - mean) / std
                x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
                return resize(x, (new_h, new_w), mode="bilinear", align_corners=False)

            self._jit_cache[pre_key] = jax.jit(pre)
        x = self._jit_cache[pre_key](rgb)

        rays_gt = None
        if camera is not None:
            cam = camera.crop(-pl, -pt).resize(factor)
            rays_gt = cam.get_rays(new_h, new_w, eps=1e-4).reshape(-1, new_h * new_w, 3)
        out = self._core_fn(new_hw, camera is not None)(
            self._serving_params(), x, rays_gt
        )

        post_key = ("post", new_hw, padded, pads, factor)
        if post_key not in self._jit_cache:
            self._jit_cache[post_key] = jax.jit(
                functools.partial(
                    self._postprocess_serving,
                    pads=pads,
                    padded=padded,
                    factor=factor,
                )
            )
        return self._jit_cache[post_key](out)

    # ------------------------------------------------------------------
    # public inference API
    # ------------------------------------------------------------------
    INFER_OUTPUTS = (
        "depth",
        "points",
        "rays",
        "confidence",
        "radius",
        "intrinsics",
        "depth_features",
    )

    def infer(
        self,
        rgb,
        camera=None,
        normalize: bool = True,
        compile_granularity: str = "full",
        outputs: tuple | list | None = None,
    ) -> dict:
        """rgb: (H,W,3) | (B,H,W,3) channel-last, or (3,H,W) | (B,3,H,W)
        channel-first; uint8 or float. camera: Pinhole/`CameraBase`, or a
        (3,3)/(B,3,3) K matrix. Returns channel-last float32 outputs at the
        input resolution (reference unidepthv2.py:239-339).

        compile_granularity: 'full' fuses the whole pipeline into one XLA
        program per input shape (fastest steady-state); 'core' compiles the
        expensive network once per *resolution bucket* and pre/post per
        input shape (fast warm-up when serving many input sizes).

        outputs: optional subset of INFER_OUTPUTS to return ('full' mode
        only). XLA dead-code-eliminates the heads feeding dropped keys —
        e.g. omitting 'confidence' removes its high-res conv chain (~10%
        of the serving program)."""
        rgb = np.asarray(rgb) if not isinstance(rgb, jnp.ndarray) else rgb
        if rgb.ndim == 3:
            rgb = rgb[None]
        if rgb.shape[1] == 3 and rgb.shape[-1] != 3:
            rgb = jnp.transpose(jnp.asarray(rgb), (0, 2, 3, 1))
        rgb = jnp.asarray(rgb, jnp.float32)
        B, H, W, _ = rgb.shape

        if camera is not None and not isinstance(camera, CameraBase):
            K = jnp.asarray(camera, jnp.float32)
            camera = Pinhole.from_K(K)
        if camera is not None and camera.params.shape[0] == 1 and B > 1:
            updates = {
                "params": jnp.broadcast_to(camera.params, (B, camera.params.shape[1]))
            }
            if getattr(camera, "type_ids", None) is not None:
                updates["type_ids"] = jnp.broadcast_to(camera.type_ids, (B,))
            camera = camera.replace(**updates)

        pads, (padded_h, padded_w) = get_paddings(
            (H, W), self.shape_constraints["ratio_bounds"]
        )
        factor, (new_h, new_w) = get_resize_factor(
            (padded_h, padded_w),
            self._pixels_bounds(),
            self.shape_constraints["shape_mult"],
        )
        if compile_granularity == "core":
            return self._infer_core_mode(
                rgb, camera, normalize, pads, (padded_h, padded_w),
                (new_h, new_w), factor,
            )
        key = self.serving_shape_key(
            (H, W), has_camera=camera is not None, normalize=normalize,
            outputs=outputs,
        )
        fn = self._infer_fn(key)
        return fn(self._serving_params(), rgb, camera)

    def serving_shape_key(
        self,
        image_hw: tuple[int, int],
        has_camera: bool = False,
        normalize: bool = True,
        outputs: tuple | list | None = None,
    ):
        """The jit-cache key infer() selects for an input shape — the single
        source of truth for the bucket layout, shared with bench.py /
        profilers so external callers can't drift from the serving
        program's actual configuration. Pass the result to
        ``_build_run``."""
        H, W = image_hw
        pads, (padded_h, padded_w) = get_paddings(
            (H, W), self.shape_constraints["ratio_bounds"]
        )
        factor, (new_h, new_w) = get_resize_factor(
            (padded_h, padded_w),
            self._pixels_bounds(),
            self.shape_constraints["shape_mult"],
        )
        out_key = None
        if outputs is not None:
            bad = set(outputs) - set(self.INFER_OUTPUTS)
            if bad:
                raise ValueError(
                    f"unknown infer outputs {sorted(bad)}; valid: {self.INFER_OUTPUTS}"
                )
            out_key = tuple(sorted(set(outputs)))
        return (
            H,
            W,
            pads,
            (padded_h, padded_w),
            (new_h, new_w),
            factor,
            has_camera,
            normalize,
            out_key,
        )

    def _audit_preprocess(self, rgb):
        """Normalize/pad/resize a raw (H,W,3) or (B,H,W,3) 0..255 image to
        the exact network-resolution batch the serving program would see —
        the input ``audit_attention_logits`` expects (scripts/convert.py
        runs this pair at conversion to validate the max-free-softmax logit
        bound)."""
        rgb = jnp.asarray(rgb, jnp.float32)
        if rgb.ndim == 3:
            rgb = rgb[None]
        key = self.serving_shape_key(rgb.shape[1:3])
        _, _, pads, _, new_hw, _, _, _, _ = key
        pad_l, pad_r, pad_t, pad_b = pads
        mean = jnp.asarray(IMAGENET_DATASET_MEAN) * 255.0
        std = jnp.asarray(IMAGENET_DATASET_STD) * 255.0
        x = (rgb - mean) / std
        x = jnp.pad(x, ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)))
        return resize(x, new_hw, mode="bilinear", align_corners=False)

    # ------------------------------------------------------------------
    def encode_decode(self, params, image, rays_gt=None, rng=None):
        """Pure train/eval forward on a preprocessed batch (B, H, W, 3).

        Returns the decoder output dict plus 'points'/'depth'
        (reference unidepthv2.py:341-379). Passing ``rng`` enables
        stochastic depth when the config ships drop_path > 0."""
        _, h, w, _ = image.shape
        train = rng is not None and self.encoder_cfg.drop_path_rate > 0.0
        feats, cls_tokens = self.encoder.apply(
            {"params": params["encoder"]},
            image.astype(self.dtype),
            train,
            rngs={"droppath": rng} if train else None,
        )
        out = self.decoder.apply(
            {"params": params["decoder"]}, feats, cls_tokens, (h, w), rays_gt=rays_gt
        )
        rays = out["rays"].reshape(-1, h, w, 3).astype(jnp.float32)
        points = rays * out["radius"]
        out["points"] = points
        out["depth"] = points[..., 2:3]
        return out


def get_params_info(model: "UniDepthV2", config: dict):
    """Optimizer grouping info (reference unidepthv2.py:396-412 get_params):
    returns (lr_scale_tree, wd_mask_tree) for the model's params — consumed
    by training/optim.build_optimizer, exposed here for API parity."""
    from unidepth_tpu.training.optim import lr_scale_tree, wd_mask_tree

    tr = config.get("training", {})
    enc_lr = config["model"]["pixel_encoder"].get("lr", 2e-6)
    lr = tr.get("lr", 1e-4)
    scales = lr_scale_tree(
        model.params, enc_lr / lr, tr.get("ld", 1.0), model.encoder_cfg.depth
    )
    return scales, wd_mask_tree(model.params)

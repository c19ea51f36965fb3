# Model registry; populated as model families are implemented.
try:
    from unidepth_tpu.models.unidepthv2.model import UniDepthV2
except ImportError:  # pragma: no cover - during bootstrap
    UniDepthV2 = None
try:
    from unidepth_tpu.models.unidepthv1.model import UniDepthV1
except ImportError:  # pragma: no cover - during bootstrap
    UniDepthV1 = None

__all__ = ["UniDepthV1", "UniDepthV2"]

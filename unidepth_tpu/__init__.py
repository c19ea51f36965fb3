"""unidepth_tpu — a TPU-native (JAX/XLA/Pallas) universal monocular metric
depth estimation framework with the capabilities of UniDepth (CVPR 2024,
arXiv 2502.20110).

Public API mirrors the reference: ``UniDepthV1``, ``UniDepthV2`` with
``from_pretrained`` and ``infer``; a generalized camera library; depth/3D
evaluation; and a data-parallel training stack — all redesigned for TPU
(static shapes, sharded meshes, Pallas kernels).
"""

__version__ = "0.1.0"

from unidepth_tpu.models import UniDepthV1, UniDepthV2, UniDepthV2old  # noqa: F401

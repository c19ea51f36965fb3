from unidepth_tpu.models.unidepthv1.model import UniDepthV1
from unidepth_tpu.models.unidepthv2.model import UniDepthV2
from unidepth_tpu.models.unidepthv2.old import UniDepthV2old

__all__ = ["UniDepthV1", "UniDepthV2", "UniDepthV2old"]

from sdbc_tpu.ops import nn
from sdbc_tpu.ops.attention import attention

__all__ = ["nn", "attention"]

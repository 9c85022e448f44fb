from sdbc_tpu.ops import nn

# NOTE: import the attention entry point as
#   from sdbc_tpu.ops.attention import attention
# It is deliberately NOT re-exported here: `from ... import attention` at
# package level would shadow the `sdbc_tpu.ops.attention` submodule attribute.

__all__ = ["nn"]

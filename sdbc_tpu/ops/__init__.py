from sdbc_tpu.ops import nn

# NOTE: import the attention entry point as
#   from sdbc_tpu.ops.attention import attention
# It is deliberately NOT re-exported here: `from ... import attention` at
# package level would shadow the `sdbc_tpu.ops.attention` submodule attribute.
#
# BENCHMARKING-ONLY code paths (measured SLOWER than the defaults on v5e —
# experiments/PERF_NOTES.md — kept strictly as re-measurement hooks for
# other TPU generations / future Mosaic; no default dispatch reaches them):
#   - flash_attention_tt.py          transposed-layout kernel (SDBC_ATTN_IMPL=flash_tt)
#   - pallas_groupnorm.py            fused GN+SiLU kernel    (SDBC_GN_FUSED=1)
#   - flash_attention._flash_fixed_fwd_int8   int8-QK kernel (never dispatched)
#   - models/unet.py SDBC_MHA=headmajor|fused projection variants

__all__ = ["nn"]

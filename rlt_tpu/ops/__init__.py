from rlt_tpu.ops.attention import multi_head_attention, fused_attention  # noqa: F401

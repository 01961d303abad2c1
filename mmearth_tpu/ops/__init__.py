from .fused_block import fused_block_mlp, fused_block_mlp_reference  # noqa: F401

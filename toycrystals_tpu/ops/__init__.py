from toycrystals_tpu.ops.pad import circular_pad
from toycrystals_tpu.ops.attention import SelfAttention2d

__all__ = ["circular_pad", "SelfAttention2d"]

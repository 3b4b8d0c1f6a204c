from toycrystals_tpu.ops.attention import SelfAttention2d
from toycrystals_tpu.ops.conv import CircularConv
from toycrystals_tpu.ops.pad import circular_pad

__all__ = ["circular_pad", "CircularConv", "SelfAttention2d"]

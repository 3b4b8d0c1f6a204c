from toycrystals_tpu.ops.attention import SelfAttention2d
from toycrystals_tpu.ops.conv import CircularConv

__all__ = ["CircularConv", "SelfAttention2d"]

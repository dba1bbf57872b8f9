"""Multi-device sharded execution (channels x time-blocks over a Mesh)."""

from .sharding import ShardedResampler, chain_input_span, chain_shift_period
from .stream_sharding import ShardedStreamResampler

__all__ = ["ShardedResampler", "ShardedStreamResampler",
           "chain_input_span", "chain_shift_period"]

from .tiling import tile_positions, pad_positions_to_batch

__all__ = ["tile_positions", "pad_positions_to_batch"]

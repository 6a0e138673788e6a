"""CT HU dual-windowing — the model's 2-channel input contract.

Every consumer in the reference applies the same two window transforms
to the (HU+1024)-shifted CT before feeding the net (reference
data.py:286-299 and four other copies; weight_br.py:18-27;
prediction.py:39-49):

  channel 0: clip to [-1024, 1024] HU, map to [0, 1] via (x+1024)/2048
  channel 1: clip to [-1000,  500] HU, map to [0, 1] via (x+1000)/1500

The stored volumes hold `HU + 1024` (preprocessing adds 1024), so the
caller passes `shift=-1024` when reading those; `prediction` mode
volumes are raw HU (shift=0).
"""

import jax
import jax.numpy as jnp


@jax.jit
def hu_dual_window(hu: jnp.ndarray) -> jnp.ndarray:
    """Map an HU volume (..., D, H, W) to two windowed channels (..., 2).

    Returns float32 in [0,1], channels stacked on a new trailing axis
    (NDHWC convention).
    """
    hu = hu.astype(jnp.float32)
    c0 = (jnp.clip(hu, -1024.0, 1024.0) + 1024.0) / 2048.0
    c1 = (jnp.clip(hu, -1000.0, 500.0) + 1000.0) / 1500.0
    return jnp.stack([c0, c1], axis=-1)

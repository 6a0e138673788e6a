from .se_unet import (
    SEUNetConfig,
    apply as se_unet_apply,
    apply_fast as se_unet_apply_fast,
    init_params,
    num_params,
)


def get_model(in_channels: int = 2, n_classes: int = 1, seed: int = 0):
    """Convenience constructor mirroring the reference's get_model()
    (reference SE_UNet.py:240-242): returns (config, params)."""
    import jax

    cfg = SEUNetConfig(in_channels=in_channels, n_classes=n_classes)
    return cfg, init_params(jax.random.key(seed), cfg)


__all__ = [
    "SEUNetConfig",
    "se_unet_apply",
    "se_unet_apply_fast",
    "init_params",
    "num_params",
    "get_model",
]

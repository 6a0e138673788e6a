from .se_unet import SEUNetConfig, init_params, apply as se_unet_apply, num_params

__all__ = ["SEUNetConfig", "init_params", "se_unet_apply", "num_params"]

from .unet2d import UNet2D, UNetConfig, conditional_config, unconditional_config  # noqa: F401


def __getattr__(name):
    if name in ("AutoencoderKL", "VAEConfig"):
        from . import vae

        return getattr(vae, name)
    if name in ("AudioEncoder", "AudioEncoderConfig"):
        from . import audio_encoder

        return getattr(audio_encoder, name)
    if name == "EMA":
        from .ema import EMA

        return EMA
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

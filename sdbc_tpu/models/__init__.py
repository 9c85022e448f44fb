from sdbc_tpu.models import clip, vae, unet

__all__ = ["clip", "vae", "unet"]

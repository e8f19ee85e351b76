from imagefolder_tpu.losses.clip_loss import clip_loss, siglip_loss

__all__ = ["clip_loss", "siglip_loss"]

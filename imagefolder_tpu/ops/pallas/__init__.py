from imagefolder_tpu.ops.pallas.codebook import codebook_argmin

__all__ = ["codebook_argmin"]

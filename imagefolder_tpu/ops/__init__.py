from imagefolder_tpu.ops.resize import resize, resize_matrix

__all__ = ["resize", "resize_matrix"]

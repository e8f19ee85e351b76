from imagefolder_tpu.data.imagenet import (
    ImageFolderSource,
    center_crop_arr,
    device_prefetch,
    list_image_folder,
    make_dataloader,
    random_crop_arr,
)

__all__ = [
    "ImageFolderSource", "center_crop_arr", "device_prefetch",
    "list_image_folder", "make_dataloader", "random_crop_arr",
]

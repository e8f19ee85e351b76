from imagefolder_tpu.models.cnn import Decoder as CNNDecoder
from imagefolder_tpu.models.cnn import Encoder as CNNEncoder
from imagefolder_tpu.models.tokenizer import ModelArgs, TokenizerOut, VQModel, VQ_models
from imagefolder_tpu.models.vit import LatentDecoder, LatentEncoder, ViTBackbone

__all__ = [
    "CNNDecoder", "CNNEncoder", "ModelArgs", "TokenizerOut", "VQModel",
    "VQ_models", "LatentDecoder", "LatentEncoder", "ViTBackbone",
]

"""Model zoo: tokenizer (VQModel), generators (VAR / RAR / MaskGIT), and the
package-level assembly factory (reference ``models/__init__.py:14-65``
``build_vae_var``)."""

from imagefolder_tpu.models.cnn import Decoder as CNNDecoder
from imagefolder_tpu.models.cnn import Encoder as CNNEncoder
from imagefolder_tpu.models.tokenizer import ModelArgs, TokenizerOut, VQModel, VQ_models
from imagefolder_tpu.models.vit import LatentDecoder, LatentEncoder, ViTBackbone

__all__ = [
    "CNNDecoder", "CNNEncoder", "ModelArgs", "TokenizerOut", "VQModel",
    "VQ_models", "LatentDecoder", "LatentEncoder", "ViTBackbone",
    "build_vae_var", "build_rar", "build_maskgit",
]


def build_vae_var(model_args: ModelArgs, depth: int = 16, *,
                  shared_aln: bool = False, attn_l2_norm: bool = True,
                  cond_drop_rate: float = 0.1, num_classes: int = 1000,
                  dtype_str: str = "float32", remat: bool = False):
    """Tokenizer + VAR assembly (reference ``models/__init__.py:14-65``):
    width = 64*depth, heads = depth, drop_path = 0.1 * depth/24, vocab and
    Cvae folded over the PQ branches (xqgan_model.py:123)."""
    from imagefolder_tpu.models.var import VAR, VARConfig

    vae = VQModel(model_args)
    var_cfg = VARConfig(
        vocab_size=model_args.codebook_size * model_args.product_quant,
        Cvae=model_args.codebook_embed_dim * model_args.product_quant,
        product_quant=model_args.product_quant,
        num_classes=num_classes,
        depth=depth, embed_dim=depth * 64, num_heads=depth,
        shared_aln=shared_aln, attn_l2_norm=attn_l2_norm,
        cond_drop_rate=cond_drop_rate,
        drop_path_rate=0.1 * depth / 24,
        patch_nums=tuple(model_args.v_patch_nums),
        dtype_str=dtype_str,
        remat=remat,
    )
    return vae, VAR(var_cfg)


def _rar_seq_len(seq_len, model_args):
    if seq_len is not None:
        return seq_len
    # the tokenizer's flat final-scale token count (VQModel.encode_to_tokens)
    return model_args.num_latent_tokens * model_args.product_quant


def build_rar(model_args: ModelArgs = None, *, seq_len: int = None,
              codebook_size: int = None, hidden: int = 768, depth: int = 24,
              heads: int = 16, num_classes: int = 1000,
              dtype_str: str = "float32", remat: bool = False):
    """RAR over a tokenizer's flat final-scale tokens (reference
    ``utils/train_utils.py:101-143`` create_model_and_loss_module('rar') +
    ``configs/generator/robustTok-rar.yaml`` model keys). Pass the tokenizer
    ``model_args``, or explicit ``seq_len``/``codebook_size`` when training
    from a pretokenized JSONL without the tokenizer."""
    from imagefolder_tpu.models.rar import RAR, RARConfig

    return RAR(RARConfig(
        embed_dim=hidden, depth=depth, num_heads=heads,
        image_seq_len=_rar_seq_len(seq_len, model_args),
        codebook_size=codebook_size or model_args.codebook_size,
        condition_num_classes=num_classes, dtype_str=dtype_str,
        remat=remat))


def build_maskgit(model_args: ModelArgs = None, *, seq_len: int = None,
                  codebook_size: int = None, hidden: int = 768,
                  depth: int = 24, heads: int = 16, num_classes: int = 1000,
                  dtype_str: str = "float32", arch: str = "bert"):
    """MaskGIT generator over the same token layout (reference
    ``utils/train_utils.py`` model_type='maskgit' -> ``RAR/maskgit.py:40``).
    ``arch='uvit'`` selects the UViTBert variant (``RAR/maskgit.py:209``)."""
    from imagefolder_tpu.models.maskgit import MaskGIT, MaskGITConfig

    return MaskGIT(MaskGITConfig(
        embed_dim=hidden, depth=depth, num_heads=heads,
        image_seq_len=_rar_seq_len(seq_len, model_args),
        codebook_size=codebook_size or model_args.codebook_size,
        condition_num_classes=num_classes, dtype_str=dtype_str, arch=arch))

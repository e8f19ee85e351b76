from imagefolder_tpu.train.optim import (
    adamw_with_freezing,
    cosine_with_warmup,
    ema_update,
    lr_wd_annealing,
)
from imagefolder_tpu.train.tokenizer_train import (
    TokenizerTrainConfig,
    TokenizerTrainer,
    TokenizerTrainState,
)

__all__ = [
    "adamw_with_freezing", "cosine_with_warmup", "ema_update",
    "lr_wd_annealing", "TokenizerTrainConfig", "TokenizerTrainer",
    "TokenizerTrainState",
]

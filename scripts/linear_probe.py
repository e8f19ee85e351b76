"""Linear probing of frozen tokenizer features (reference
``tokenizer/tokenizer_image/linear_probing.py`` — which is bit-rotted
upstream; rebuilt here as a working tool): train a linear classifier on
``img_to_sem_feat`` features, report top-1 ACC.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from imagefolder_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--vq_ckpt", required=True)
    ap.add_argument("--data_path", default=None)
    ap.add_argument("--val_data", default=None)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--num_classes", type=int, default=1000)
    args = ap.parse_args()

    from imagefolder_tpu.data.imagenet import make_dataloader
    from imagefolder_tpu.models.tokenizer import VQModel
    from imagefolder_tpu.utils.config import load_tokenizer_config
    from scripts.pretokenize import _load_params

    margs, _, run = load_tokenizer_config(args.config)
    model = VQModel(margs)
    params = _load_params(args.vq_ckpt, model, margs)

    feat_fn = jax.jit(lambda p, x: jnp.mean(
        model.apply({"params": p}, x, method=VQModel.img_to_sem_feat),
        axis=(1, 2)))

    dim = margs.codebook_embed_dim
    key = jax.random.PRNGKey(0)
    w = jnp.zeros((dim, args.num_classes))
    b = jnp.zeros((args.num_classes,))
    tx = optax.adam(args.lr)
    opt = tx.init((w, b))

    @jax.jit
    def step(wb, opt, feats, labels):
        def loss_fn(wb):
            logits = feats @ wb[0] + wb[1]
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

        loss, g = jax.value_and_grad(loss_fn)(wb)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(wb, upd), opt, loss

    train_loader = make_dataloader(args.data_path or run.data_path,
                                   args.batch_size, margs.image_size,
                                   train=True)
    it = iter(train_loader)
    wb = (w, b)
    for i in range(args.steps):
        batch = next(it)
        feats = feat_fn(params, jnp.asarray(batch["image"]))
        wb, opt, loss = step(wb, opt, feats, jnp.asarray(batch["label"]))
        if (i + 1) % 200 == 0:
            print(f"step {i + 1}: loss {float(loss):.4f}")

    val_loader = make_dataloader(args.val_data or run.val_data_path,
                                 args.batch_size, margs.image_size,
                                 train=False, num_epochs=1,
                                 drop_remainder=False)
    correct = total = 0
    for batch in val_loader:
        feats = feat_fn(params, jnp.asarray(batch["image"]))
        pred = np.asarray(jnp.argmax(feats @ wb[0] + wb[1], axis=-1))
        correct += int((pred == np.asarray(batch["label"])).sum())
        total += len(pred)
    print(f"linear-probe ACC: {100.0 * correct / max(total, 1):.2f}% ({total} images)")


if __name__ == "__main__":
    main()

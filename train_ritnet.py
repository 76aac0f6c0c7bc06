#!/usr/bin/env python
"""RITnet training CLI (reference RITnet/train.py:94-193): trains the
DenseNet2D eye-segmentation model on an OpenEDS-style dataset with the
CE + annealed GeneralizedDice + Surface loss, reports per-epoch validation
mIoU, and saves the best model (as an .npz of the JAX params)."""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_with_eye_tracking_tpu.models import (
    ritnet,
    ritnet_data,
    ritnet_train,
)


def save_params_npz(path: str, params):
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params_npz(path: str):
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--dataset", required=True, type=str,
                        help="OpenEDS-style root with train/ and validation/")
    parser.add_argument("--bs", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=250)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--workers", type=int, default=0)
    parser.add_argument("--expname", type=str, default="densenet")
    parser.add_argument("--resume", type=str, default="")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    out_dir = os.path.join("logs", args.expname)
    os.makedirs(out_dir, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    if args.resume:
        params = load_params_npz(args.resume)
    else:
        params = ritnet.init_params(jax.random.PRNGKey(args.seed))
    tx, step = ritnet_train.make_train_step(args.lr)
    opt_state = tx.init(params)

    best_miou = 0.0
    for epoch in range(args.epochs):
        alpha = ritnet_train.alpha_schedule(epoch)
        losses = []
        for batch in ritnet_data.batches(args.dataset, "train", args.bs, rng):
            batch = tuple(jnp.asarray(b) for b in batch)
            params, opt_state, loss = step(params, opt_state, batch, alpha)
            losses.append(float(loss))

        mious = []
        for batch in ritnet_data.batches(args.dataset, "validation", args.bs,
                                         rng, train=False):
            imgs, labels = jnp.asarray(batch[0]), jnp.asarray(batch[1])
            pred = ritnet.get_predictions(ritnet.densenet2d_apply(params, imgs))
            mious.append(float(ritnet_train.miou(pred, labels)))
        val_miou = float(np.mean(mious)) if mious else 0.0
        print(f"Epoch {epoch}: loss={np.mean(losses):.4f} val mIoU={val_miou:.4f} "
              f"alpha={alpha:.2f}")
        save_params_npz(os.path.join(out_dir, "last_model.npz"), params)
        if val_miou >= best_miou:
            best_miou = val_miou
            save_params_npz(os.path.join(out_dir, "best_model.npz"), params)
    print(f"Done. Best val mIoU: {best_miou:.4f}")


if __name__ == "__main__":
    main()

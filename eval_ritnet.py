#!/usr/bin/env python
"""RITnet batch inference CLI (reference RITnet/predict.py + test.py:57-77):
segments a folder of eye images and writes label maps + visualizations,
optionally reporting mIoU when ground-truth labels exist."""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax.numpy as jnp
import numpy as np

from gaussian_splatting_with_eye_tracking_tpu.models import ritnet, ritnet_train
from gaussian_splatting_with_eye_tracking_tpu.utils.image_utils import save_image


def load_params(path: str | None):
    return ritnet.load_pretrained(path)


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--images", required=True, type=str)
    parser.add_argument("--labels", default="", type=str, help="optional GT .npy dir")
    parser.add_argument("--weights", default=None, type=str,
                        help=".npz (ours) or torch .pkl (reference checkpoint); "
                             "default: vendored pretrained weights")
    parser.add_argument("--out_dir", default="ritnet_out", type=str)
    args = parser.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    from PIL import Image

    params = load_params(args.weights)
    mious = []
    for fname in sorted(os.listdir(args.images)):
        if not fname.lower().endswith((".png", ".jpg", ".bmp")):
            continue
        img = np.asarray(Image.open(os.path.join(args.images, fname)).convert("L"))
        h = img.shape[0] - img.shape[0] % 16
        w = img.shape[1] - img.shape[1] % 16
        x = ritnet.preprocess_eye_image(img[:h, :w])
        pred = np.asarray(
            ritnet.get_predictions(ritnet.densenet2d_apply(params, x))
        )[0]
        base = os.path.splitext(fname)[0]
        np.save(os.path.join(args.out_dir, base + "_label.npy"), pred)
        save_image(
            np.stack([pred.astype(np.float32) / 3.0] * 3),
            os.path.join(args.out_dir, base + "_mask.png"),
        )
        if args.labels:
            gt_path = os.path.join(args.labels, base + ".npy")
            if os.path.exists(gt_path):
                gt = np.load(gt_path)[:h, :w]
                mious.append(float(ritnet_train.miou(jnp.asarray(pred), jnp.asarray(gt))))
    if mious:
        print(f"mIoU over {len(mious)} images: {np.mean(mious):.4f}")
    print(f"Wrote predictions to {args.out_dir}")


if __name__ == "__main__":
    main()

"""LPIPS(VGG16) math verification against an independent torch oracle.

Pretrained VGG16 weights cannot be obtained in this environment (zero
egress — see LPIPS_NOTE.md), so the numeric VALUE of the metric cannot be
produced here. What CAN be verified is that the JAX implementation computes
the exact LPIPS(vgg) formula of the reference (lpipsPyTorch/modules/
lpips.py + networks.py): same VGG16 conv/pool/slice topology, same input
shift/scale, same channel-unit-normalization + linear heads + spatial mean
+ layer sum. This test builds a random-weight state_dict in the torch
format metrics_lib.load_weights expects, evaluates LPIPS with an
INDEPENDENT torch reimplementation, and requires the JAX result to match.
With correct math verified, dropping in real weights (LPIPS_WEIGHTS=...)
is the only remaining step, and that is environment-, not code-, blocked.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gaussian_splatting_with_eye_tracking_tpu import metrics_lib


def _random_state_dict(rng):
    sd = {}
    cfg = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
           (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
           (512, 512), (512, 512)]
    for idx, (cin, cout) in zip(metrics_lib._VGG16_CONVS, cfg):
        sd[f"features.{idx}.weight"] = torch.tensor(
            rng.normal(scale=0.1, size=(cout, cin, 3, 3)).astype(np.float32))
        sd[f"features.{idx}.bias"] = torch.tensor(
            rng.normal(scale=0.05, size=(cout,)).astype(np.float32))
    for i, ch in enumerate(metrics_lib._CHANNELS):
        sd[f"lin.{i}.model.1.weight"] = torch.tensor(
            np.abs(rng.normal(scale=0.1, size=(1, ch, 1, 1))).astype(np.float32))
    return sd


def _torch_lpips(x, y, sd):
    """Independent torch evaluation of LPIPS(vgg): torchvision VGG16
    sequential layout (conv/relu with maxpool at 4/9/16/23), slices after
    relu1_2/2_2/3_3/4_3/5_3, lpips shift/scale, unit-normalize, lin, mean."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(t):
        h = (t * 2 - 1 - shift) / scale
        out = []
        conv_i = 0
        for idx in range(31):
            if idx in metrics_lib._POOL_BEFORE:
                h = F.max_pool2d(h, 2, 2)
            if conv_i < 13 and idx == metrics_lib._VGG16_CONVS[conv_i]:
                h = F.conv2d(h, sd[f"features.{idx}.weight"],
                             sd[f"features.{idx}.bias"], padding=1)
                conv_i += 1
            else:
                h = F.relu(h)
            if idx in metrics_lib._SLICE_AFTER_RELU:
                out.append(h)
        return out

    fx, fy = feats(x), feats(y)
    total = torch.zeros(x.shape[0])
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / torch.sqrt((a ** 2).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b ** 2).sum(1, keepdim=True) + 1e-10)
        d = (a - b) ** 2
        lin = sd[f"lin.{i}.model.1.weight"][:, :, 0, 0].view(1, -1, 1, 1)
        total = total + (d * lin).sum(1).mean((1, 2))
    return total


def test_lpips_matches_torch_oracle(tmp_path):
    rng = np.random.default_rng(0)
    sd = _random_state_dict(rng)
    path = tmp_path / "fake_lpips.pth"
    torch.save(sd, path)

    x = rng.uniform(size=(2, 3, 32, 32)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.1, size=x.shape), 0, 1).astype(np.float32)

    want = _torch_lpips(torch.tensor(x), torch.tensor(y), sd).numpy()
    got = np.asarray(metrics_lib.lpips(x, y, weights_path=str(path)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert (got > 0).all()


def test_lpips_npz_roundtrip(tmp_path):
    """The .npz export format loads identically to the torch state_dict."""
    rng = np.random.default_rng(1)
    sd = _random_state_dict(rng)
    path = tmp_path / "fake_lpips.pth"
    torch.save(sd, path)
    w = metrics_lib.load_weights(str(path))
    npz_path = tmp_path / "fake_lpips.npz"
    np.savez(
        npz_path,
        **{f"conv_{i}_w": w.convs[i] for i in range(13)},
        **{f"conv_{i}_b": w.conv_biases[i] for i in range(13)},
        **{f"lin_{i}": w.lins[i] for i in range(5)},
    )
    x = rng.uniform(size=(1, 3, 16, 16)).astype(np.float32)
    y = rng.uniform(size=(1, 3, 16, 16)).astype(np.float32)
    a = np.asarray(metrics_lib.lpips(x, y, weights_path=str(path)))
    b = np.asarray(metrics_lib.lpips(x, y, weights_path=str(npz_path)))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_unavailable_reports_cleanly():
    assert not metrics_lib.lpips_available("/nonexistent/weights.pth")
    with pytest.raises(RuntimeError, match="LPIPS weights unavailable"):
        metrics_lib.lpips(np.zeros((3, 8, 8), np.float32),
                          np.zeros((3, 8, 8), np.float32),
                          weights_path="/nonexistent/weights.pth")

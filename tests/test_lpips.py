"""LPIPS(alex) jax implementation vs a pure-torch reimplementation of
the lpips package's forward pass, using RANDOM weights in the export
schema — validates the conv/pool/normalize/linear-head plumbing so a
real weights drop-in (tools/export_lpips_weights.py) is exact.
Reference use: /root/reference/utils/eval.py:300,409."""
import numpy as np
import pytest

from gaus_slam_tpu.utils.lpips_jax import _ALEX_CFG, _SCALE, _SHIFT, load_lpips

torch = pytest.importorskip("torch")


def _random_weights(path, rng):
    in_ch = 3
    out = {}
    for i, (oc, k, s, p) in enumerate(_ALEX_CFG):
        out[f"conv{i}_w"] = rng.normal(0, 0.1, (oc, in_ch, k, k)) \
            .astype(np.float32)
        out[f"conv{i}_b"] = rng.normal(0, 0.1, (oc,)).astype(np.float32)
        out[f"lin{i}_w"] = rng.uniform(0, 1, (oc,)).astype(np.float32)
        in_ch = oc
    np.savez(path, **out)
    return out


def _torch_lpips(w, x, y):
    import torch.nn.functional as F

    def feats(img):
        h = (torch.tensor(img, dtype=torch.float32)
             - torch.tensor(_SHIFT)) / torch.tensor(_SCALE)
        h = h.permute(2, 0, 1)[None]
        outs = []
        for i, (oc, k, s, p) in enumerate(_ALEX_CFG):
            h = F.conv2d(h, torch.tensor(w[f"conv{i}_w"]),
                         torch.tensor(w[f"conv{i}_b"]), stride=s, padding=p)
            h = F.relu(h)
            if i in (0, 1):
                h = F.max_pool2d(h, 3, stride=2)
            outs.append(h)
        return outs

    fx, fy = feats(x), feats(y)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / a.norm(dim=1, keepdim=True).clamp_min(1e-10)
        b = b / b.norm(dim=1, keepdim=True).clamp_min(1e-10)
        d = (a - b) ** 2
        lin = torch.tensor(w[f"lin{i}_w"]).reshape(1, -1, 1, 1)
        total = total + (d * lin).sum(dim=1).mean()
    return float(total)


def test_lpips_jax_matches_torch(tmp_path):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "w.npz")
    w = _random_weights(path, rng)

    model = load_lpips(path)
    assert model is not None
    x = rng.uniform(0, 1, (64, 80, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)

    got = float(model(x, y))
    want = _torch_lpips(w, x, y)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    assert float(model(x, x)) < 1e-8


def test_lpips_missing_weights_returns_none(monkeypatch):
    monkeypatch.delenv("LPIPS_WEIGHTS", raising=False)
    assert load_lpips("") is None
    assert load_lpips("/nonexistent/w.npz") is None

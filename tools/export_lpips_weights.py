#!/usr/bin/env python
"""Export LPIPS(alex) weights from the torch `lpips` package to the npz
schema consumed by gaus_slam_tpu.utils.lpips_jax.

Run this on a machine with network access / the packages installed:

    pip install lpips torchvision
    python tools/export_lpips_weights.py lpips_alex.npz

then point the SLAM run at the file:

    LPIPS_WEIGHTS=/path/to/lpips_alex.npz python scripts/gaus.py ...

Schema (all float32):
  conv{0..4}_w  AlexNet feature conv kernels, torch OIHW layout
  conv{0..4}_b  biases
  lin{0..4}_w   LPIPS linear-head 1x1 conv weights, squeezed to [C]

Reference use of the torch package: /root/reference/utils/eval.py:300
(`lpips.LPIPS(net='alex')`).
"""
import sys

import numpy as np


def main(out_path: str):
    import lpips as lpips_pkg
    import torch

    model = lpips_pkg.LPIPS(net="alex", spatial=False)
    model.eval()

    out = {}
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] \
        + [m for m in model.net.slice3] + [m for m in model.net.slice4] \
        + [m for m in model.net.slice5]
    convs = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5, len(convs)
    for i, c in enumerate(convs):
        out[f"conv{i}_w"] = c.weight.detach().numpy().astype(np.float32)
        out[f"conv{i}_b"] = c.bias.detach().numpy().astype(np.float32)
    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy().astype(np.float32)
        out[f"lin{i}_w"] = w.reshape(-1)
    np.savez(out_path, **out)
    print(f"wrote {out_path}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_alex.npz")

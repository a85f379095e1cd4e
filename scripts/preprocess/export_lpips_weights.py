"""Export LPIPS(alex) calibration weights to the npz this framework loads.

Run on any host WITH network access and the `lpips` pip package (or a
torchvision checkpoint cache):

    python scripts/preprocess/export_lpips_weights.py \
        --out ~/.cache/dregnerf/lpips_alex.npz

The hermetic TPU image has zero egress, so weights travel as a data file.
Schema consumed by dregnerf_tpu/utils/lpips.py:
  conv{i}.kernel [kh, kw, cin, cout] (HWIO), conv{i}.bias [cout], lin{i} [c].
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=os.path.expanduser(
        "~/.cache/dregnerf/lpips_alex.npz"))
    args = parser.parse_args()

    import lpips as lpips_pkg  # pip install lpips (pulls torchvision alexnet)

    net = lpips_pkg.LPIPS(net="alex", spatial=False).eval()

    out: dict[str, np.ndarray] = {}
    # the lpips package stores alexnet slices as net.net.slice1..slice5
    import torch

    conv_idx = 0
    for s in range(1, 6):
        slice_mod = getattr(net.net, f"slice{s}")
        for layer in slice_mod:
            if isinstance(layer, torch.nn.Conv2d):
                w = layer.weight.detach().numpy()  # [cout, cin, kh, kw]
                out[f"conv{conv_idx}.kernel"] = np.transpose(w, (2, 3, 1, 0))
                out[f"conv{conv_idx}.bias"] = layer.bias.detach().numpy()
                conv_idx += 1
    assert conv_idx == 5, f"expected 5 convs, found {conv_idx}"
    for i in range(5):
        lin = getattr(net, f"lin{i}").model[-1].weight.detach().numpy()
        out[f"lin{i}"] = lin.reshape(-1)  # [1, c, 1, 1] -> [c]

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main()

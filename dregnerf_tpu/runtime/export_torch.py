"""Export checkpoints to the reference's torch `model.pth` layout.

SURVEY.md §5 (checkpoint/resume): the reference stores one flat torch dict
holding model/optimizer state plus self-describing render meta_data
(train_ngp_nerf.py:192-209, checkpoint_manager.py:56-83), and downstream
tools rebuild a NeRF from that artifact alone (confidence_loss.py:16-52).
This exporter writes our npz checkpoints in that layout so reference-side
tooling that reads the META fields (aabb, contraction, step size, camera
poses, ...) interoperates directly.

Parameter TENSORS keep this framework's naming/layout (the packed-grid
encoder is not tcnn's hash table — a byte-level tcnn state_dict cannot
exist), nested under the 'model' key as flat 'a/b/c' names.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from dregnerf_tpu.runtime.checkpoint import load_checkpoint

# meta keys the reference carries in its flat checkpoint dict
_REF_META_KEYS = (
    "aabb", "unbounded", "grid_resolution", "contraction_type",
    "near_plane", "far_plane", "render_step_size", "alpha_thre",
    "cone_angle", "camera_poses", "block_id",
)


def export_reference_pth(ckpt_path: str, out_path: Optional[str] = None) -> str:
    """Convert one npz checkpoint to a reference-style flat `model.pth`.

    Returns the written path (default: alongside the input as model.pth).
    """
    import torch

    flat, meta = load_checkpoint(ckpt_path)
    out: dict = {"step": int(meta.get("step", 0))}

    model = {}
    occupancy = {}
    for name, arr in flat.items():
        t = torch.from_numpy(np.asarray(arr).copy())
        if name.startswith("model::"):
            model[name[len("model::"):].replace("::", "/")] = t
        elif name.startswith("occupancy::"):
            occupancy[name[len("occupancy::"):]] = t
    out["model"] = model
    out["occupancy_grid"] = occupancy

    for k in _REF_META_KEYS:
        if k in meta:
            out[k] = meta[k]
    out["model_config"] = meta.get("model_config", {})
    out["field"] = meta.get("field", "ngp")

    if out_path is None:
        out_path = os.path.join(os.path.dirname(ckpt_path), "model.pth")
    torch.save(out, out_path)
    return out_path


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(
        description="Export npz checkpoints to reference-style model.pth"
    )
    parser.add_argument("checkpoints", nargs="+")
    parser.add_argument("--out", default=None,
                        help="output path (single checkpoint only)")
    args = parser.parse_args()
    if args.out and len(args.checkpoints) > 1:
        raise SystemExit("--out requires exactly one checkpoint")
    for c in args.checkpoints:
        p = export_reference_pth(c, args.out)
        print(f"wrote {p}")


if __name__ == "__main__":
    main()

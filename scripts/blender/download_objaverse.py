"""Download the Objaverse GLBs named in the bundled split JSONs.

Parity with scripts/blender/download_objaverse.py:29-97: resolves object
uids from dregnerf_tpu/datasets/register/obj_id_names.json and fetches the
GLBs with the `objaverse` package (multi-process). Gated: the package and
network egress are unavailable in hermetic environments — the script then
prints the uid list for offline mirroring.
"""
from __future__ import annotations

import argparse
import json
import multiprocessing
import os


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="objaverse_glbs")
    p.add_argument(
        "--split_json",
        default=os.path.join(
            os.path.dirname(__file__), "..", "..", "dregnerf_tpu", "datasets",
            "register", "obj_id_names.json",
        ),
    )
    p.add_argument("--processes", type=int, default=multiprocessing.cpu_count())
    args = p.parse_args()

    with open(args.split_json) as f:
        uid_to_name = json.load(f)
    uids = list(uid_to_name.keys())
    print(f"{len(uids)} objects in split")

    try:
        import objaverse
    except ImportError:
        print("objaverse package unavailable; writing uid list for offline mirror")
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "uids.txt"), "w") as f:
            f.write("\n".join(uids))
        return

    objects = objaverse.load_objects(uids=uids, download_processes=args.processes)
    os.makedirs(args.out, exist_ok=True)
    for uid, path in objects.items():
        dst = os.path.join(args.out, uid_to_name[uid] + ".glb")
        if not os.path.exists(dst):
            os.replace(path, dst)
    print(f"downloaded {len(objects)} GLBs to {args.out}")


if __name__ == "__main__":
    main()

"""Blender (bpy) rendering of Objaverse GLBs to NeRF-style datasets.

Capability parity with the reference scripts/blender/bpy_render_views.py:
1-331: load a GLB, normalize it into the unit box, place an area light,
render N views from randomized upper-hemisphere cameras at 800x800 with
transparent background, and write a transforms.json in the objaverse
format consumed by dregnerf_tpu.datasets.objaverse.

Runs INSIDE Blender:  blender -b -P bpy_render_views.py -- \
    --glb <file.glb> --out <dir> [--views 120] [--resolution 800]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys


def parse_args():
    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--glb", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--views", type=int, default=120)
    p.add_argument("--resolution", type=int, default=800)
    p.add_argument("--camera_dist", type=float, default=3.0)
    p.add_argument("--fov_x", type=float, default=0.8575560450553894)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main():
    import bpy
    from mathutils import Vector

    args = parse_args()
    random.seed(args.seed)
    os.makedirs(args.out, exist_ok=True)

    # clean scene, import, normalize to unit box at origin
    bpy.ops.wm.read_factory_settings(use_empty=True)
    bpy.ops.import_scene.gltf(filepath=args.glb)
    objs = [o for o in bpy.context.scene.objects if o.type == "MESH"]
    mins = Vector((1e9, 1e9, 1e9))
    maxs = Vector((-1e9, -1e9, -1e9))
    for o in objs:
        for v in o.bound_box:
            w = o.matrix_world @ Vector(v)
            mins = Vector(map(min, mins, w))
            maxs = Vector(map(max, maxs, w))
    center = (mins + maxs) / 2
    scale = 1.0 / max(maxs - mins)
    for o in objs:
        o.location = (o.location - center) * scale
        o.scale = o.scale * scale

    # light + camera
    light_data = bpy.data.lights.new("area", type="AREA")
    light_data.energy = 1000
    light = bpy.data.objects.new("area", light_data)
    light.location = (0, 0, 3)
    bpy.context.scene.collection.objects.link(light)

    cam_data = bpy.data.cameras.new("cam")
    cam_data.angle_x = args.fov_x
    cam = bpy.data.objects.new("cam", cam_data)
    bpy.context.scene.collection.objects.link(cam)
    bpy.context.scene.camera = cam

    scene = bpy.context.scene
    scene.render.engine = "CYCLES"
    scene.render.film_transparent = True
    scene.render.resolution_x = args.resolution
    scene.render.resolution_y = args.resolution
    scene.render.image_settings.file_format = "PNG"
    scene.render.image_settings.color_mode = "RGBA"

    frames = []
    for i in range(args.views):
        theta = 2 * math.pi * i / args.views
        phi = math.radians(random.uniform(15, 70))  # upper hemisphere
        loc = Vector(
            (
                args.camera_dist * math.cos(theta) * math.cos(phi),
                args.camera_dist * math.sin(theta) * math.cos(phi),
                args.camera_dist * math.sin(phi),
            )
        )
        cam.location = loc
        direction = -loc.normalized()
        cam.rotation_euler = direction.to_track_quat("-Z", "Y").to_euler()
        bpy.context.view_layer.update()

        name = f"r_{i}"
        scene.render.filepath = os.path.join(args.out, name + ".png")
        bpy.ops.render.render(write_still=True)
        frames.append(
            {
                "file_path": name,
                "transform_matrix": [list(row) for row in cam.matrix_world],
            }
        )

    with open(os.path.join(args.out, "transforms.json"), "w") as f:
        json.dump({"camera_angle_x": args.fov_x, "frames": frames}, f, indent=2)


if __name__ == "__main__":
    main()

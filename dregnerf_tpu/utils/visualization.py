"""Visualization + geometry-export utilities.

Capability parity with the reference's root utils.py and
conerf/visualization/: jet-colormapped scalar images with optional
colorbars (colorize_np, utils.py:73-121), depth visualization
(visualize_depth_numpy, :134), total-variation loss (:261-280), and
SDF-volume -> PLY mesh export (:284, skimage marching_cubes in the
reference; implemented here as marching TETRAHEDRA — same capability,
16-case tables instead of 256 — since skimage isn't in this image).
Camera-pose visualization (conerf/visualization/pose_visualizer.py) is
covered by `plot_cameras`.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def colorize_np(
    x: np.ndarray,
    cmap_name: str = "jet",
    mask: Optional[np.ndarray] = None,
    value_range: Optional[tuple] = None,
) -> np.ndarray:
    """Scalar [H, W] -> float RGB [H, W, 3] via matplotlib colormap."""
    import matplotlib

    x = np.asarray(x, np.float32)
    if value_range is not None:
        vmin, vmax = value_range
    elif mask is not None and mask.any():
        vmin, vmax = float(x[mask].min()), float(x[mask].max())
    else:
        vmin, vmax = float(x.min()), float(x.max())
    norm = np.clip((x - vmin) / max(vmax - vmin, 1e-9), 0.0, 1.0)
    rgb = matplotlib.colormaps[cmap_name](norm)[..., :3].astype(np.float32)
    if mask is not None:
        rgb = rgb * mask[..., None]
    return rgb


def get_vertical_colorbar(
    height: int, vmin: float, vmax: float, cmap_name: str = "jet",
    label: str | None = None, precision: int = 2,
) -> np.ndarray:
    """Render a vertical colorbar strip as an RGB array (reference root
    utils.py:21-71)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import colors as mcolors

    fig, ax = plt.subplots(figsize=(1.2, height / 100), dpi=100)
    norm = mcolors.Normalize(vmin=vmin, vmax=vmax)
    cb = matplotlib.colorbar.ColorbarBase(
        ax, cmap=matplotlib.colormaps[cmap_name], norm=norm
    )
    cb.set_ticks([vmin, (vmin + vmax) / 2, vmax])
    cb.set_ticklabels(
        [f"{v:.{precision}f}" for v in (vmin, (vmin + vmax) / 2, vmax)]
    )
    if label:
        cb.set_label(label)
    fig.tight_layout()
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf


def colorize_with_colorbar(
    x: np.ndarray, cmap_name: str = "jet", label: str | None = None
) -> np.ndarray:
    """colorize_np + appended vertical colorbar (utils.py append_cbar path)."""
    rgb = (colorize_np(x, cmap_name) * 255).astype(np.uint8)
    cbar = get_vertical_colorbar(
        rgb.shape[0], float(np.min(x)), float(np.max(x)), cmap_name, label
    )
    # resize colorbar strip to image height
    if cbar.shape[0] != rgb.shape[0]:
        idx = (np.arange(rgb.shape[0]) * cbar.shape[0] // rgb.shape[0]).clip(
            0, cbar.shape[0] - 1
        )
        cbar = cbar[idx]
    return np.concatenate([rgb, cbar], axis=1)


def visualize_depth_numpy(
    depth: np.ndarray, minmax: Optional[tuple] = None
) -> tuple[np.ndarray, tuple]:
    """Depth map -> uint8 jet RGB (reference utils.py:134-150)."""
    x = np.nan_to_num(depth)
    mi = np.min(x[x > 0]) if (x > 0).any() else 0.0
    ma = np.max(x)
    if minmax is not None:
        mi, ma = minmax
    x = (x - mi) / (ma - mi + 1e-8)
    rgb = (colorize_np(x, "jet") * 255).astype(np.uint8)
    return rgb, (mi, ma)


def tv_loss(x, weight: float = 1.0):
    """Total variation over [B, C, H, W]-style arrays (utils.py:263-280)."""
    import jax.numpy as jnp

    h_tv = jnp.mean((x[..., 1:, :] - x[..., :-1, :]) ** 2)
    w_tv = jnp.mean((x[..., :, 1:] - x[..., :, :-1]) ** 2)
    return weight * 2.0 * (h_tv + w_tv)


def plot_cameras(camtoworlds: np.ndarray, path: str, labels=None, scale: float = 0.1):
    """Save a 3D scatter/quiver of camera poses (pose_visualizer parity)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    centers = camtoworlds[:, :3, 3]
    fwd = -camtoworlds[:, :3, 2]
    c = labels if labels is not None else "b"
    ax.scatter(centers[:, 0], centers[:, 1], centers[:, 2], c=c, s=10)
    ax.quiver(
        centers[:, 0], centers[:, 1], centers[:, 2],
        fwd[:, 0], fwd[:, 1], fwd[:, 2], length=scale, color="r",
    )
    fig.savefig(path, dpi=100)
    plt.close(fig)


# ------------------------- marching tetrahedra (SDF volume -> mesh) ---------
# Each cube splits into 6 tetrahedra; each tet contributes 0-2 triangles.
_TETS = np.array(
    [[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]]
)
_CUBE = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]]
)


def sdf_to_mesh(
    sdf: np.ndarray, level: float = 0.0, origin=(0.0, 0.0, 0.0), spacing=(1.0, 1.0, 1.0)
) -> tuple[np.ndarray, np.ndarray]:
    """Extract the `level` isosurface of a [X, Y, Z] SDF volume.

    Returns (vertices [V, 3], faces [F, 3]). Marching-tetrahedra variant of
    the reference's skimage marching_cubes export (utils.py:284).
    """
    sx, sy, sz = sdf.shape
    cells = np.stack(
        np.meshgrid(np.arange(sx - 1), np.arange(sy - 1), np.arange(sz - 1),
                    indexing="ij"), -1,
    ).reshape(-1, 3)
    corner_pos = cells[:, None, :] + _CUBE[None]  # [C, 8, 3]
    corner_val = sdf[corner_pos[..., 0], corner_pos[..., 1], corner_pos[..., 2]]
    verts_out, faces_out = [], []
    vcount = 0
    for tet in _TETS:
        vals = corner_val[:, tet] - level  # [C, 4]
        pos = corner_pos[:, tet].astype(np.float64)  # [C, 4, 3]
        inside = vals < 0
        n_in = inside.sum(-1)
        for n, flip in [(1, False), (3, True)]:
            m = n_in == n
            if not m.any():
                continue
            v, p, s = vals[m], pos[m], inside[m]
            if flip:
                s = ~s
                # surface orientation handled below via v signs
            one = np.argmax(s, axis=-1)
            others = np.argsort(~s, axis=-1)[:, 1:] if False else None
            tri = []
            for row in range(v.shape[0]):
                o = one[row]
                rest = [k for k in range(4) if k != o]
                pts = []
                for r in rest:
                    a, b = v[row, o], v[row, r]
                    t = a / (a - b) if abs(a - b) > 1e-12 else 0.5
                    pts.append(p[row, o] + t * (p[row, r] - p[row, o]))
                tri.append(pts)
            tri = np.asarray(tri)  # [M, 3, 3]
            verts_out.append(tri.reshape(-1, 3))
            idx = np.arange(tri.shape[0] * 3).reshape(-1, 3) + vcount
            vcount += tri.shape[0] * 3
            faces_out.append(idx)
        # two-inside case: quad -> 2 triangles
        m = n_in == 2
        if m.any():
            v, p, s = vals[m], pos[m], inside[m]
            quads = []
            for row in range(v.shape[0]):
                ins = np.where(s[row])[0]
                outs = np.where(~s[row])[0]
                pts = []
                for i in ins:
                    for o in outs:
                        a, b = v[row, i], v[row, o]
                        t = a / (a - b) if abs(a - b) > 1e-12 else 0.5
                        pts.append(p[row, i] + t * (p[row, o] - p[row, i]))
                # order: (i0,o0),(i0,o1),(i1,o1),(i1,o0)
                quads.append([pts[0], pts[1], pts[3], pts[2]])
            quads = np.asarray(quads)
            tris = np.concatenate([quads[:, [0, 1, 2]], quads[:, [0, 2, 3]]], axis=0)
            verts_out.append(tris.reshape(-1, 3))
            idx = np.arange(tris.shape[0] * 3).reshape(-1, 3) + vcount
            vcount += tris.shape[0] * 3
            faces_out.append(idx)
    if not verts_out:
        return np.zeros((0, 3)), np.zeros((0, 3), int)
    verts = np.concatenate(verts_out)
    faces = np.concatenate(faces_out)
    verts = verts * np.asarray(spacing)[None] + np.asarray(origin)[None]
    return verts, faces


def save_mesh_ply(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """Binary-LE PLY mesh writer (vertex + face elements)."""
    header = [
        "ply", "format binary_little_endian 1.0",
        f"element vertex {len(verts)}",
        "property double x", "property double y", "property double z",
        f"element face {len(faces)}",
        "property list uchar int vertex_indices", "end_header",
    ]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        f.write(np.asarray(verts, "<f8").tobytes())
        rec = np.zeros(len(faces), dtype=[("n", "u1"), ("idx", "<i4", 3)])
        rec["n"] = 3
        rec["idx"] = faces
        f.write(rec.tobytes())

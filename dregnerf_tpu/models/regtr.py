"""NeRFRegTr: NeRF-pair registration network, TPU-native.

Capability parity with conerf/register/nerf_regtr.py:72-248:
  FPN3D over the rgba voxel grid -> trilinear upsample to full grid
  resolution -> select occupied voxels -> hierarchical voxel subsample to
  cap the token count -> sine positional embedding -> 6-layer transformer
  cross-encoder -> correspondence decoder (single-head attention onto the
  other cloud's coordinates + sigmoid overlap) -> per-layer weighted Kabsch
  pose.

TPU redesign (not a port):
  * everything is static-shape: occupied-voxel selection uses a stable
    argsort ("first K occupied"), subsampling keeps fixed capacity with
    validity masks, tokens are padded to `num_tokens` per side;
  * the voxel grid stays in NDHWC (XLA's TPU conv layout); the flat-index
    convention (ix*R^2 + iy*R + iz) matches the reference's voxel_mask
    artifacts (eval_ngp_nerf.py:411, dataset.py:244-248);
  * Kabsch runs in f32 (bf16 SVD is garbage); the rest of the network runs
    in the module dtype.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from dregnerf_tpu.geometry.kabsch import weighted_rigid_transform
from dregnerf_tpu.models.pos_embed import (
    PositionEmbeddingCoordsSine,
    PositionEmbeddingLearned,
)
from dregnerf_tpu.models.resnet3d import FeaturePyramid3D
from dregnerf_tpu.models.transformer import (
    CorrespondenceDecoder,
    TransformerCrossEncoder,
)
from dregnerf_tpu.ops.voxel_subsample import (
    PointSet,
    hierarchical_subsample,
    masked_select_strided,
)


def trilinear_resize(x: jnp.ndarray, size: tuple[int, int, int]) -> jnp.ndarray:
    """[B, D, H, W, C] trilinear resize (F.interpolate parity)."""
    b, _, _, _, c = x.shape
    return jax.image.resize(x, (b, *size, c), method="trilinear")


def gather_trilinear_resized(
    vol: jnp.ndarray, full_size: tuple[int, int, int], idx: jnp.ndarray
) -> jnp.ndarray:
    """`trilinear_resize(vol, full_size)[0].reshape(-1, C)[idx]` without
    materializing the resized volume.

    The dense path writes an [R^3, C] volume (1-2 GB at R=128, C=256) so
    a few thousand occupied-voxel rows can be gathered from it; this
    samples the SAME half-pixel-center trilinear reconstruction (the
    `jax.image.resize` convention, equivalence-tested) at just the
    requested sites: 8 corner gathers of [K, C] from the coarse volume.

    vol: [1, d, h, w, C]; idx: [K] flat full-res indices in
    ix*H*W + iy*W + iz order (the voxel_mask.pt convention).
    """
    _, d, h, w, c = vol.shape
    D, H, W = full_size
    flat = vol.reshape(d * h * w, c)

    iz = idx % W
    iy = (idx // W) % H
    ix = idx // (W * H)

    def axis_coords(i, n_in, n_out):
        cx = (i.astype(jnp.float32) + 0.5) * (n_in / n_out) - 0.5
        f = jnp.floor(cx)
        t = cx - f
        c0 = jnp.clip(f.astype(jnp.int32), 0, n_in - 1)
        c1 = jnp.clip(f.astype(jnp.int32) + 1, 0, n_in - 1)
        return c0, c1, t

    x0, x1, tx = axis_coords(ix, d, D)
    y0, y1, ty = axis_coords(iy, h, H)
    z0, z1, tz = axis_coords(iz, w, W)

    out = jnp.zeros((idx.shape[0], c), jnp.float32)
    for dx, xc, wx in ((0, x0, 1.0 - tx), (1, x1, tx)):
        for dy, yc, wy in ((0, y0, 1.0 - ty), (1, y1, ty)):
            for dz, zc, wz in ((0, z0, 1.0 - tz), (1, z1, tz)):
                rows = flat[(xc * h + yc) * w + zc]
                out = out + rows.astype(jnp.float32) * (wx * wy * wz)[:, None]
    return out.astype(vol.dtype)


class NeRFRegTr(nn.Module):
    pos_emb_type: str = "sine"
    d_model: int = 256
    pos_emb_scaling: float = 1.0
    num_downsample: int = 6
    backbone: str = "resnet50"
    num_layers: int = 6
    num_heads: int = 8
    dim_feedforward: int = 1024
    max_input_points: int = 16384  # cap on occupied voxels entering subsample
    num_tokens: int = 2048  # per-side transformer capacity
    init_subsample_cell: float = 0.05
    max_points: int = 1500  # reference's per-level stop threshold
    dtype: Any = jnp.float32
    # sequence-parallel attention (SURVEY §2.4/§5): set to a
    # jax.sharding.Mesh to run the cross-encoder token-sharded over
    # `sp_axis`; exact equivalence with local attention (tested).
    sp_mesh: Any = None
    sp_axis: str = "data"
    # materialize the full [R^3, D] upsampled FPN volume before voxel
    # selection (the reference's F.interpolate path) instead of sampling
    # the trilinear reconstruction at the selected voxels only. Same
    # values (gather_trilinear_resized is equivalence-tested); the dense
    # path costs 1-2 GB of HBM traffic per side at R=128, D=256.
    dense_resize: bool = False

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """
        Args (batch size 1, squeezed):
          data['src_grid'] / data['tgt_grid']: [R, R, R, 7] voxel features
            (xyz 0:3, rgb 3:6, alpha 6) — the voxel_grid.pt layout.
          data['src_mask'] / data['tgt_mask']: [R^3] bool occupied-voxel
            masks in flat ix*R^2+iy*R+iz order (voxel_mask.pt indices
            scattered to bool).

        Returns dict with per-layer correspondences/overlaps (padded, with
        'src_valid'/'tgt_valid' masks), conditioned features, and
        'pose' [num_layers, 3, 4].
        """
        fpn = FeaturePyramid3D(self.backbone, self.d_model, self.dtype, name="fpn3d")
        if self.pos_emb_type == "sine":
            pos_embed = PositionEmbeddingCoordsSine(
                3, self.d_model, scale=self.pos_emb_scaling, name="pos_embed"
            )
        else:
            pos_embed = PositionEmbeddingLearned(3, self.d_model, name="pos_embed")
        encoder = TransformerCrossEncoder(
            self.num_layers, self.d_model, self.num_heads, self.dim_feedforward,
            self.dtype, sp_mesh=self.sp_mesh, sp_axis=self.sp_axis,
            name="transformer_encoder",
        )
        decoder = CorrespondenceDecoder(self.d_model, self.dtype, name="decoder")

        def side(grid, mask):
            r = grid.shape[0]
            rgba = grid[None, ..., 3:7].astype(self.dtype)  # [1, R, R, R, 4]
            feats = fpn(rgba)  # [1, R/2, R/2, R/2, D]
            xyz_flat = grid[..., :3].reshape(-1, 3)
            # strided (spatially uniform) selection: first-k takes a low-x
            # SLAB when occupied count >> capacity (round-4 fleet: 50-76k
            # occupied vs 16384) and the two sides' slabs cover different
            # object regions — a silent registration-quality killer
            idx, valid = masked_select_strided(mask, self.max_input_points)
            if self.dense_resize:
                up = trilinear_resize(feats, (r, r, r))[0]  # [R, R, R, D]
                sel = up.reshape(-1, self.d_model)[idx]
            else:
                # sample the upsampled field only at the selected voxels
                # (identical reconstruction, no [R^3, D] volume in HBM)
                sel = gather_trilinear_resized(feats, (r, r, r), idx)
            return PointSet(
                xyz=xyz_flat[idx] * valid[:, None],
                feats=sel * valid[:, None],
                valid=valid,
                count=jnp.sum(mask.astype(jnp.int32)),
            )

        src_ps = side(data["src_grid"], data["src_mask"])
        tgt_ps = side(data["tgt_grid"], data["tgt_mask"])

        src_ds, tgt_ds, level = hierarchical_subsample(
            src_ps, tgt_ps, self.num_downsample, self.init_subsample_cell,
            self.max_points,
        )

        # cap per-side tokens (valid entries are already first)
        k = self.num_tokens
        src_xyz = src_ds.xyz[:k][None]  # [1, N, 3]
        tgt_xyz = tgt_ds.xyz[:k][None]
        src_feats = src_ds.feats[:k][None].astype(self.dtype)
        tgt_feats = tgt_ds.feats[:k][None].astype(self.dtype)
        src_valid = src_ds.valid[:k][None]
        tgt_valid = tgt_ds.valid[:k][None]

        src_pe = pos_embed(src_xyz).astype(self.dtype)
        tgt_pe = pos_embed(tgt_xyz).astype(self.dtype)

        src_cond, tgt_cond = encoder(
            src_feats, tgt_feats, src_valid, tgt_valid, src_pe, tgt_pe
        )  # [L, 1, N, D]

        src_corr, tgt_corr, src_overlap, tgt_overlap = decoder(
            src_cond, tgt_cond, src_xyz, tgt_xyz, src_valid, tgt_valid,
            src_pe, tgt_pe,
        )

        # per-layer weighted Kabsch over both-direction correspondences
        L = self.num_layers
        src_xyz_l = jnp.broadcast_to(src_xyz[None], (L, 1, k, 3))
        tgt_xyz_l = jnp.broadcast_to(tgt_xyz[None], (L, 1, k, 3))
        corr_src = jnp.concatenate([src_xyz_l, src_corr.astype(jnp.float32)], axis=-1)
        corr_tgt = jnp.concatenate([tgt_corr.astype(jnp.float32), tgt_xyz_l], axis=-1)
        corr_all = jnp.concatenate([corr_src, corr_tgt], axis=2)  # [L, 1, 2N, 6]
        w = jnp.concatenate(
            [
                src_overlap.astype(jnp.float32) * src_valid[None],
                tgt_overlap.astype(jnp.float32) * tgt_valid[None],
            ],
            axis=2,
        )  # [L, 1, 2N]
        pose = weighted_rigid_transform(
            corr_all[..., :3], corr_all[..., 3:], w
        )  # [L, 1, 3, 4]

        return {
            "src_feats": src_cond,  # [L, 1, N, D]
            "tgt_feats": tgt_cond,
            "src_kp": src_xyz[0],  # [N, 3]
            "tgt_kp": tgt_xyz[0],
            "src_kp_warped": src_corr[:, 0],  # [L, N, 3]
            "tgt_kp_warped": tgt_corr[:, 0],
            "src_overlap": src_overlap[:, 0],  # [L, N]
            "tgt_overlap": tgt_overlap[:, 0],
            "src_valid": src_valid[0],  # [N]
            "tgt_valid": tgt_valid[0],
            "pose": pose[:, 0],  # [L, 3, 4]
            "ds_level": level,
        }

"""3D ResNet backbone + RetinaNet-style 3D FPN in flax (NDHWC).

Capability parity with conerf/model/resnet3d.py:116-227 (ResNet-18/34/50/
101/152 with Conv3d, stem k=5 s=2 + maxpool s=2, 4 stages each s=2 → 5
feature scales) and conerf/model/feature_pyramid_net.py:39-207 (v1 pyramid
for bottleneck nets, v3 for basic nets; returns the finest 256-ch scale).

TPU notes: NDHWC layout (XLA's native conv layout on TPU — channels minor,
feeds the MXU); GroupNorm instead of BatchNorm3d — the reference trains at
batch size 1 where BN statistics degenerate, and GN is batch-independent so
the same program serves train/eval with no mutable state. Convs run in the
module dtype (bf16 on TPU) with f32 params.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


def _norm(dtype):
    def make(c):
        return nn.GroupNorm(num_groups=min(32, c), dtype=dtype)

    return make


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        norm = _norm(self.dtype)
        residual = x
        out = nn.Conv(self.planes, (3, 3, 3), (self.stride,) * 3, padding=1,
                      use_bias=False, dtype=self.dtype)(x)
        out = nn.relu(norm(self.planes)(out))
        out = nn.Conv(self.planes, (3, 3, 3), padding=1, use_bias=False,
                      dtype=self.dtype)(out)
        out = norm(self.planes)(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1, 1), (self.stride,) * 3,
                               use_bias=False, dtype=self.dtype)(x)
            residual = norm(self.planes)(residual)
        return nn.relu(out + residual)


class Bottleneck3D(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        norm = _norm(self.dtype)
        out_ch = self.planes * self.expansion
        residual = x
        out = nn.Conv(self.planes, (1, 1, 1), use_bias=False, dtype=self.dtype)(x)
        out = nn.relu(norm(self.planes)(out))
        out = nn.Conv(self.planes, (3, 3, 3), (self.stride,) * 3, padding=1,
                      use_bias=False, dtype=self.dtype)(out)
        out = nn.relu(norm(self.planes)(out))
        out = nn.Conv(out_ch, (1, 1, 1), use_bias=False, dtype=self.dtype)(out)
        out = norm(out_ch)(out)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = nn.Conv(out_ch, (1, 1, 1), (self.stride,) * 3,
                               use_bias=False, dtype=self.dtype)(x)
            residual = norm(out_ch)(residual)
        return nn.relu(out + residual)


_ARCHS = {
    "resnet18": (BasicBlock3D, (2, 2, 2, 2)),
    "resnet34": (BasicBlock3D, (3, 4, 6, 3)),
    "resnet50": (Bottleneck3D, (3, 4, 6, 3)),
    "resnet101": (Bottleneck3D, (3, 4, 23, 3)),
    "resnet152": (Bottleneck3D, (3, 8, 36, 3)),
}


class ResNet3D(nn.Module):
    """Returns the 5 feature scales (c1..c5) like the reference backbone."""

    arch: str = "resnet50"
    in_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, D, H, W, C]
        block, layer_sizes = _ARCHS[self.arch]
        norm = _norm(self.in_dtype)
        c1 = nn.Conv(64, (5, 5, 5), (2, 2, 2), padding=2, use_bias=False,
                     dtype=self.in_dtype)(x)
        c1 = nn.relu(norm(64)(c1))
        c2 = nn.max_pool(c1, (3, 3, 3), (2, 2, 2), padding=((1, 1),) * 3)
        feats = [c1]
        h = c2
        for planes, n_blocks, stride in [
            (64, layer_sizes[0], 1),
            (128, layer_sizes[1], 2),
            (256, layer_sizes[2], 2),
            (512, layer_sizes[3], 2),
        ]:
            h = block(planes, stride, self.in_dtype)(h)
            for _ in range(n_blocks - 1):
                h = block(planes, 1, self.in_dtype)(h)
            feats.append(h)
        return tuple(feats)  # c1 (1/2), c2 (1/4), c3 (1/8), c4 (1/16), c5 (1/32)


def _upsample_to(x, target_shape):
    """Nearest-neighbor 2x upsample then crop (FPN_v1 _upsample parity)."""
    b, d, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, 1), 2, 2), 2, 3)
    td, th, tw = target_shape
    return x[:, :td, :th, :tw]


class FeaturePyramid3D(nn.Module):
    """Top-down 3D feature pyramid; finest (1/2-res) scale out.

    Arch-conditioned like the reference (feature_pyramid_net.py:182-207):
    bottleneck nets get the v1 pyramid (1x1x1 laterals for c2..c5,
    feature_pyramid_net.py:39-108); basic-block nets get the v3 variant
    (3x3x3 laterals for c1..c3, 1x1x1 for c4/c5,
    feature_pyramid_net.py:111-179). Both share the post-add 3x3x3
    smoothing convs.
    """

    arch: str = "resnet50"
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block, _ = _ARCHS[self.arch]
        v3 = block is BasicBlock3D  # reference's basic-net pyramid choice
        c1, c2, c3, c4, c5 = ResNet3D(self.arch, self.dtype)(x)
        co = self.out_channels
        conv1 = lambda name: nn.Conv(co, (1, 1, 1), dtype=self.dtype, name=name)
        conv3 = lambda name: nn.Conv(co, (3, 3, 3), padding=1, dtype=self.dtype, name=name)
        lateral_mid = conv3 if v3 else conv1  # c2/c3 lateral kind differs

        p5 = conv1("lateral5")(c5)
        p4 = conv1("lateral4")(c4)
        p4 = conv3("smooth4")(_upsample_to(p5, p4.shape[1:4]) + p4)
        p3 = lateral_mid("lateral3")(c3)
        p3 = conv3("smooth3")(_upsample_to(p4, p3.shape[1:4]) + p3)
        p2 = lateral_mid("lateral2")(c2)
        p2 = conv3("smooth2")(_upsample_to(p3, p2.shape[1:4]) + p2)
        p1 = conv3("lateral1")(c1)
        p1 = conv3("smooth1")(_upsample_to(p2, p1.shape[1:4]) + p1)
        return p1  # [B, D/2, H/2, W/2, 256]

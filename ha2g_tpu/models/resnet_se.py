"""Multi-granularity SE-ResNet audio encoder (Hierarchical Audio Learner).

Rebuild of the reference's adapted speaker-verification ResNetSE
(scripts/model/ResNetSE34V2.py, scripts/model/ResNetBlocks.py,
hierarchy_net.py:10-19): a conv stem + 4 SE-ResNet stages over the
(mels=128, frames) log-mel image, tapped at three depths.  PixelShuffle
trades channels for time so all three taps align to the 34-pose frame rate:

  layer2 -> conv(k2, VALID)             -> fc -> feat_low   (B, 34, 32)
  layer3 -> PixelShuffle(2) -> conv(k3) -> fc -> feat_mid   (B, 34, 32)
  layer4 -> PixelShuffle(4) -> conv(k3) -> fc -> feat_high  (B, 34, 32)

A speaker embedding is mapped through an MLP to softmax weights
(B, 3, pose_level) that blend the three granularities into one feature
sequence per hierarchy level (ResNetSE34V2.py:202-212).

TPU notes: NHWC layout throughout (XLA's native conv layout on TPU);
PixelShuffle is a reshape/transpose (einops), free under XLA fusion.
The BN order inside blocks follows the reference exactly
(conv -> relu -> bn for the stem / first block conv; ResNetBlocks.py:24-30).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ha2g_tpu.models.common import BatchNorm, Conv2d, Dense


def _kaiming_normal_conv(key, shape, dtype=jnp.float32):
    """Reference initializes conv weights kaiming_normal(fan_out, relu)
    (ResNetSE34V2.py:89-91).  flax kernel shape (kh, kw, in, out):
    fan_out = out * kh * kw."""
    fan_out = shape[-1] * shape[0] * shape[1]
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class SELayer(nn.Module):
    """Squeeze-and-excitation, reduction 8 (ResNetBlocks.py:81-96)."""

    channels: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))  # (B, C) global average pool
        y = jax.nn.relu(Dense(self.channels // self.reduction)(y))
        y = jax.nn.sigmoid(Dense(self.channels)(y))
        return x * y[:, None, None, :]


class SEBasicBlock(nn.Module):
    """conv3x3 -> relu -> bn -> conv3x3 -> bn -> SE -> +res -> relu
    (ResNetBlocks.py:7-37)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = Conv2d(self.planes, 3, stride=self.stride, padding=1,
                   use_bias=False, kernel_init=_kaiming_normal_conv)(x)
        y = jax.nn.relu(y)
        y = BatchNorm(use_running_average=not train)(y)
        y = Conv2d(self.planes, 3, padding=1, use_bias=False,
                   kernel_init=_kaiming_normal_conv)(y)
        y = BatchNorm(use_running_average=not train)(y)
        y = SELayer(self.planes)(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = Conv2d(self.planes, 1, stride=self.stride,
                              use_bias=False,
                              kernel_init=_kaiming_normal_conv)(x)
            residual = BatchNorm(use_running_average=not train)(residual)
        return jax.nn.relu(y + residual)


class SEBottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 (expansion 4) SE bottleneck (ResNetBlocks.py:40-78).
    Present for API parity — the HA2G config uses SEBasicBlock only."""

    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out_ch = self.planes * self.expansion
        y = Conv2d(self.planes, 1, use_bias=False,
                   kernel_init=_kaiming_normal_conv)(x)
        y = BatchNorm(use_running_average=not train)(y)
        y = jax.nn.relu(y)
        y = Conv2d(self.planes, 3, stride=self.stride, padding=1,
                   use_bias=False, kernel_init=_kaiming_normal_conv)(y)
        y = BatchNorm(use_running_average=not train)(y)
        y = jax.nn.relu(y)
        y = Conv2d(out_ch, 1, use_bias=False,
                   kernel_init=_kaiming_normal_conv)(y)
        y = BatchNorm(use_running_average=not train)(y)
        y = SELayer(out_ch)(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = Conv2d(out_ch, 1, stride=self.stride, use_bias=False,
                              kernel_init=_kaiming_normal_conv)(x)
            residual = BatchNorm(use_running_average=not train)(residual)
        return jax.nn.relu(y + residual)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch nn.PixelShuffle on NHWC: (B, H, W, C*r*r) -> (B, H*r, W*r, C),
    channel-major ordering (c, i, j) as torch."""
    return rearrange(x, "b h w (c i j) -> b (h i) (w j) c", i=r, j=r)


class ResNetSE(nn.Module):
    """Returns (weight, feat_low, feat_mid, feat_high, blend_feats) like the
    reference forward (ResNetSE34V2.py:118-218).  blend_feats is a
    (pose_level, B, T, 32) array (the reference returns a python list).

    Expects the spectrogram as (B, n_mels=128, T_spec) — the loader layout —
    and n_speakers > 0 enables the speaker-conditioned blending path.
    """

    pose_level: int = 3
    n_out: int = 32
    n_speakers: int = 0
    layers: Sequence[int] = (3, 4, 6, 3)
    filters: Sequence[int] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, spec: jnp.ndarray, vid_indices: Optional[jnp.ndarray],
                 train: bool = False):
        B = spec.shape[0]
        x = spec[..., None]  # (B, 128, T, 1) NHWC

        # stem: conv -> relu -> bn (ResNetSE34V2.py:127-129)
        x = Conv2d(self.filters[0], 3, padding=1,
                   kernel_init=_kaiming_normal_conv)(x)
        x = jax.nn.relu(x)
        x = BatchNorm(use_running_average=not train)(x)

        def stage(x, planes, blocks, stride):
            x = SEBasicBlock(planes, stride)(x, train=train)
            for _ in range(1, blocks):
                x = SEBasicBlock(planes, 1)(x, train=train)
            return x

        x = stage(x, self.filters[0], self.layers[0], 1)       # layer1
        feat1 = stage(x, self.filters[1], self.layers[1], 2)   # layer2
        feat2 = stage(feat1, self.filters[2], self.layers[2], 2)  # layer3
        feat3 = stage(feat2, self.filters[3], self.layers[3], 2)  # layer4

        def tap(feat, shuffle, conv_ch, conv_k):
            """conv -> relu -> bn -> fold (C,H) into features -> fc
            (ResNetSE34V2.py:157-186)."""
            if shuffle > 1:
                feat = pixel_shuffle(feat, shuffle)
            feat = Conv2d(conv_ch, conv_k)(feat)  # VALID padding
            feat = jax.nn.relu(feat)
            feat = BatchNorm(use_running_average=not train)(feat)
            # torch reshape(B, C*H, W).transpose -> (B, W, C*H); our layout is
            # (B, H, W, C) so fold (C, H) preserving torch's channel-major order
            feat = rearrange(feat, "b h w c -> b w (c h)")
            return Dense(self.n_out)(feat)  # (B, W, 32)

        feat_low = tap(feat1, 1, 64, 2)
        feat_mid = tap(feat2, 2, 32, 3)
        feat_high = tap(feat3, 4, 16, 3)

        if self.n_speakers > 0:
            assert vid_indices is not None
            table = self.param(
                "speaker_embedding",
                nn.initializers.normal(stddev=1.0), (self.n_speakers, 16))
            z = Dense(16)(jnp.take(table, vid_indices, axis=0))
            h = jax.nn.elu(z)
            h = jax.nn.elu(Dense(32)(h))
            w = Dense(3 * self.pose_level)(h).reshape(B, 3, self.pose_level)
            weight = jax.nn.softmax(w, axis=1)  # softmax over the 3 scales
            # blend: (B, 3, L) x 3 feats -> (L, B, T, 32)
            stacked = jnp.stack([feat_low, feat_mid, feat_high], axis=1)
            blend = jnp.einsum("bsl,bstf->lbtf", weight, stacked)
        else:
            weight = None
            blend = None

        return weight, feat_low, feat_mid, feat_high, blend

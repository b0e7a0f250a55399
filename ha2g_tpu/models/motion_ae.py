"""Plain conv motion autoencoder — the TED Expressive FGD feature extractor.

Rebuild of scripts/model/motion_ae.py: PoseEncoderConv to a 128-d latent (no
variational head) + PoseDecoderConv, hard-wired to 34-frame windows like the
reference (motion_ae.py:86-92, 122-123).
"""

from __future__ import annotations

import jax
import flax.linen as nn
from einops import rearrange

from ha2g_tpu.models.common import (BatchNorm, Conv1d, ConvNormRelu1d, Dense,
                                    leaky_relu)
from ha2g_tpu.ops.precision import resolve


class MotionEncoderConv(nn.Module):
    """(B, 34, pose_dim) -> (B, latent_dim)  (motion_ae.py:33-62)."""

    latent_dim: int = 128

    @nn.compact
    def __call__(self, poses, train: bool = False):
        x = ConvNormRelu1d(32)(poses, train=train)
        x = ConvNormRelu1d(64)(x, train=train)
        x = ConvNormRelu1d(64, downsample=True)(x, train=train)
        x = Conv1d(32, 3)(x)
        x = rearrange(x, "b t c -> b (c t)")  # 384 for 34 frames
        x = Dense(256)(x)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 1.0)  # LeakyReLU(True) quirk (motion_ae.py:48)
        x = Dense(128)(x)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 1.0)
        return Dense(self.latent_dim)(x)


class MotionDecoderConv(nn.Module):
    """(B, latent_dim) -> (B, 34, pose_dim)  (motion_ae.py:64-116)."""

    pose_dim: int
    latent_dim: int = 128

    @nn.compact
    def __call__(self, feat, train: bool = False):
        x = Dense(64)(feat)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 1.0)
        x = Dense(136)(x)
        x = rearrange(x, "b (c t) -> b t c", c=4)
        x = nn.ConvTranspose(32, (3,), padding="VALID",
                             dtype=resolve(None))(x)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 0.2)
        x = nn.ConvTranspose(32, (3,), padding="VALID",
                             dtype=resolve(None))(x)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 0.2)
        x = Conv1d(32, 3)(x)
        x = Conv1d(self.pose_dim, 3)(x)
        return x


class MotionAE(nn.Module):
    """(B, 34, pose_dim) -> (recon, latent)  (motion_ae.py:118-130)."""

    pose_dim: int
    latent_dim: int = 128

    @nn.compact
    def __call__(self, poses, train: bool = False):
        poses = poses.reshape(poses.shape[0], poses.shape[1], -1)
        z = MotionEncoderConv(self.latent_dim)(poses, train=train)
        pred = MotionDecoderConv(self.pose_dim, self.latent_dim)(z, train=train)
        return pred, z

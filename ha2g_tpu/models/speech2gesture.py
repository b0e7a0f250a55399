"""Speech2Gesture baseline (Ginosar et al. CVPR'19 reimplementation).

Rebuild of scripts/model/speech2gesture.py: a 2D conv stack over the
spectrogram, bilinear resize to the pose frame rate, a 1D conv U-Net, and an
LS-GAN patch discriminator on pose differences.

The reference emulates TensorFlow "SAME" padding in torch (Conv1d_tf /
Conv2d_tf, speech2gesture.py:9-103); XLA's native 'SAME' padding IS the TF
rule, so the wrappers collapse to padding='SAME' here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ha2g_tpu.models.common import (BatchNorm, Dense, leaky_relu,
                                    torch_kaiming_uniform, _bias_init_for)
from ha2g_tpu.ops.precision import resolve


class ConvNormRelu(nn.Module):
    """conv('SAME') -> BN -> LeakyReLU(0.2)  (speech2gesture.py:106-128)."""

    features: int
    is_2d: bool = False
    downsample: bool = False
    k: int | None = None
    s: int | None = None
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.k if self.k is not None else (4 if self.downsample else 3)
        s = self.s if self.s is not None else (2 if self.downsample else 1)
        ks = (k, k) if self.is_2d else (k,)
        st = (s, s) if self.is_2d else (s,)
        fan_in = x.shape[-1] * (k * k if self.is_2d else k)
        x = nn.Conv(self.features, ks, strides=st, padding=self.padding,
                    kernel_init=torch_kaiming_uniform,
                    bias_init=_bias_init_for(fan_in),
                    dtype=resolve(None))(x)
        x = BatchNorm(use_running_average=not train)(x)
        return leaky_relu(x, 0.2)


class UnetUp(nn.Module):
    """repeat-interleave x2 upsample + skip add + conv
    (speech2gesture.py:131-141)."""

    features: int

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x1 = jnp.repeat(x1, 2, axis=1)[:, :x2.shape[1]]
        return ConvNormRelu(self.features)(x1 + x2, train=train)


class AudioEncoder(nn.Module):
    """Spectrogram (B, 128, T_spec) -> (B, n_frames, 256) via 2D convs +
    bilinear resize + 1D U-Net (speech2gesture.py:144-197)."""

    n_frames: int

    @nn.compact
    def __call__(self, spec, train: bool = False):
        x = spec[..., None]  # (B, 128, T, 1) NHWC
        x = ConvNormRelu(64, is_2d=True)(x, train=train)
        x = ConvNormRelu(64, is_2d=True, downsample=True)(x, train=train)
        x = ConvNormRelu(128, is_2d=True)(x, train=train)
        x = ConvNormRelu(128, is_2d=True, downsample=True)(x, train=train)
        x = ConvNormRelu(256, is_2d=True)(x, train=train)
        x = ConvNormRelu(256, is_2d=True, downsample=True)(x, train=train)
        x = ConvNormRelu(256, is_2d=True)(x, train=train)
        x = ConvNormRelu(256, is_2d=True, padding="VALID")(x, train=train)

        # torch Upsample((n_frames, 1), bilinear, align_corners=False) on
        # (B, C, H, W); our layout (B, H, W, C).  antialias=False: torch's
        # Upsample never low-pass-filters, even on the downscaled width
        # axis (W' -> 1), and jax's default antialias=True changes those
        # values by ~1e-3 (caught by test_s2g_generator_import_parity)
        x = jax.image.resize(x, (x.shape[0], self.n_frames, 1, x.shape[3]),
                             method="bilinear", antialias=False)
        x1 = x[:, :, 0, :]  # (B, n_frames, 256)

        # sequential form: in `A()(B()(x))` python constructs A before B,
        # so flax would name the OUTER module ConvNormRelu_8 while the
        # inner one runs first — breaking checkpoint import name order
        x2 = ConvNormRelu(256)(x1, train=train)
        x2 = ConvNormRelu(256)(x2, train=train)
        x3 = ConvNormRelu(256, downsample=True)(x2, train=train)
        x4 = ConvNormRelu(256, downsample=True)(x3, train=train)
        x5 = ConvNormRelu(256, downsample=True)(x4, train=train)
        x6 = ConvNormRelu(256, downsample=True)(x5, train=train)
        x7 = ConvNormRelu(256, downsample=True)(x6, train=train)
        x = UnetUp(256)(x7, x6, train=train)
        x = UnetUp(256)(x, x5, train=train)
        x = UnetUp(256)(x, x4, train=train)
        x = UnetUp(256)(x, x3, train=train)
        x = UnetUp(256)(x, x2, train=train)
        return x


class Generator(nn.Module):
    """(B, 128, T_spec) + (B, n_pre, pose_dim) -> (B, n_poses, pose_dim)
    (speech2gesture.py:200-231)."""

    n_poses: int
    pose_dim: int
    n_pre_poses: int

    @nn.compact
    def __call__(self, in_spec, pre_poses, train: bool = False):
        audio = AudioEncoder(self.n_poses)(in_spec, train=train)
        pre = pre_poses.reshape(pre_poses.shape[0], -1)
        pre = Dense(32)(pre)
        pre = BatchNorm(use_running_average=not train)(pre)
        pre = jax.nn.relu(pre)
        pre = Dense(16)(pre)
        pre = jnp.broadcast_to(pre[:, None, :],
                               (pre.shape[0], self.n_poses, 16))
        feat = jnp.concatenate([audio, pre], axis=2)
        feat = ConvNormRelu(256)(feat, train=train)
        feat = ConvNormRelu(256)(feat, train=train)
        feat = ConvNormRelu(256)(feat, train=train)
        feat = ConvNormRelu(256)(feat, train=train)
        return nn.Conv(self.pose_dim, (1,),
                       kernel_init=torch_kaiming_uniform,
                       bias_init=_bias_init_for(256),
                       dtype=resolve(None))(feat)


class Discriminator(nn.Module):
    """LS-GAN patch discriminator on pose differences
    (speech2gesture.py:234-250)."""

    @nn.compact
    def __call__(self, poses, train: bool = False):
        x = poses[:, 1:] - poses[:, :-1]
        x = nn.Conv(64, (4,), strides=(2,), padding="SAME",
                    kernel_init=torch_kaiming_uniform,
                    bias_init=_bias_init_for(x.shape[-1] * 4),
                    dtype=resolve(None))(x)
        x = leaky_relu(x, 0.2)
        x = ConvNormRelu(128, downsample=True)(x, train=train)
        x = ConvNormRelu(256, k=4, s=1)(x, train=train)
        return nn.Conv(1, (4,), padding="SAME",
                       kernel_init=torch_kaiming_uniform,
                       bias_init=_bias_init_for(256 * 4),
                       dtype=resolve(None))(x)

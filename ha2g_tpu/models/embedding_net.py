"""Joint text/audio/pose embedding network and the TED-Gesture FGD embedder.

Rebuild of scripts/model/embedding_net.py: conv pose encoder to a 32-d latent
(with optional variational head), FC / GRU / Conv decoders, the text+audio
context encoder, and the EmbeddingNet wrapper that switches the decode source
between 'speech' / 'pose' / 'random'.

``EmbeddingNet(mode='pose')`` is the gesture_autoencoder config — the frozen
FGD feature extractor for TED Gesture (embedding_space_evaluator.py:27-30).

Layout note: the reference flattens conv features channel-major
((B, C, T) -> (B, C*T)); we keep NWC internally and fold with the same
channel-major order so FC dimensions line up with the reference's
hard-coded Linear(384, 256) for 34 frames (embedding_net.py:55).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ha2g_tpu.models.common import (BatchNorm, Conv1d, ConvNormRelu1d, Dense,
                                    leaky_relu, reparameterize)
from ha2g_tpu.models.multimodal_context import WavEncoder
from ha2g_tpu.models.tcn import TextEncoderTCN
from ha2g_tpu.ops.gru import GRU
from ha2g_tpu.ops.precision import resolve


class PoseEncoderConv(nn.Module):
    """(B, T=34, dim) -> 32-d latent (+ mu, logvar)
    (embedding_net.py:42-82)."""

    latent_dim: int = 32

    @nn.compact
    def __call__(self, poses, variational: bool = False, train: bool = False):
        x = ConvNormRelu1d(32)(poses, train=train)
        x = ConvNormRelu1d(64)(x, train=train)
        x = ConvNormRelu1d(64, downsample=True)(x, train=train)
        x = Conv1d(32, 3)(x)                       # (B, 12, 32) for T=34
        x = rearrange(x, "b t c -> b (c t)")       # channel-major flatten
        x = Dense(256)(x)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 1.0)  # LeakyReLU(True) quirk (embedding_net.py:57)
        x = Dense(128)(x)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 1.0)
        x = Dense(self.latent_dim)(x)
        mu = Dense(self.latent_dim)(x)
        logvar = Dense(self.latent_dim)(x)
        if variational:
            z = reparameterize(self.make_rng("noise"), mu, logvar)
        else:
            z = mu
        return z, mu, logvar


class PoseDecoderConv(nn.Module):
    """32-d latent -> (B, n_frames, dim) via FC pre-net + transposed convs
    (embedding_net.py:165-217).  Both reference pre-net branches are
    rebuilt: 34 frames (Linear 64 -> 136, the shipped configs) and
    64 frames (Linear 128 -> 256, embedding_net.py:180-186)."""

    pose_dim: int
    n_frames: int = 34
    use_pre_poses: bool = False

    @nn.compact
    def __call__(self, feat, pre_poses=None, train: bool = False):
        if self.use_pre_poses:
            pre = pre_poses.reshape(pre_poses.shape[0], -1)
            pre = Dense(32)(pre)
            pre = BatchNorm(use_running_average=not train)(pre)
            pre = jax.nn.relu(pre)
            pre = Dense(32)(pre)
            feat = jnp.concatenate([pre, feat], axis=1)

        pre_widths = {34: (64, 136), 64: (128, 256)}
        assert self.n_frames in pre_widths, "reference supports 34/64 frames"
        w_hidden, w_out = pre_widths[self.n_frames]
        x = Dense(w_hidden)(feat)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 1.0)  # LeakyReLU(True) quirk
        x = Dense(w_out)(x)
        x = rearrange(x, "b (c t) -> b t c", c=4)  # torch view(B, 4, T)

        x = nn.ConvTranspose(32, (3,), padding="VALID",
                             dtype=resolve(None))(x)  # T -> T+2
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 0.2)
        x = nn.ConvTranspose(32, (3,), padding="VALID",
                             dtype=resolve(None))(x)  # T+2 -> T+4
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 0.2)
        x = Conv1d(32, 3)(x)                                # T+4 -> T+2
        x = Conv1d(self.pose_dim, 3)(x)                     # T+2 -> T
        return x


class PoseDecoderGRU(nn.Module):
    """latent + pre-pose feature -> repeated input -> bi-GRU -> poses
    (embedding_net.py:130-162)."""

    pose_dim: int
    n_frames: int
    hidden_size: int = 300

    @nn.compact
    def __call__(self, latent_code, pre_poses, train: bool = False):
        B = pre_poses.shape[0]
        pre = pre_poses.reshape(B, -1)
        pre = Dense(32)(pre)
        pre = BatchNorm(use_running_average=not train)(pre)
        pre = jax.nn.relu(pre)
        pre = Dense(32)(pre)
        feat = jnp.concatenate([pre, latent_code], axis=1)
        feat = jnp.broadcast_to(feat[:, None, :],
                                (B, self.n_frames, feat.shape[-1]))
        out, _ = GRU(hidden_size=self.hidden_size, n_layers=4,
                     bidirectional=True, dropout=0.3)(
            feat, deterministic=not train)
        out = out[..., :self.hidden_size] + out[..., self.hidden_size:]
        out = Dense(self.hidden_size // 2)(out)
        out = leaky_relu(out, 1.0)  # LeakyReLU(True) quirk
        return Dense(self.pose_dim)(out)


class ContextEncoder(nn.Module):
    """text + audio -> 32-d variational context latent
    (embedding_net.py:220-259)."""

    n_words: int
    word_embed_dim: int = 300
    hidden_size: int = 300
    n_layers: int = 4
    word_embeddings: Optional[jnp.ndarray] = None

    @nn.compact
    def __call__(self, in_text, in_audio, train: bool = False):
        det = not train
        text_feat = TextEncoderTCN(
            n_words=self.n_words, embed_dim=self.word_embed_dim,
            hidden_size=self.hidden_size, n_layers=self.n_layers,
            embeddings=self.word_embeddings)(in_text, deterministic=det)
        audio_feat = WavEncoder()(in_audio, train=train)
        x = jnp.concatenate([audio_feat, text_feat], axis=2)
        out, _ = GRU(hidden_size=256, n_layers=2)(x, deterministic=det)
        last = out[:, -1]
        h = Dense(128)(last)
        h = BatchNorm(use_running_average=not train)(h)
        h = jax.nn.relu(h)
        h = Dense(32)(h)
        mu = Dense(32)(h)
        logvar = Dense(32)(h)
        z = reparameterize(self.make_rng("noise"), mu, logvar)
        return z, mu, logvar


class EmbeddingNet(nn.Module):
    """mode='pose': conv AE (the FGD embedder / gesture_autoencoder config).
    Otherwise: context encoder + pose encoder + GRU decoder, decode source
    selected per call (embedding_net.py:262-308)."""

    pose_dim: int
    n_frames: int
    mode: str = "pose"
    n_words: int = 0
    word_embed_dim: int = 300
    word_embeddings: Optional[jnp.ndarray] = None

    @nn.compact
    def __call__(self, in_text, in_audio, pre_poses, poses,
                 input_mode: Optional[str] = None,
                 variational_encoding: bool = False, train: bool = False):
        mode = input_mode or self.mode

        context_feat = context_mu = context_logvar = None
        if self.mode != "pose" and in_text is not None and in_audio is not None:
            context_feat, context_mu, context_logvar = ContextEncoder(
                n_words=self.n_words, word_embed_dim=self.word_embed_dim,
                word_embeddings=self.word_embeddings)(
                in_text, in_audio, train=train)

        poses_feat = pose_mu = pose_logvar = None
        if poses is not None:
            poses_feat, pose_mu, pose_logvar = PoseEncoderConv()(
                poses, variational=variational_encoding, train=train)

        if mode == "random":
            # reference flips a python coin per batch (embedding_net.py:296);
            # we flip a traced coin for jit-ability
            coin = jax.random.bernoulli(self.make_rng("noise"), 0.5)
            latent = jnp.where(coin, context_feat, poses_feat)
        elif mode == "speech":
            latent = context_feat
        else:
            latent = poses_feat

        if self.mode == "pose":
            out_poses = PoseDecoderConv(self.pose_dim, self.n_frames)(
                latent, train=train)
        else:
            out_poses = PoseDecoderGRU(self.pose_dim, self.n_frames)(
                latent, pre_poses, train=train)

        return (context_feat, context_mu, context_logvar,
                poses_feat, pose_mu, pose_logvar, out_poses)


class PoseDecoderFC(nn.Module):
    """Pure-FC pose decoder (embedding_net.py:85-127).  Present for API
    parity — the shipped configs use the GRU/Conv decoders."""

    pose_dim: int
    gen_length: int
    use_pre_poses: bool = False

    @nn.compact
    def __call__(self, latent_code, pre_poses=None, train: bool = False):
        feat = latent_code
        if self.use_pre_poses:
            pre = pre_poses.reshape(pre_poses.shape[0], -1)
            pre = Dense(32)(pre)
            pre = BatchNorm(use_running_average=not train)(pre)
            pre = jax.nn.relu(pre)
            pre = Dense(32)(pre)
            feat = jnp.concatenate([pre, feat], axis=1)
        for width in (128, 128, 256, 512):
            feat = Dense(width)(feat)
            feat = BatchNorm(use_running_average=not train)(feat)
            feat = jax.nn.relu(feat)
        out = Dense(self.gen_length * self.pose_dim)(feat)
        return out.reshape(-1, self.gen_length, self.pose_dim)

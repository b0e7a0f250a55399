"""Hierarchical Pose Inferer: per-level generator cell + conv discriminator.

Rebuild of scripts/model/hierarchy_net.py:

* ``HierarchicalWavEncoder`` — thin wrapper over ResNetSE (hierarchy_net.py:10-19).
* ``HierarchicalPoseGenerator`` — one level's decoder cell
  (hierarchy_net.py:55-149): input = [pre_seq(level_dim+1), audio feat 32,
  text feat 32, speaker z 16] -> 4-layer bi-GRU(300), summed directions ->
  MLP -> level_dim.  Each cell owns its own TCN text encoder, as in the
  reference (hierarchy_net.py:70).  The speaker embedding is VAE-style
  reparameterized (hierarchy_net.py:114-123).
* ``ConvDiscriminator`` — conv stack + 4-layer bi-GRU + two linear heads +
  sigmoid (hierarchy_net.py:197-242).  The reference hard-codes
  ``Linear(28, 1)`` assuming 34-frame windows; we derive 28 = n_poses - 6
  from the three VALID k3 convs.

The cross-level cascade (target extraction, pre-seq carry) lives in
ha2g_tpu/train/cascade.py, driven by SkeletonSpec routing tables.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ha2g_tpu.models.common import (BatchNorm, Conv1d, Dense, leaky_relu,
                                    reparameterize)
from ha2g_tpu.models.resnet_se import ResNetSE
from ha2g_tpu.models.tcn import TextEncoderTCN
from ha2g_tpu.ops.gru import GRU


class HierarchicalWavEncoder(nn.Module):
    """(B, 128, T_spec) log-mel + (B,) speaker ids ->
    (weight, feat_low, feat_mid, feat_high, blend (L, B, T, 32))."""

    pose_level: int
    n_speakers: int = 0
    n_out: int = 32

    @nn.compact
    def __call__(self, spec, vid_indices, train: bool = False):
        return ResNetSE(pose_level=self.pose_level, n_out=self.n_out,
                        n_speakers=self.n_speakers)(spec, vid_indices,
                                                    train=train)


class SpeakerZ(nn.Module):
    """Speaker id -> (z, mu, logvar) via embedding + reparameterization
    (hierarchy_net.py:76-82, 114-123).  z_type='random' draws N(0, I)."""

    n_speakers: int
    z_size: int = 16
    z_type: str = "speaker"  # speaker | random | none

    @nn.compact
    def __call__(self, vid_indices, batch: int, deterministic: bool = False):
        if self.z_type == "none":
            return None, None, None
        if self.z_type == "random":
            rng = self.make_rng("noise")
            return jax.random.normal(rng, (batch, self.z_size)), None, None
        table = self.param("embedding", nn.initializers.normal(stddev=1.0),
                           (self.n_speakers, self.z_size))
        z = Dense(self.z_size)(jnp.take(table, vid_indices, axis=0))
        mu = Dense(self.z_size)(z)
        logvar = Dense(self.z_size)(z)
        z = reparameterize(self.make_rng("noise"), mu, logvar)
        return z, mu, logvar


class HierarchicalPoseGenerator(nn.Module):
    """One hierarchy level's decoder cell."""

    pose_dim: int          # this level's dir-vec dim
    n_words: int
    n_speakers: int
    word_embed_dim: int = 300
    hidden_size: int = 300
    n_layers: int = 4
    dropout: float = 0.3
    # embedding dropout stays at the reference's fixed 0.1
    # (hierarchy_net.py:25 emb_dropout default) independent of
    # dropout_prob; exposed for determinism-sensitive tests
    emb_dropout: float = 0.1
    z_type: str = "speaker"
    input_context: str = "both"
    freeze_wordembed: bool = False
    word_embeddings: Optional[jnp.ndarray] = None
    # Pallas fused GRU recurrence (ops/pallas_gru.py): opt-in for the
    # latency-bound single-stream synthesis path (B <= 8); param layout
    # is identical so checkpoints are interchangeable
    use_pallas_gru: bool = False

    @nn.compact
    def __call__(self, pre_seq, in_text, audio_feat_seq, vid_indices,
                 train: bool = False):
        """pre_seq (B, T, pose_dim+1); in_text (B, T) int tokens;
        audio_feat_seq (B, T, 32); vid_indices (B,) ->
        (out (B, T, pose_dim), z, z_mu, z_logvar)."""
        B, T, _ = pre_seq.shape
        det = not train

        text_feat_seq = TextEncoderTCN(
            n_words=self.n_words, embed_dim=self.word_embed_dim,
            hidden_size=self.hidden_size, n_layers=self.n_layers,
            dropout=self.dropout, emb_dropout=self.emb_dropout,
            freeze=self.freeze_wordembed,
            embeddings=self.word_embeddings)(in_text, deterministic=det)

        z, z_mu, z_logvar = SpeakerZ(self.n_speakers,
                                     z_type=self.z_type)(
            vid_indices, B, deterministic=det)

        if self.input_context == "both":
            in_data = jnp.concatenate([pre_seq, audio_feat_seq,
                                       text_feat_seq], axis=2)
        elif self.input_context == "audio":
            in_data = jnp.concatenate([pre_seq, audio_feat_seq], axis=2)
        elif self.input_context == "text":
            in_data = jnp.concatenate([pre_seq, text_feat_seq], axis=2)
        else:
            in_data = pre_seq
        if z is not None:
            in_data = jnp.concatenate(
                [in_data, jnp.broadcast_to(z[:, None, :], (B, T, z.shape[-1]))],
                axis=2)

        out, _ = GRU(hidden_size=self.hidden_size, n_layers=self.n_layers,
                     bidirectional=True, dropout=self.dropout,
                     use_pallas=self.use_pallas_gru)(
            in_data, deterministic=det)
        out = out[..., :self.hidden_size] + out[..., self.hidden_size:]
        # out MLP: Linear -> LeakyReLU(0.01; `inplace=True` site,
        # hierarchy_net.py:89-93) -> Linear
        out = Dense(self.hidden_size // 2)(out)
        out = leaky_relu(out, 0.01)
        out = Dense(self.pose_dim)(out)
        return out, z, z_mu, z_logvar


class ConvDiscriminator(nn.Module):
    """Conv stack -> 4-layer bi-GRU(64) -> per-step linear -> Linear(T-6, 1)
    -> sigmoid.  `slope` is 0.01 for the hierarchy variant
    (hierarchy_net.py:203-211, LeakyReLU(inplace=True)) and 1.0 (identity,
    the torch LeakyReLU(True) quirk) for the multimodal-context variant
    (multimodal_context_net.py:213-221)."""

    hidden_size: int = 64
    slope: float = 0.01
    dropout: float = 0.3   # reference GRU dropout (hierarchy_net.py:207)

    @nn.compact
    def __call__(self, poses, train: bool = False):
        x = Conv1d(16, 3)(poses)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, self.slope)
        x = Conv1d(8, 3)(x)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, self.slope)
        x = Conv1d(8, 3)(x)

        out, _ = GRU(hidden_size=self.hidden_size, n_layers=4,
                     bidirectional=True, dropout=self.dropout)(
            x, deterministic=not train)
        out = out[..., :self.hidden_size] + out[..., self.hidden_size:]
        out = Dense(1)(out)[..., 0]       # (B, T-6)
        out = Dense(1)(out)               # Linear(28, 1) for 34 frames
        return jax.nn.sigmoid(out)


class GRUDiscriminator(nn.Module):
    """Bi-GRU discriminator over pose sequences with optional text
    conditioning (hierarchy_net.py:153-194, multimodal_context_net.py:
    163-204).  Present for API parity — no reference driver wires it."""

    hidden_size: int = 300
    n_layers: int = 4
    dropout: float = 0.3
    n_poses: int = 34
    n_words: int = 0
    word_embed_dim: int = 300

    @nn.compact
    def __call__(self, poses, in_text=None, train: bool = False):
        x = poses
        if self.n_words and in_text is not None:
            text_feat = TextEncoderTCN(
                n_words=self.n_words, embed_dim=self.word_embed_dim,
                hidden_size=self.hidden_size, n_layers=self.n_layers)(
                in_text, deterministic=not train)
            x = jnp.concatenate([x, text_feat], axis=2)
        out, _ = GRU(hidden_size=self.hidden_size, n_layers=self.n_layers,
                     bidirectional=True, dropout=self.dropout)(
            x, deterministic=not train)
        out = out[..., :self.hidden_size] + out[..., self.hidden_size:]
        out = Dense(1)(out)[..., 0]     # (B, T)
        out = Dense(1)(out)             # Linear(n_poses, 1)
        return jax.nn.sigmoid(out)

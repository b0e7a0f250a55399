"""Trimodal-context GAN baseline (Yoon et al. 2020).

Rebuild of scripts/model/multimodal_context_net.py: a raw-waveform conv
encoder, the shared TCN text encoder, a speaker-z conditioned bi-GRU pose
generator, and the conv discriminator.

The reference's separate GRU ``Discriminator`` (multimodal_context_net.py:163)
is dead code — no driver instantiates it — so only the ConvDiscriminator path
is rebuilt (shared with the hierarchy model, slope 1.0 variant).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ha2g_tpu.models.common import BatchNorm, Conv1d, Dense, leaky_relu
from ha2g_tpu.models.hierarchy import SpeakerZ
from ha2g_tpu.models.tcn import TextEncoderTCN
from ha2g_tpu.ops.gru import GRU


class WavEncoder(nn.Module):
    """Raw 16 kHz waveform -> (B, 34, 32) frame-rate features via 4 strided
    convs (multimodal_context_net.py:9-28).  36267 samples -> 34 frames
    (strides 5*6*6*6, pad 1600)."""

    @nn.compact
    def __call__(self, wav, train: bool = False):
        x = wav[..., None]  # (B, n_samples, 1)
        x = Conv1d(16, 15, stride=5, padding=1600)(x)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 0.3)
        x = Conv1d(32, 15, stride=6)(x)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 0.3)
        x = Conv1d(64, 15, stride=6)(x)
        x = BatchNorm(use_running_average=not train)(x)
        x = leaky_relu(x, 0.3)
        x = Conv1d(32, 15, stride=6)(x)
        return x  # (B, 34, 32)


class PoseGenerator(nn.Module):
    """pre_seq + audio + text + speaker z -> bi-GRU -> pose sequence
    (multimodal_context_net.py:64-160)."""

    pose_dim: int
    n_words: int
    n_speakers: int
    word_embed_dim: int = 300
    hidden_size: int = 300
    n_layers: int = 4
    dropout: float = 0.3
    # reference keeps the TCN's embedding dropout at its fixed 0.1 default
    # (multimodal_context_net.py TextEncoderTCN); exposed for tests
    emb_dropout: float = 0.1
    z_type: str = "speaker"
    input_context: str = "both"
    freeze_wordembed: bool = False
    word_embeddings: Optional[jnp.ndarray] = None

    @nn.compact
    def __call__(self, pre_seq, in_text, in_audio, vid_indices,
                 train: bool = False):
        B, T, _ = pre_seq.shape
        det = not train

        audio_feat_seq = text_feat_seq = None
        if self.input_context != "none":
            audio_feat_seq = WavEncoder()(in_audio, train=train)
            text_feat_seq = TextEncoderTCN(
                n_words=self.n_words, embed_dim=self.word_embed_dim,
                hidden_size=self.hidden_size, n_layers=self.n_layers,
                dropout=self.dropout, emb_dropout=self.emb_dropout,
                freeze=self.freeze_wordembed,
                embeddings=self.word_embeddings)(in_text, deterministic=det)

        z, z_mu, z_logvar = SpeakerZ(self.n_speakers, z_type=self.z_type)(
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
                     bidirectional=True, dropout=self.dropout)(
            in_data, deterministic=det)
        out = out[..., :self.hidden_size] + out[..., self.hidden_size:]
        out = Dense(self.hidden_size // 2)(out)
        # LeakyReLU(True) call site == slope 1.0 (multimodal_context_net.py:102)
        out = leaky_relu(out, 1.0)
        out = Dense(self.pose_dim)(out)
        return out, z, z_mu, z_logvar

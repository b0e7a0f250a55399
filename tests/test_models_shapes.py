"""Shape checks for the model library (the reference's inline smoke-mains,
SURVEY.md section 4, promoted to real tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ha2g_tpu.models.embedding_net import EmbeddingNet, PoseEncoderConv
from ha2g_tpu.models.hierarchy import (ConvDiscriminator,
                                       HierarchicalPoseGenerator,
                                       HierarchicalWavEncoder)
from ha2g_tpu.models.motion_ae import MotionAE
from ha2g_tpu.models.multimodal_context import PoseGenerator, WavEncoder
from ha2g_tpu.models.tcn import TextEncoderTCN

B, T, N_WORDS, N_SPK = 2, 34, 50, 7
SPEC_T = 70
AUDIO_LEN = int(round(T / 15 * 16000))  # 36267


def _rngs():
    k = jax.random.PRNGKey(0)
    return {"params": k, "dropout": jax.random.fold_in(k, 1),
            "noise": jax.random.fold_in(k, 2)}


def test_text_encoder_tcn_shape():
    m = TextEncoderTCN(n_words=N_WORDS, hidden_size=32, n_layers=2)
    tokens = jnp.zeros((B, T), dtype=jnp.int32)
    vars_ = m.init(_rngs(), tokens)
    out = m.apply(vars_, tokens)
    assert out.shape == (B, T, 32)


def test_wav_encoder_34_frames():
    m = WavEncoder()
    wav = jnp.zeros((B, AUDIO_LEN))
    vars_ = m.init(_rngs(), wav)
    out = m.apply(vars_, wav)
    assert out.shape == (B, 34, 32)


@pytest.mark.parametrize("pose_level", [3, 6])
def test_hierarchical_wav_encoder(pose_level):
    m = HierarchicalWavEncoder(pose_level=pose_level, n_speakers=N_SPK)
    spec = jnp.zeros((B, 128, SPEC_T))
    vids = jnp.zeros((B,), dtype=jnp.int32)
    vars_ = m.init(_rngs(), spec, vids)
    weight, lo, mid, hi, blend = m.apply(vars_, spec, vids)
    assert weight.shape == (B, 3, pose_level)
    assert lo.shape == mid.shape == hi.shape == (B, 34, 32)
    assert blend.shape == (pose_level, B, 34, 32)
    # blending weights are a softmax over the three granularities
    np.testing.assert_allclose(np.asarray(weight.sum(axis=1)), 1.0, atol=1e-5)


def test_hierarchical_pose_generator():
    pose_dim = 15  # level-1 TED Gesture
    m = HierarchicalPoseGenerator(pose_dim=pose_dim, n_words=N_WORDS,
                                  n_speakers=N_SPK, hidden_size=64, n_layers=2)
    pre_seq = jnp.zeros((B, T, pose_dim + 1))
    tokens = jnp.zeros((B, T), dtype=jnp.int32)
    audio = jnp.zeros((B, T, 32))
    vids = jnp.zeros((B,), dtype=jnp.int32)
    vars_ = m.init(_rngs(), pre_seq, tokens, audio, vids)
    out, z, mu, logvar = m.apply(vars_, pre_seq, tokens, audio, vids,
                                 rngs=_rngs())
    assert out.shape == (B, T, pose_dim)
    assert z.shape == mu.shape == logvar.shape == (B, 16)


def test_conv_discriminator():
    m = ConvDiscriminator()
    poses = jnp.zeros((B, T, 27))
    vars_ = m.init(_rngs(), poses)
    out = m.apply(vars_, poses)
    assert out.shape == (B, 1)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


def test_multimodal_pose_generator():
    m = PoseGenerator(pose_dim=27, n_words=N_WORDS, n_speakers=N_SPK,
                      hidden_size=64, n_layers=2)
    pre_seq = jnp.zeros((B, T, 28))
    tokens = jnp.zeros((B, T), dtype=jnp.int32)
    wav = jnp.zeros((B, AUDIO_LEN))
    vids = jnp.zeros((B,), dtype=jnp.int32)
    vars_ = m.init(_rngs(), pre_seq, tokens, wav, vids)
    out, z, mu, logvar = m.apply(vars_, pre_seq, tokens, wav, vids,
                                 rngs=_rngs())
    assert out.shape == (B, T, 27)


def test_pose_encoder_flatten_is_384():
    m = PoseEncoderConv()
    poses = jnp.zeros((B, 34, 27))
    vars_ = m.init(_rngs(), poses)
    z, mu, logvar = m.apply(vars_, poses)
    assert z.shape == (B, 32)


def test_embedding_net_pose_mode_roundtrip():
    m = EmbeddingNet(pose_dim=27, n_frames=34, mode="pose")
    poses = jnp.zeros((B, 34, 27))
    vars_ = m.init(_rngs(), None, None, None, poses)
    (_, _, _, feat, mu, logvar, recon) = m.apply(
        vars_, None, None, None, poses, rngs=_rngs())
    assert feat.shape == (B, 32)
    assert recon.shape == (B, 34, 27)


def test_pose_decoder_conv_64_frames():
    # the reference's 64-frame pre-net branch (embedding_net.py:180-186)
    from ha2g_tpu.models.embedding_net import PoseDecoderConv
    m = PoseDecoderConv(pose_dim=27, n_frames=64)
    latent = jnp.zeros((B, 32))
    vars_ = m.init(_rngs(), latent)
    out = m.apply(vars_, latent)
    assert out.shape == (B, 64, 27)


def test_motion_ae_roundtrip():
    m = MotionAE(pose_dim=126, latent_dim=128)
    poses = jnp.zeros((B, 34, 126))
    vars_ = m.init(_rngs(), poses)
    recon, z = m.apply(vars_, poses)
    assert recon.shape == (B, 34, 126)
    assert z.shape == (B, 128)


def test_seq2seq_net():
    from ha2g_tpu.models.seq2seq import Seq2SeqNet
    m = Seq2SeqNet(pose_dim=27, n_frames=8, n_words=N_WORDS, hidden_size=16,
                   n_layers=2, n_pre_poses=4)
    tokens = jnp.zeros((B, 6), dtype=jnp.int32)
    lengths = jnp.array([6, 3])
    poses = jnp.zeros((B, 8, 27))
    vids = jnp.zeros((B,), dtype=jnp.int32)
    vars_ = m.init(_rngs(), tokens, lengths, poses, vids)
    out = m.apply(vars_, tokens, lengths, poses, vids)
    assert out.shape == (B, 8, 27)


def test_speech2gesture_generator_and_discriminator():
    from ha2g_tpu.models.speech2gesture import Discriminator, Generator
    g = Generator(n_poses=34, pose_dim=27, n_pre_poses=4)
    spec = jnp.zeros((B, 128, SPEC_T))
    pre = jnp.zeros((B, 4, 27))
    vars_ = g.init(_rngs(), spec, pre)
    out = g.apply(vars_, spec, pre)
    assert out.shape == (B, 34, 27)

    d = Discriminator()
    dvars = d.init(_rngs(), out)
    dout = d.apply(dvars, out)
    assert dout.shape[0] == B and dout.shape[2] == 1


def test_masked_bigru_matches_torch_packed():
    """Packed-sequence parity: our masked encoder vs torch pack/pad_packed."""
    import torch
    from ha2g_tpu.models.seq2seq import MaskedBiGRUEncoder
    torch.manual_seed(3)
    B_, T_, E, H = 3, 6, 5, 4
    lengths = [6, 4, 2]
    tgru = torch.nn.GRU(E, H, num_layers=1, bidirectional=True)
    emb = torch.randn(21, E)
    tokens = torch.randint(0, 21, (B_, T_))
    x = emb[tokens]  # (B, T, E)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x.transpose(0, 1), lengths)
    with torch.no_grad():
        out_p, h_p = tgru(packed)
    out_pad, _ = torch.nn.utils.rnn.pad_packed_sequence(out_p, total_length=T_)
    want = (out_pad[:, :, :H] + out_pad[:, :, H:]).transpose(0, 1).numpy()

    m = MaskedBiGRUEncoder(n_words=21, embed_dim=E, hidden_size=H, n_layers=1,
                           embeddings=jnp.asarray(emb.numpy()))
    params = {
        "embedding": jnp.asarray(emb.numpy()),
        "w_ih_l0": jnp.stack([jnp.asarray(tgru.weight_ih_l0.detach().numpy().T),
                              jnp.asarray(tgru.weight_ih_l0_reverse.detach().numpy().T)]),
        "w_hh_l0": jnp.stack([jnp.asarray(tgru.weight_hh_l0.detach().numpy().T),
                              jnp.asarray(tgru.weight_hh_l0_reverse.detach().numpy().T)]),
        "b_ih_l0": jnp.stack([jnp.asarray(tgru.bias_ih_l0.detach().numpy()),
                              jnp.asarray(tgru.bias_ih_l0_reverse.detach().numpy())]),
        "b_hh_l0": jnp.stack([jnp.asarray(tgru.bias_hh_l0.detach().numpy()),
                              jnp.asarray(tgru.bias_hh_l0_reverse.detach().numpy())]),
    }
    got, h_n = m.apply({"params": params}, jnp.asarray(tokens.numpy()),
                       jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_n), h_p.numpy(), atol=1e-5)


def test_gru_discriminator_shape():
    from ha2g_tpu.models.hierarchy import GRUDiscriminator
    m = GRUDiscriminator(hidden_size=16, n_layers=2, n_poses=T,
                         n_words=N_WORDS)
    poses = jnp.zeros((B, T, 27))
    tokens = jnp.zeros((B, T), jnp.int32)
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, poses, tokens)
    out = m.apply(vars_, poses, tokens)
    assert out.shape == (B, 1)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


def test_pose_decoder_fc_shape():
    from ha2g_tpu.models.embedding_net import PoseDecoderFC
    m = PoseDecoderFC(pose_dim=27, gen_length=30, use_pre_poses=True)
    latent = jnp.zeros((B, 32))
    pre = jnp.zeros((B, 4, 27))
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, latent, pre)
    out = m.apply(vars_, latent, pre)
    assert out.shape == (B, 30, 27)


def test_se_bottleneck_shape():
    from ha2g_tpu.models.resnet_se import SEBottleneck
    m = SEBottleneck(planes=8, stride=2)
    x = jnp.zeros((B, 16, 12, 4))
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(vars_, x)
    assert out.shape == (B, 8, 6, 32)

"""Reference-checkpoint importer validation: random-weight torch mirrors
(state-dict key names matching the reference) -> import_torch converters ->
full forward equivalence against the flax modules."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ha2g_tpu import import_torch as it
from tests import torch_mirrors as tm

N_WORDS, N_SPK = 11, 5
HID, NL = 16, 2
B, T = 2, 34


def _randomize_bn(module):
    """Non-trivial running stats so the stats mapping is actually tested."""
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)


def test_text_encoder_forward_parity():
    torch.manual_seed(0)
    tmodel = tm.TorchTextEncoderTCN(N_WORDS, 300, HID, NL).eval()
    tokens = torch.randint(0, N_WORDS, (B, T))
    with torch.no_grad():
        want = tmodel(tokens).numpy()

    from ha2g_tpu.models.tcn import TextEncoderTCN
    params = it.convert_text_encoder(tmodel.state_dict(), NL)
    m = TextEncoderTCN(n_words=N_WORDS, embed_dim=300, hidden_size=HID,
                       n_layers=NL)
    got = m.apply({"params": params}, jnp.asarray(tokens.numpy()),
                  deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_generator_forward_parity():
    torch.manual_seed(1)
    pose_dim = 15
    tmodel = tm.TorchHierGenerator(pose_dim, N_WORDS, N_SPK, HID, NL).eval()
    # freeze the speaker z at mu (std ~ exp(-50) = 0) on both sides
    with torch.no_grad():
        tmodel.speaker_logvar.weight.zero_()
        tmodel.speaker_logvar.bias.fill_(-100.0)
    pre = torch.randn(B, T, pose_dim + 1) * 0.3
    tokens = torch.randint(0, N_WORDS, (B, T))
    audio = torch.randn(B, T, 32) * 0.3
    vids = torch.randint(0, N_SPK, (B,))
    with torch.no_grad():
        want, _, want_mu, _ = tmodel(pre, tokens, audio, vids)

    from ha2g_tpu.models.hierarchy import HierarchicalPoseGenerator
    params = it.convert_generator(tmodel.state_dict(), NL)
    m = HierarchicalPoseGenerator(pose_dim=pose_dim, n_words=N_WORDS,
                                  n_speakers=N_SPK, hidden_size=HID,
                                  n_layers=NL)
    out, z, mu, logvar = m.apply(
        {"params": params}, jnp.asarray(pre.numpy()),
        jnp.asarray(tokens.numpy()), jnp.asarray(audio.numpy()),
        jnp.asarray(vids.numpy()), train=False,
        rngs={"noise": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(mu), want_mu.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), want.numpy(), atol=1e-4)


def test_audio_encoder_forward_parity():
    torch.manual_seed(2)
    tmodel = tm.TorchResNetSE(N_SPK, pose_level=3).eval()
    _randomize_bn(tmodel)
    spec = torch.randn(B, 128, 70)
    vids = torch.randint(0, N_SPK, (B,))
    with torch.no_grad():
        w_t, lo_t, mid_t, hi_t, blends_t = tmodel(spec, vids)

    from ha2g_tpu.models.hierarchy import HierarchicalWavEncoder
    params, stats = it.convert_audio_encoder(tmodel.state_dict())
    m = HierarchicalWavEncoder(pose_level=3, n_speakers=N_SPK)
    w, lo, mid, hi, blend = m.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(spec.numpy()), jnp.asarray(vids.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(w), w_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lo), lo_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(mid), mid_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(hi), hi_t.numpy(), atol=2e-4)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(blend[i]),
                                   blends_t[i].numpy(), atol=2e-4)


def test_discriminator_forward_parity():
    torch.manual_seed(3)
    tmodel = tm.TorchConvDiscriminator(27).eval()
    _randomize_bn(tmodel)
    poses = torch.randn(B, T, 27) * 0.3
    with torch.no_grad():
        want = tmodel(poses).numpy()

    from ha2g_tpu.models.hierarchy import ConvDiscriminator
    params, stats = it.convert_discriminator(tmodel.state_dict())
    m = ConvDiscriminator(slope=0.01)
    got = m.apply({"params": params, "batch_stats": stats},
                  jnp.asarray(poses.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_full_checkpoint_roundtrip(tmp_path):
    """torch.save a reference-format checkpoint dict -> load + import into
    a HierarchyState -> the full 3-level eval cascade matches the torch
    mirrors running the reference cascade routing."""
    torch.manual_seed(4)
    from ha2g_tpu.config import Config
    from ha2g_tpu.train.hierarchy import HierarchySystem

    dims = (15, 21, 27)
    t_gens = []
    for d in dims:
        g = tm.TorchHierGenerator(d, N_WORDS, N_SPK, HID, NL).eval()
        with torch.no_grad():
            g.speaker_logvar.weight.zero_()
            g.speaker_logvar.bias.fill_(-100.0)
        t_gens.append(g)
    t_audio = tm.TorchResNetSE(N_SPK, pose_level=3).eval()
    t_dis = tm.TorchConvDiscriminator(27).eval()
    t_text = tm.TorchTextEncoderTCN(N_WORDS, 300, HID, NL).eval()
    _randomize_bn(t_audio)

    ckpt = {"args": {"note": "mirror"}, "epoch": 7, "pose_dim": 27,
            "gen_dict_1": t_gens[0].state_dict(),
            "gen_dict_2": t_gens[1].state_dict(),
            "gen_dict_3": t_gens[2].state_dict(),
            "audio_dict": t_audio.state_dict(),
            "dis_dict": t_dis.state_dict(),
            "text_dict": t_text.state_dict()}
    path = tmp_path / "ref_checkpoint.bin"
    torch.save(ckpt, path)

    cfg = Config(model="hierarchy", dataset="ted_gesture", pose_dim=27,
                 n_poses=T, hidden_size=HID, n_layers=NL, z_type="speaker")
    system = HierarchySystem(cfg, n_words=N_WORDS, n_speakers=N_SPK)
    rng = np.random.default_rng(0)
    batch = {
        "text": jnp.asarray(rng.integers(0, N_WORDS, (B, T))),
        "spec": jnp.asarray(rng.normal(size=(B, 128, 70)).astype(np.float32)),
        "target": jnp.asarray(
            rng.normal(size=(B, T, 27)).astype(np.float32) * 0.2),
        "vids": jnp.asarray(rng.integers(0, N_SPK, (B,))),
    }
    state = system.init(jax.random.PRNGKey(0), batch)
    loaded = it.load_reference_checkpoint(str(path))
    state = it.import_hierarchy_checkpoint(loaded, state, n_layers=NL)

    # ours: full eval cascade
    outs, targets, *_ = system._forward_cascade(
        state.params, state.batch_stats, batch, jax.random.PRNGKey(1),
        train=False)

    # torch: the reference eval cascade routing (train.py:376-415)
    with torch.no_grad():
        spec_t = torch.from_numpy(np.asarray(batch["spec"]))
        vids_t = torch.from_numpy(np.asarray(batch["vids"]))
        toks_t = torch.from_numpy(np.asarray(batch["text"]))
        tgt = torch.from_numpy(np.asarray(batch["target"]))
        _, _, _, _, blends = t_audio(spec_t, vids_t)
        t1 = torch.cat((tgt[:, :, :12], tgt[:, :, 18:21]), dim=2)
        t2 = torch.cat((tgt[:, :, :15], tgt[:, :, 18:24]), dim=2)

        def pre(tk, npre=4):
            ps = torch.zeros(tk.shape[0], tk.shape[1], tk.shape[2] + 1)
            ps[:, :npre, :-1] = tk[:, :npre]
            ps[:, :npre, -1] = 1
            return ps

        p1 = pre(t1)
        o1, *_ = t_gens[0](p1, toks_t, blends[0], vids_t)
        p2 = pre(t2)
        p2[:, 4:, :12] = o1[:, 4:, :12]
        p2[:, 4:, 15:18] = o1[:, 4:, 12:15]
        o2, *_ = t_gens[1](p2, toks_t, blends[1], vids_t)
        p3 = pre(tgt)
        p3[:, 4:, :15] = o2[:, 4:, :15]
        p3[:, 4:, 18:24] = o2[:, 4:, 15:21]
        o3, *_ = t_gens[2](p3, toks_t, blends[2], vids_t)

    np.testing.assert_allclose(np.asarray(outs[0]), o1.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(outs[1]), o2.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(outs[2]), o3.numpy(), atol=5e-4)


def test_embedding_net_pose_import_parity():
    """FGD-embedder import: features and reconstructions must match, so FGD
    computed with an imported eval net is comparable to the reference's."""
    torch.manual_seed(5)
    tmodel = tm.TorchEmbeddingNetPose(27).eval()
    _randomize_bn(tmodel)
    poses = torch.randn(B, 34, 27) * 0.3
    with torch.no_grad():
        want_recon, want_z = tmodel(poses)

    from ha2g_tpu import import_torch as it2
    from ha2g_tpu.models.embedding_net import EmbeddingNet
    params, stats = it2.convert_embedding_net_pose(tmodel.state_dict())
    m = EmbeddingNet(pose_dim=27, n_frames=34, mode="pose")
    (_, _, _, feat, mu, _, recon) = m.apply(
        {"params": params, "batch_stats": stats}, None, None, None,
        jnp.asarray(poses.numpy()), input_mode="pose",
        variational_encoding=False, train=False)
    np.testing.assert_allclose(np.asarray(feat), want_z.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(recon), want_recon.numpy(),
                               atol=2e-4)


def test_motion_ae_import_parity():
    torch.manual_seed(6)
    tmodel = tm.TorchMotionAE(126, 128).eval()
    _randomize_bn(tmodel)
    poses = torch.randn(B, 34, 126) * 0.3
    with torch.no_grad():
        want_recon, want_z = tmodel(poses)

    from ha2g_tpu import import_torch as it2
    from ha2g_tpu.models.motion_ae import MotionAE
    params, stats = it2.convert_motion_ae(tmodel.state_dict())
    m = MotionAE(pose_dim=126, latent_dim=128)
    recon, z = m.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(poses.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(z), want_z.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(recon), want_recon.numpy(),
                               atol=2e-4)


def test_multimodal_generator_import_parity():
    torch.manual_seed(7)
    pose_dim = 27
    tmodel = tm.TorchMultimodalGenerator(pose_dim, N_WORDS, N_SPK, HID,
                                         NL).eval()
    _randomize_bn(tmodel)
    with torch.no_grad():
        tmodel.speaker_logvar.weight.zero_()
        tmodel.speaker_logvar.bias.fill_(-100.0)
    pre = torch.randn(B, T, pose_dim + 1) * 0.3
    tokens = torch.randint(0, N_WORDS, (B, T))
    wav = torch.randn(B, int(round(T / 15 * 16000))) * 0.1
    vids = torch.randint(0, N_SPK, (B,))
    with torch.no_grad():
        want, *_ = tmodel(pre, tokens, wav, vids)

    from ha2g_tpu import import_torch as it2
    from ha2g_tpu.models.multimodal_context import PoseGenerator
    params, stats = it2.convert_multimodal_generator(tmodel.state_dict(), NL)
    m = PoseGenerator(pose_dim=pose_dim, n_words=N_WORDS, n_speakers=N_SPK,
                      hidden_size=HID, n_layers=NL)
    out, *_ = m.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(pre.numpy()), jnp.asarray(tokens.numpy()),
                      jnp.asarray(wav.numpy()), jnp.asarray(vids.numpy()),
                      train=False, rngs={"noise": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(out), want.numpy(), atol=2e-4)


def test_seq2seq_import_parity():
    """seq2seq gen_dict import (train_utils.py:197-213 family): forward
    parity through the full autoregressive decode."""
    torch.manual_seed(8)
    pose_dim = 27
    tmodel = tm.TorchSeq2SeqNet(pose_dim, T, N_WORDS, 300, HID, NL,
                                n_pre_poses=4, n_speakers=N_SPK).eval()
    _randomize_bn(tmodel)
    rng = np.random.default_rng(8)
    # packed-sequence semantics: lengths sorted decreasing like the
    # reference collate (lmdb_data_loader.py word_seq sort)
    tokens = torch.from_numpy(rng.integers(1, N_WORDS, (B, 12)))
    lengths = torch.tensor([12, 9])
    for b, ln in enumerate(lengths):
        tokens[b, ln:] = 0
    poses = torch.randn(B, T, pose_dim) * 0.2
    vids = torch.randint(0, N_SPK, (B,))
    with torch.no_grad():
        want = tmodel(tokens, lengths, poses, vids).numpy()

    from ha2g_tpu.import_torch import convert_seq2seq
    from ha2g_tpu.models.seq2seq import Seq2SeqNet
    params, stats = convert_seq2seq(tmodel.state_dict(), NL)
    m = Seq2SeqNet(pose_dim=pose_dim, n_frames=T, n_words=N_WORDS,
                   word_embed_dim=300, hidden_size=HID, n_layers=NL,
                   n_pre_poses=4, n_speakers=N_SPK)
    got = m.apply({"params": params, "batch_stats": stats},
                  jnp.asarray(tokens.numpy()), jnp.asarray(lengths.numpy()),
                  jnp.asarray(poses.numpy()), jnp.asarray(vids.numpy()),
                  train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)


def test_s2g_generator_import_parity():
    """speech2gesture gen_dict import: TF-SAME U-Net forward parity."""
    torch.manual_seed(9)
    pose_dim = 27
    tmodel = tm.TorchS2GGenerator(T, pose_dim, 4).eval()
    _randomize_bn(tmodel)
    spec = torch.randn(B, 128, 70)
    pre = torch.randn(B, 4, pose_dim) * 0.2
    with torch.no_grad():
        want = tmodel(spec, pre).numpy()

    from ha2g_tpu.import_torch import convert_s2g_generator
    from ha2g_tpu.models.speech2gesture import Generator
    params, stats = convert_s2g_generator(tmodel.state_dict())
    m = Generator(n_poses=T, pose_dim=pose_dim, n_pre_poses=4)
    got = m.apply({"params": params, "batch_stats": stats},
                  jnp.asarray(spec.numpy()), jnp.asarray(pre.numpy()),
                  train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


def test_s2g_discriminator_import_parity():
    torch.manual_seed(10)
    pose_dim = 27
    tmodel = tm.TorchS2GDiscriminator(pose_dim).eval()
    _randomize_bn(tmodel)
    poses = torch.randn(B, T, pose_dim) * 0.2
    with torch.no_grad():
        want = tmodel(poses).numpy()

    from ha2g_tpu.import_torch import convert_s2g_discriminator
    from ha2g_tpu.models.speech2gesture import Discriminator
    params, stats = convert_s2g_discriminator(tmodel.state_dict())
    m = Discriminator()
    got = m.apply({"params": params, "batch_stats": stats},
                  jnp.asarray(poses.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               atol=1e-4)


def test_joint_embed_import_parity():
    """joint_embedding gen_dict import: ContextEncoder + PoseEncoderConv +
    PoseDecoderGRU forward parity (speech and pose decode paths)."""
    torch.manual_seed(11)
    pose_dim = 27
    tmodel = tm.TorchEmbeddingNetFull(pose_dim, T, N_WORDS, 300,
                                      hidden=300, n_layers=4).eval()
    _randomize_bn(tmodel)
    with torch.no_grad():
        # freeze context z at mu on both sides
        tmodel.context_encoder.fc_logvar.weight.zero_()
        tmodel.context_encoder.fc_logvar.bias.fill_(-100.0)
    rng = np.random.default_rng(11)
    tokens = torch.from_numpy(rng.integers(0, N_WORDS, (B, T)))
    audio = torch.randn(B, int(round(T / 15 * 16000))) * 0.1
    pre = torch.randn(B, 4, pose_dim) * 0.2
    poses = torch.randn(B, T, pose_dim) * 0.2
    with torch.no_grad():
        ctx_feat, ctx_mu, _, pose_feat, want_out = tmodel(
            tokens, audio, pre, poses, input_mode="speech")

    from ha2g_tpu.import_torch import convert_embedding_net_full
    from ha2g_tpu.models.embedding_net import EmbeddingNet
    params, stats = convert_embedding_net_full(tmodel.state_dict())
    m = EmbeddingNet(pose_dim=pose_dim, n_frames=T, mode="speech",
                     n_words=N_WORDS, word_embed_dim=300)
    (got_ctx, got_mu, _, got_pose, _, _, got_out) = m.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(tokens.numpy()), jnp.asarray(audio.numpy()),
        jnp.asarray(pre.numpy()), jnp.asarray(poses.numpy()),
        input_mode="speech", train=False,
        rngs={"noise": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(got_mu), ctx_mu.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_pose), pose_feat.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_out), want_out.numpy(),
                               atol=1e-3)


def test_cli_import_checkpoint_expressive_end_to_end(tmp_path):
    """Fabricate a reference-format expressive hierarchy .bin — embedded
    argparse Namespace, lang/speaker pickled as `model.vocab.Vocab`
    instances (the class the reference pickles into checkpoints,
    train.py:232-243), six gen_dicts — and drive
    `cli import-checkpoint` -> `cli synthesize`.  Verifies the pickled-class
    shim, config_from_reference_args (incl. the automatic
    ref_routing_compat for expressive), vocab reconstruction, the 6-level
    import, checkpoint save, and synthesis from the imported model."""
    import argparse
    import sys
    import types

    from ha2g_tpu import cli

    # classes pickled under the reference's module path
    mod = types.ModuleType("model")
    vocab_mod = types.ModuleType("model.vocab")

    class _RefVocab:
        pass
    _RefVocab.__module__ = "model.vocab"
    _RefVocab.__qualname__ = "Vocab"
    _RefVocab.__name__ = "Vocab"
    vocab_mod.Vocab = _RefVocab
    sys.modules["model"] = mod
    sys.modules["model.vocab"] = vocab_mod

    def ref_vocab(names):
        v = _RefVocab()
        v.name = "words"
        v.word2index = {}
        v.index2word = {0: "<PAD>", 1: "<SOS>", 2: "<EOS>", 3: "<UNK>"}
        v.word2count = {}
        for w in names:
            idx = len(v.index2word)
            v.word2index[w] = idx
            v.index2word[idx] = w
        v.n_words = len(v.index2word)
        v.word_embedding_weights = None
        return v

    lang = ref_vocab([f"w{i}" for i in range(N_WORDS - 4)])
    speaker = ref_vocab([f"vid{i}" for i in range(N_SPK - 4)])

    torch.manual_seed(9)
    dims = (24, 30, 36, 66, 96, 126)
    t_gens = [tm.TorchHierGenerator(d, N_WORDS, N_SPK, HID, NL).eval()
              for d in dims]
    t_audio = tm.TorchResNetSE(N_SPK, pose_level=6).eval()
    t_dis = tm.TorchConvDiscriminator(126).eval()
    t_text = tm.TorchTextEncoderTCN(N_WORDS, 300, HID, NL).eval()

    args = argparse.Namespace(
        model="hierarchy", pose_dim=126, n_poses=T, n_pre_poses=4,
        hidden_size=HID, n_layers=NL, z_type="speaker", dropout_prob=0.0,
        motion_resampling_framerate=15, wordembed_dim=300,
        mean_dir_vec=np.zeros(126, np.float32))
    ckpt = {"args": args, "epoch": 3, "pose_dim": 126,
            "lang_model": lang, "speaker_model": speaker,
            "audio_dict": t_audio.state_dict(),
            "dis_dict": t_dis.state_dict(),
            "text_dict": t_text.state_dict()}
    for l, g in enumerate(t_gens):
        ckpt[f"gen_dict_{l + 1}"] = g.state_dict()
    bin_path = tmp_path / "ref_expressive.bin"
    torch.save(ckpt, bin_path)

    out_dir = tmp_path / "imported"
    assert cli.cmd_import_checkpoint([str(bin_path), str(out_dir)]) == 0

    # the imported config must carry the compat-routing flag
    from ha2g_tpu.checkpoint import load_config
    cfg2, _extra = load_config(str(out_dir))
    assert cfg2.ref_routing_compat and cfg2.dataset == "ted_expressive"

    synth_out = tmp_path / "synth.npz"
    assert cli.cmd_synthesize([str(out_dir), "--n", "1",
                               "--out", str(synth_out)]) == 0
    arr = np.load(synth_out)["dir_vec"]
    assert arr.shape[-1] == 126 and np.isfinite(arr).all()

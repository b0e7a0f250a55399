"""Export native checkpoints BACK to the reference's torch format.

The inverse of import_torch.py: a hierarchy checkpoint trained here can be
handed to a stack built around the reference code (synthesize_hierarchy.py,
train_utils.load_checkpoint_hierarchy — /root/reference/scripts/utils/
train_utils.py:169-195), completing the migration story in both directions
(train on TPU, deploy in an existing torch pipeline).

Produced dict layout matches the reference's save_checkpoint exactly
(train.py:232-243): {args, epoch, lang_model, speaker_model, pose_dim,
gen_dict_1..K, audio_dict, text_dict, dis_dict}.  `args` and the vocab
models are plain types.SimpleNamespace duck-types of the reference's
configargparse Namespace / model.vocab.Vocab (attribute-compatible:
word2index / index2word / word2count / n_words / word_embedding_weights),
so torch.load needs no third-party classes on the unpickling side.

Every tensor conversion is the exact inverse of the import primitive it
mirrors (weight transposes, GRU direction stacking, weight-norm v/g,
BatchNorm running stats); round-trip equality against import_torch and a
strict=True state-dict load into the clean-room torch mirrors are asserted
by tests/test_export_torch.py.
"""

from __future__ import annotations

import types
from typing import Any

import numpy as np


def _torch():
    import torch
    return torch


def _t(arr):
    return _torch().from_numpy(
        np.array(np.asarray(arr), dtype=np.float32, copy=True))


# ---------------------------------------------------------------------------
# Primitive inverses (see import_torch.py counterparts)
# ---------------------------------------------------------------------------

def _inv_linear(p: dict, sd: dict, key: str) -> None:
    sd[f"{key}.weight"] = _t(np.asarray(p["kernel"]).T)
    sd[f"{key}.bias"] = _t(p["bias"])


def _inv_dense(p: dict, sd: dict, key: str) -> None:
    _inv_linear(p["Dense_0"], sd, key)


def _inv_conv1d(p: dict, sd: dict, key: str) -> None:
    # flax (k, in, out) -> torch (out, in, k)
    sd[f"{key}.weight"] = _t(np.asarray(p["kernel"]).transpose(2, 1, 0))
    if "bias" in p:
        sd[f"{key}.bias"] = _t(p["bias"])


def _inv_conv2d(p: dict, sd: dict, key: str) -> None:
    # flax (kh, kw, in, out) -> torch (out, in, kh, kw)
    sd[f"{key}.weight"] = _t(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
    if "bias" in p:
        sd[f"{key}.bias"] = _t(p["bias"])


def _inv_bn(pp: dict, ss: dict, sd: dict, key: str) -> None:
    """{'BatchNorm_0': {scale,bias}} + {'BatchNorm_0': {mean,var}} ->
    torch BN entry (incl. num_batches_tracked for strict loads)."""
    sd[f"{key}.weight"] = _t(pp["BatchNorm_0"]["scale"])
    sd[f"{key}.bias"] = _t(pp["BatchNorm_0"]["bias"])
    sd[f"{key}.running_mean"] = _t(ss["BatchNorm_0"]["mean"])
    sd[f"{key}.running_var"] = _t(ss["BatchNorm_0"]["var"])
    sd[f"{key}.num_batches_tracked"] = _torch().tensor(0)


def _inv_gru(p: dict, sd: dict, prefix: str, n_layers: int,
             bidirectional: bool = True) -> None:
    """Our direction-stacked GRU params (D, in, 3h) -> torch per-direction
    weight_ih_l{l}(_reverse)."""
    D = 2 if bidirectional else 1
    for l in range(n_layers):
        for d in range(D):
            sfx = f"_l{l}" + ("_reverse" if d == 1 else "")
            sd[f"{prefix}.weight_ih{sfx}"] = _t(
                np.asarray(p[f"w_ih_l{l}"])[d].T)
            sd[f"{prefix}.weight_hh{sfx}"] = _t(
                np.asarray(p[f"w_hh_l{l}"])[d].T)
            sd[f"{prefix}.bias_ih{sfx}"] = _t(np.asarray(p[f"b_ih_l{l}"])[d])
            sd[f"{prefix}.bias_hh{sfx}"] = _t(np.asarray(p[f"b_hh_l{l}"])[d])


def _inv_weightnorm_conv(p: dict, sd: dict, key: str) -> None:
    # v (k, in, out) -> weight_v (out, in, k); g (out,) -> (out, 1, 1)
    sd[f"{key}.weight_v"] = _t(np.asarray(p["v"]).transpose(2, 1, 0))
    sd[f"{key}.weight_g"] = _t(np.asarray(p["g"]).reshape(-1, 1, 1))
    sd[f"{key}.bias"] = _t(p["b"])


# ---------------------------------------------------------------------------
# Module exporters (inverses of import_torch converters)
# ---------------------------------------------------------------------------

def export_text_encoder(params: dict, n_layers: int,
                        prefix: str = "") -> dict:
    """Inverse of convert_text_encoder (TextEncoderTCN params -> reference
    hierarchy_net.py:22-52 state dict)."""
    sd: dict[str, Any] = {}
    sd[f"{prefix}embedding.weight"] = _t(params["embedding"])
    tcn = params["TemporalConvNet_0"]
    for i in range(n_layers):
        block = tcn[f"TemporalBlock_{i}"]
        _inv_weightnorm_conv(block["WeightNormConv1d_0"], sd,
                             f"{prefix}tcn.network.{i}.conv1")
        _inv_weightnorm_conv(block["WeightNormConv1d_1"], sd,
                             f"{prefix}tcn.network.{i}.conv2")
        if "Conv_0" in block:
            _inv_conv1d(block["Conv_0"], sd,
                        f"{prefix}tcn.network.{i}.downsample")
    _inv_linear(params["Dense_0"], sd, f"{prefix}decoder")
    return sd


def export_generator(params: dict, n_layers: int) -> dict:
    """Inverse of convert_generator (HierarchicalPoseGenerator ->
    hierarchy_net.py:55-149 gen_dict)."""
    sd = export_text_encoder(params["TextEncoderTCN_0"], n_layers,
                             prefix="text_encoder.")
    _inv_gru(params["GRU_0"], sd, "gru", n_layers)
    _inv_dense(params["Dense_0"], sd, "out.0")
    _inv_dense(params["Dense_1"], sd, "out.2")
    if "SpeakerZ_0" in params:
        z = params["SpeakerZ_0"]
        sd["speaker_embedding.0.weight"] = _t(z["embedding"])
        _inv_dense(z["Dense_0"], sd, "speaker_embedding.1")
        _inv_dense(z["Dense_1"], sd, "speaker_mu")
        _inv_dense(z["Dense_2"], sd, "speaker_logvar")
    return sd


def export_audio_encoder(params: dict, stats: dict,
                         layers=(3, 4, 6, 3), prefix: str = "") -> dict:
    """Inverse of convert_audio_encoder (HierarchicalWavEncoder ->
    reference audio_dict).  The reference wraps ResNetSE under a
    `feat_extractor.` attribute (hierarchy_net.py:10-19); pass
    prefix='feat_extractor.' for checkpoint layout, '' for a bare
    ResNetSE state dict."""
    p, s = params["ResNetSE_0"], stats["ResNetSE_0"]
    sd: dict[str, Any] = {}
    _inv_conv2d(p["Conv2d_0"]["Conv_0"], sd, f"{prefix}conv1")
    _inv_bn(p["BatchNorm_0"], s["BatchNorm_0"], sd, f"{prefix}bn1")

    block_idx = 0
    for stage, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            key = f"{prefix}layer{stage + 1}.{b}"
            bp = p[f"SEBasicBlock_{block_idx}"]
            bs = s[f"SEBasicBlock_{block_idx}"]
            _inv_conv2d(bp["Conv2d_0"]["Conv_0"], sd, f"{key}.conv1")
            _inv_bn(bp["BatchNorm_0"], bs["BatchNorm_0"], sd, f"{key}.bn1")
            _inv_conv2d(bp["Conv2d_1"]["Conv_0"], sd, f"{key}.conv2")
            _inv_bn(bp["BatchNorm_1"], bs["BatchNorm_1"], sd, f"{key}.bn2")
            _inv_dense(bp["SELayer_0"]["Dense_0"], sd, f"{key}.se.fc.0")
            _inv_dense(bp["SELayer_0"]["Dense_1"], sd, f"{key}.se.fc.2")
            if "Conv2d_2" in bp:
                _inv_conv2d(bp["Conv2d_2"]["Conv_0"], sd,
                            f"{key}.downsample.0")
                _inv_bn(bp["BatchNorm_2"], bs["BatchNorm_2"], sd,
                        f"{key}.downsample.1")
            block_idx += 1

    for i, name in enumerate(("low", "mid", "high")):
        _inv_conv2d(p[f"Conv2d_{i + 1}"]["Conv_0"], sd,
                    f"{prefix}conv_{name}")
        _inv_bn(p[f"BatchNorm_{i + 1}"], s[f"BatchNorm_{i + 1}"], sd,
                f"{prefix}bn_{name}")
        _inv_dense(p[f"Dense_{i}"], sd, f"{prefix}fc_{name}")

    if "speaker_embedding" in p:
        sd[f"{prefix}speaker_embedding.0.weight"] = _t(
            p["speaker_embedding"])
        _inv_dense(p["Dense_3"], sd, f"{prefix}speaker_embedding.1")
        _inv_dense(p["Dense_4"], sd, f"{prefix}fc1")
        _inv_dense(p["Dense_5"], sd, f"{prefix}fc2")
    return sd


def export_discriminator(params: dict, stats: dict) -> dict:
    """Inverse of convert_discriminator (ConvDiscriminator ->
    hierarchy_net.py:197-242 dis_dict)."""
    sd: dict[str, Any] = {}
    _inv_conv1d(params["Conv1d_0"]["Conv_0"], sd, "pre_conv.0")
    _inv_bn(params["BatchNorm_0"], stats["BatchNorm_0"], sd, "pre_conv.1")
    _inv_conv1d(params["Conv1d_1"]["Conv_0"], sd, "pre_conv.3")
    _inv_bn(params["BatchNorm_1"], stats["BatchNorm_1"], sd, "pre_conv.4")
    _inv_conv1d(params["Conv1d_2"]["Conv_0"], sd, "pre_conv.6")
    _inv_gru(params["GRU_0"], sd, "gru", 4)
    _inv_dense(params["Dense_0"], sd, "out")
    _inv_dense(params["Dense_1"], sd, "out2")
    return sd


def _inv_convT1d(p: dict, sd: dict, key: str) -> None:
    """Inverse of import_torch._convT1d: flax (k, in, out) with the
    spatial flip -> torch ConvTranspose1d (in, out, k)."""
    w = np.asarray(p["kernel"])[::-1].transpose(1, 2, 0)
    sd[f"{key}.weight"] = _t(np.ascontiguousarray(w))
    sd[f"{key}.bias"] = _t(p["bias"])


def _inv_cnr(p: dict, s: dict, sd: dict, key: str) -> None:
    """Inverse of import_torch._cnr (ConvNormRelu1d)."""
    _inv_conv1d(p["Conv1d_0"]["Conv_0"], sd, f"{key}.0")
    _inv_bn(p["BatchNorm_0"], s["BatchNorm_0"], sd, f"{key}.1")


def export_pose_encoder(p: dict, s: dict, sd: dict,
                        prefix: str = "pose_encoder") -> None:
    """Inverse of convert_pose_encoder (embedding_net.py:42-82)."""
    for i in range(3):
        _inv_cnr(p[f"ConvNormRelu1d_{i}"], s[f"ConvNormRelu1d_{i}"], sd,
                 f"{prefix}.net.{i}")
    _inv_conv1d(p["Conv1d_0"]["Conv_0"], sd, f"{prefix}.net.3")
    _inv_dense(p["Dense_0"], sd, f"{prefix}.out_net.0")
    _inv_bn(p["BatchNorm_0"], s["BatchNorm_0"], sd, f"{prefix}.out_net.1")
    _inv_dense(p["Dense_1"], sd, f"{prefix}.out_net.3")
    _inv_bn(p["BatchNorm_1"], s["BatchNorm_1"], sd, f"{prefix}.out_net.4")
    _inv_dense(p["Dense_2"], sd, f"{prefix}.out_net.6")
    if "Dense_3" in p:                 # variational heads
        _inv_dense(p["Dense_3"], sd, f"{prefix}.fc_mu")
        _inv_dense(p["Dense_4"], sd, f"{prefix}.fc_logvar")


def export_pose_decoder(p: dict, s: dict, sd: dict,
                        prefix: str = "decoder") -> None:
    """Inverse of convert_pose_decoder (embedding_net.py:165-217)."""
    _inv_dense(p["Dense_0"], sd, f"{prefix}.pre_net.0")
    _inv_bn(p["BatchNorm_0"], s["BatchNorm_0"], sd, f"{prefix}.pre_net.1")
    _inv_dense(p["Dense_1"], sd, f"{prefix}.pre_net.3")
    _inv_convT1d(p["ConvTranspose_0"], sd, f"{prefix}.net.0")
    _inv_bn(p["BatchNorm_1"], s["BatchNorm_1"], sd, f"{prefix}.net.1")
    _inv_convT1d(p["ConvTranspose_1"], sd, f"{prefix}.net.3")
    _inv_bn(p["BatchNorm_2"], s["BatchNorm_2"], sd, f"{prefix}.net.4")
    _inv_conv1d(p["Conv1d_0"]["Conv_0"], sd, f"{prefix}.net.6")
    _inv_conv1d(p["Conv1d_1"]["Conv_0"], sd, f"{prefix}.net.7")


def export_embedding_net_pose(params: dict, stats: dict) -> dict:
    """Inverse of convert_embedding_net_pose — the TED Gesture FGD
    embedder's gen_dict (EmbeddingNet mode='pose')."""
    sd: dict[str, Any] = {}
    export_pose_encoder(params["PoseEncoderConv_0"],
                        stats["PoseEncoderConv_0"], sd, "pose_encoder")
    export_pose_decoder(params["PoseDecoderConv_0"],
                        stats["PoseDecoderConv_0"], sd, "decoder")
    return sd


def export_motion_ae(params: dict, stats: dict) -> dict:
    """Inverse of convert_motion_ae — the TED Expressive FGD embedder's
    motion_ae dict."""
    sd: dict[str, Any] = {}
    export_pose_encoder(params["MotionEncoderConv_0"],
                        stats["MotionEncoderConv_0"], sd, "encoder")
    export_pose_decoder(params["MotionDecoderConv_0"],
                        stats["MotionDecoderConv_0"], sd, "decoder")
    return sd


def _inv_gru_cell(p: dict, sd: dict, prefix: str, n_layers: int) -> None:
    """Inverse of import_torch._gru_cell (unidirectional, no dir axis)."""
    for l in range(n_layers):
        sd[f"{prefix}.weight_ih_l{l}"] = _t(np.asarray(p[f"w_ih_l{l}"]).T)
        sd[f"{prefix}.weight_hh_l{l}"] = _t(np.asarray(p[f"w_hh_l{l}"]).T)
        sd[f"{prefix}.bias_ih_l{l}"] = _t(p[f"b_ih_l{l}"])
        sd[f"{prefix}.bias_hh_l{l}"] = _t(p[f"b_hh_l{l}"])


def export_wav_encoder(p: dict, s: dict, sd: dict,
                       prefix: str = "audio_encoder") -> None:
    """Inverse of convert_wav_encoder (raw-waveform WavEncoder,
    multimodal_context_net.py:9-28)."""
    for i, slot in enumerate((0, 3, 6, 9)):
        _inv_conv1d(p[f"Conv1d_{i}"]["Conv_0"], sd,
                    f"{prefix}.feat_extractor.{slot}")
    for i, slot in enumerate((1, 4, 7)):
        _inv_bn(p[f"BatchNorm_{i}"], s[f"BatchNorm_{i}"], sd,
                f"{prefix}.feat_extractor.{slot}")


def export_multimodal_generator(params: dict, stats: dict,
                                n_layers: int) -> dict:
    """Inverse of convert_multimodal_generator (PoseGenerator,
    multimodal_context_net.py:64-160)."""
    sd = export_text_encoder(params["TextEncoderTCN_0"], n_layers,
                             prefix="text_encoder.")
    export_wav_encoder(params["WavEncoder_0"], stats["WavEncoder_0"], sd)
    _inv_gru(params["GRU_0"], sd, "gru", n_layers)
    _inv_dense(params["Dense_0"], sd, "out.0")
    _inv_dense(params["Dense_1"], sd, "out.2")
    if "SpeakerZ_0" in params:
        z = params["SpeakerZ_0"]
        sd["speaker_embedding.0.weight"] = _t(z["embedding"])
        _inv_dense(z["Dense_0"], sd, "speaker_embedding.1")
        _inv_dense(z["Dense_1"], sd, "speaker_mu")
        _inv_dense(z["Dense_2"], sd, "speaker_logvar")
    return sd


def export_seq2seq(params: dict, stats: dict, n_layers: int) -> dict:
    """Inverse of convert_seq2seq (Seq2SeqNet, seq2seq_net.py:219-254)."""
    sd: dict[str, Any] = {}
    enc = params["MaskedBiGRUEncoder_0"]
    sd["encoder.embedding.weight"] = _t(enc["embedding"])
    _inv_gru({k: v for k, v in enc.items() if k != "embedding"},
             sd, "encoder.gru", n_layers)
    pref = "decoder.decoder"
    dec = params["decoder_step"]
    _inv_dense(dec["Attn_0"]["Dense_0"], sd, f"{pref}.attn.attn")
    sd[f"{pref}.attn.v"] = _t(dec["Attn_0"]["v"])
    _inv_dense(dec["Dense_0"], sd, f"{pref}.pre_linear.0")
    _inv_bn(dec["BatchNorm_0"], stats["decoder_step"]["BatchNorm_0"], sd,
            f"{pref}.pre_linear.1")
    _inv_gru_cell(dec["GRUCell_0"], sd, f"{pref}.gru", n_layers)
    _inv_dense(dec["Dense_1"], sd, f"{pref}.out")
    if "speaker_embedding" in dec:
        sd[f"{pref}.speaker_embedding.weight"] = _t(
            dec["speaker_embedding"])
    return sd


def _inv_s2g_cnr(p: dict, s: dict, sd: dict, key: str,
                 is_2d: bool = False) -> None:
    """Inverse of import_torch._s2g_cnr."""
    conv = p["Conv_0"]
    if is_2d:
        _inv_conv2d(conv, sd, f"{key}.0")
    else:
        _inv_conv1d(conv, sd, f"{key}.0")
    _inv_bn(p["BatchNorm_0"], s["BatchNorm_0"], sd, f"{key}.1")


def export_s2g_generator(params: dict, stats: dict) -> dict:
    """Inverse of convert_s2g_generator (speech2gesture.py:200-231)."""
    sd: dict[str, Any] = {}
    ae_p, ae_s = params["AudioEncoder_0"], stats["AudioEncoder_0"]
    for i in range(8):
        _inv_s2g_cnr(ae_p[f"ConvNormRelu_{i}"], ae_s[f"ConvNormRelu_{i}"],
                     sd, f"audio_encoder.first_net.{i}", is_2d=True)
    for i, key in enumerate(["down1.0", "down1.1", "down2", "down3",
                             "down4", "down5", "down6"]):
        _inv_s2g_cnr(ae_p[f"ConvNormRelu_{8 + i}"],
                     ae_s[f"ConvNormRelu_{8 + i}"], sd,
                     f"audio_encoder.{key}")
    for i in range(5):
        _inv_s2g_cnr(ae_p[f"UnetUp_{i}"]["ConvNormRelu_0"],
                     ae_s[f"UnetUp_{i}"]["ConvNormRelu_0"], sd,
                     f"audio_encoder.up{i + 1}.conv")
    _inv_dense(params["Dense_0"], sd, "pre_pose_encoder.0")
    _inv_bn(params["BatchNorm_0"], stats["BatchNorm_0"], sd,
            "pre_pose_encoder.1")
    _inv_dense(params["Dense_1"], sd, "pre_pose_encoder.3")
    _inv_conv1d(params["Conv_0"], sd, "final_out")
    for i in range(4):
        _inv_s2g_cnr(params[f"ConvNormRelu_{i}"], stats[f"ConvNormRelu_{i}"],
                     sd, f"decoder.{i}")
    return sd


def export_s2g_discriminator(params: dict, stats: dict) -> dict:
    """Inverse of convert_s2g_discriminator (speech2gesture.py:234-250)."""
    sd: dict[str, Any] = {}
    _inv_conv1d(params["Conv_0"], sd, "net.0")
    _inv_s2g_cnr(params["ConvNormRelu_0"], stats["ConvNormRelu_0"], sd,
                 "net.2")
    _inv_s2g_cnr(params["ConvNormRelu_1"], stats["ConvNormRelu_1"], sd,
                 "net.3")
    _inv_conv1d(params["Conv_1"], sd, "net.4")
    return sd


def export_embedding_net_full(params: dict, stats: dict,
                              tcn_layers: int = 4) -> dict:
    """Inverse of convert_embedding_net_full (joint_embedding gen_dict:
    ContextEncoder + PoseEncoderConv + PoseDecoderGRU,
    embedding_net.py:260-294)."""
    sd: dict[str, Any] = {}
    ctx, ctx_s = params["ContextEncoder_0"], stats["ContextEncoder_0"]
    sd.update(export_text_encoder(ctx["TextEncoderTCN_0"], tcn_layers,
                                  prefix="context_encoder.text_encoder."))
    export_wav_encoder(ctx["WavEncoder_0"], ctx_s["WavEncoder_0"], sd,
                       prefix="context_encoder.audio_encoder")
    _inv_gru(ctx["GRU_0"], sd, "context_encoder.gru", 2,
             bidirectional=False)
    _inv_dense(ctx["Dense_0"], sd, "context_encoder.out.0")
    _inv_bn(ctx["BatchNorm_0"], ctx_s["BatchNorm_0"], sd,
            "context_encoder.out.1")
    _inv_dense(ctx["Dense_1"], sd, "context_encoder.out.3")
    _inv_dense(ctx["Dense_2"], sd, "context_encoder.fc_mu")
    _inv_dense(ctx["Dense_3"], sd, "context_encoder.fc_logvar")
    export_pose_encoder(params["PoseEncoderConv_0"],
                        stats["PoseEncoderConv_0"], sd, "pose_encoder")
    dec, dec_s = params["PoseDecoderGRU_0"], stats["PoseDecoderGRU_0"]
    _inv_dense(dec["Dense_0"], sd, "decoder.pre_pose_net.0")
    _inv_bn(dec["BatchNorm_0"], dec_s["BatchNorm_0"], sd,
            "decoder.pre_pose_net.1")
    _inv_dense(dec["Dense_1"], sd, "decoder.pre_pose_net.3")
    _inv_gru(dec["GRU_0"], sd, "decoder.gru", 4)
    _inv_dense(dec["Dense_2"], sd, "decoder.out.0")
    _inv_dense(dec["Dense_3"], sd, "decoder.out.2")
    return sd


def export_generic_checkpoint(state, cfg, lang=None, speaker=None,
                              epoch: int = 0) -> dict:
    """Inverse of import_torch.import_generic_checkpoint: native state ->
    the reference's generic checkpoint dict ({args, epoch, lang_model,
    speaker_model, pose_dim, gen_dict[, dis_dict]}, train.py:239-244) for
    multimodal_context / seq2seq / speech2gesture / joint_embedding."""
    import jax

    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    ckpt: dict[str, Any] = {
        "args": _args_namespace(cfg), "epoch": int(epoch),
        "lang_model": _vocab_namespace(lang),
        "speaker_model": _vocab_namespace(speaker),
        "pose_dim": int(cfg.pose_dim),
    }
    model = cfg.model
    if model == "multimodal_context":
        ckpt["gen_dict"] = export_multimodal_generator(
            params["gen"], stats["gen"], cfg.n_layers)
        ckpt["dis_dict"] = export_discriminator(params["dis"],
                                                stats["dis"])
    elif model == "seq2seq":
        ckpt["gen_dict"] = export_seq2seq(params, stats, cfg.n_layers)
    elif model == "speech2gesture":
        ckpt["gen_dict"] = export_s2g_generator(params["gen"],
                                                stats["gen"])
        ckpt["dis_dict"] = export_s2g_discriminator(params["dis"],
                                                    stats["dis"])
    elif model == "joint_embedding":
        ckpt["gen_dict"] = export_embedding_net_full(params, stats)
    else:
        raise ValueError(f"no generic exporter for model {model!r} "
                         "(hierarchy: export_hierarchy_checkpoint; "
                         "gesture_autoencoder: export_evalnet_checkpoint)")
    return ckpt


def export_evalnet_checkpoint(state, cfg, epoch: int = 0) -> dict:
    """FGD eval-net state -> the reference checkpoint layout the
    EmbeddingSpaceEvaluator expects (embedding_space_evaluator.py:27-34):
    EmbeddingNet 'gen_dict' for pose_dim 27, MotionAE 'motion_ae' +
    latent_dim for 126."""
    import jax

    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    base = {"args": _args_namespace(cfg), "epoch": int(epoch),
            "pose_dim": int(cfg.pose_dim)}
    if cfg.pose_dim == 126:
        base["motion_ae"] = export_motion_ae(params, stats)
        base["latent_dim"] = int(getattr(cfg, "latent_dim", 128))
    else:
        base["gen_dict"] = export_embedding_net_pose(params, stats)
    return base


# ---------------------------------------------------------------------------
# Full checkpoint export
# ---------------------------------------------------------------------------

def _vocab_namespace(vocab) -> types.SimpleNamespace | None:
    """Duck-type of the reference model.vocab.Vocab — the attributes its
    synthesize/train code touches (vocab.py:8-84)."""
    if vocab is None:
        return None
    return types.SimpleNamespace(
        name=vocab.name,
        word2index=dict(vocab.word2index),
        word2count=dict(getattr(vocab, "word2count", {})),
        index2word=dict(vocab.index2word),
        n_words=vocab.n_words,
        word_embedding_weights=(
            None if vocab.word_embedding_weights is None
            else np.asarray(vocab.word_embedding_weights)))


def _args_namespace(cfg) -> types.SimpleNamespace:
    """cfg -> reference-style args Namespace (field names already mirror
    parse_args.py; config_from_reference_args inverts this)."""
    import dataclasses
    d = dataclasses.asdict(cfg)
    for k in ("train_data_path", "val_data_path", "test_data_path"):
        if isinstance(d.get(k), str):
            d[k] = [d[k]]     # the reference stores these as lists
    return types.SimpleNamespace(**d)


def export_hierarchy_checkpoint(state, cfg, lang=None, speaker=None,
                                epoch: int = 0) -> dict:
    """HierarchyState -> the reference's checkpoint dict
    (train.py:232-243 / train_expressive.py:298-304 layout)."""
    import jax

    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    n_layers = cfg.n_layers
    ckpt: dict[str, Any] = {
        "args": _args_namespace(cfg),
        "epoch": int(epoch),
        "lang_model": _vocab_namespace(lang),
        "speaker_model": _vocab_namespace(speaker),
        "pose_dim": int(cfg.pose_dim),
        "audio_dict": export_audio_encoder(params["audio"], stats["audio"],
                                           prefix="feat_extractor."),
        "text_dict": export_text_encoder(params["text"], n_layers),
        "dis_dict": export_discriminator(params["dis"], stats["dis"]),
    }
    for l, gen_params in enumerate(params["gens"]):
        ckpt[f"gen_dict_{l + 1}"] = export_generator(gen_params, n_layers)
    return ckpt


def save_reference_checkpoint(path: str, state, cfg, lang=None,
                              speaker=None, epoch: int = 0) -> None:
    """torch.save an exported checkpoint (loadable by the reference's
    load_checkpoint_hierarchy with only torch + numpy installed)."""
    ckpt = export_hierarchy_checkpoint(state, cfg, lang, speaker, epoch)
    _torch().save(ckpt, path)

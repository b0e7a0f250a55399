"""Importer for reference (PyTorch) HA2G checkpoints.

The reference saves `torch.save` dicts holding per-module state dicts plus
pickled Vocab objects (train.py:232-237: args, epoch, lang_model,
speaker_model, pose_dim, gen_dict_1..K, dis_dict, audio_dict, text_dict;
loaders at train_utils.py:169-213).  This module converts those weights
into ha2g_tpu's flax trees so users can bring released HA2G checkpoints
across.

Weight-layout conventions handled:
  Linear  (out, in)        -> kernel (in, out)            transpose
  Conv1d  (out, in, k)     -> kernel (k, in, out)         transpose(2,1,0)
  Conv2d  (out, in, kh, kw)-> kernel (kh, kw, in, out)    transpose(2,3,1,0)
  GRU     weight_ih_l{k}(3H, in) + _reverse -> w_ih_l{k} (2, in, 3H)
  weight-norm conv: weight_v/weight_g -> v (k, in, out) / g (out,)
  BatchNorm weight/bias/running_mean/running_var -> scale/bias + mean/var
  FC heads on folded conv features: torch flattens channel-major, our
  modules fold channel-major too, so those kernels transpose directly.

Validation: tests/test_import_torch.py builds clean-room torch mirrors of
the reference architectures, round-trips random weights through this
importer, and asserts full-model forward equivalence.
"""

from __future__ import annotations

import sys
import types
from typing import Any

import numpy as np


# ---------------------------------------------------------------------------
# Loading reference .bin files (pickled Vocab classes need an import shim)
# ---------------------------------------------------------------------------

class _VocabShim:
    """Stand-in for the reference's model.vocab.Vocab during unpickling."""

    def __setstate__(self, state):
        self.__dict__.update(state)


def load_reference_checkpoint(path: str) -> dict:
    """torch.load a reference checkpoint, shimming its pickled classes."""
    import torch
    for mod_name in ("model", "model.vocab", "utils", "utils.vocab_utils"):
        if mod_name not in sys.modules:
            sys.modules[mod_name] = types.ModuleType(mod_name)
    sys.modules["model.vocab"].Vocab = _VocabShim
    return torch.load(path, map_location="cpu", weights_only=False)


def _np(t) -> np.ndarray:
    """Tensor -> OWNED float32 ndarray.  Must copy: ``Tensor.numpy()``
    shares storage with the live parameter, and ``np.asarray``/transpose
    keep that aliasing — an imported checkpoint would then silently track
    (or be corrupted by) later in-place updates to the torch module."""
    arr = t.detach().cpu().numpy() if hasattr(t, "detach") else t
    return np.array(arr, dtype=np.float32, copy=True)


def _strip_module_prefix(sd: dict) -> dict:
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Primitive converters
# ---------------------------------------------------------------------------

def _linear(sd, key):
    return {"kernel": _np(sd[f"{key}.weight"]).T,
            "bias": _np(sd[f"{key}.bias"])}


def _dense(sd, key):
    """Our common.Dense wraps nn.Dense -> nested Dense_0."""
    return {"Dense_0": _linear(sd, key)}


def _conv1d(sd, key, bias=True):
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 1, 0)}
    if bias:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _conv2d(sd, key, bias=True):
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _bn_params(sd, key):
    return {"BatchNorm_0": {"scale": _np(sd[f"{key}.weight"]),
                            "bias": _np(sd[f"{key}.bias"])}}


def _bn_stats(sd, key):
    return {"BatchNorm_0": {"mean": _np(sd[f"{key}.running_mean"]),
                            "var": _np(sd[f"{key}.running_var"])}}


def _gru(sd, prefix, n_layers, bidirectional=True):
    out = {}
    D = 2 if bidirectional else 1
    for l in range(n_layers):
        w_ih, w_hh, b_ih, b_hh = [], [], [], []
        for d in range(D):
            sfx = f"_l{l}" + ("_reverse" if d == 1 else "")
            w_ih.append(_np(sd[f"{prefix}.weight_ih{sfx}"]).T)
            w_hh.append(_np(sd[f"{prefix}.weight_hh{sfx}"]).T)
            b_ih.append(_np(sd[f"{prefix}.bias_ih{sfx}"]))
            b_hh.append(_np(sd[f"{prefix}.bias_hh{sfx}"]))
        out[f"w_ih_l{l}"] = np.stack(w_ih)
        out[f"w_hh_l{l}"] = np.stack(w_hh)
        out[f"b_ih_l{l}"] = np.stack(b_ih)
        out[f"b_hh_l{l}"] = np.stack(b_hh)
    return out


def _weightnorm_conv(sd, key):
    v = _np(sd[f"{key}.weight_v"]).transpose(2, 1, 0)  # (k, in, out)
    g = _np(sd[f"{key}.weight_g"]).reshape(-1)
    return {"v": v, "g": g, "b": _np(sd[f"{key}.bias"])}


def _gru_cell(sd, prefix, n_layers):
    """torch unidirectional GRU -> our GRUCell params (no direction axis)."""
    out = {}
    for l in range(n_layers):
        out[f"w_ih_l{l}"] = _np(sd[f"{prefix}.weight_ih_l{l}"]).T
        out[f"w_hh_l{l}"] = _np(sd[f"{prefix}.weight_hh_l{l}"]).T
        out[f"b_ih_l{l}"] = _np(sd[f"{prefix}.bias_ih_l{l}"])
        out[f"b_hh_l{l}"] = _np(sd[f"{prefix}.bias_hh_l{l}"])
    return out


# ---------------------------------------------------------------------------
# Module converters
# ---------------------------------------------------------------------------

def convert_text_encoder(sd: dict, n_layers: int) -> dict:
    """Reference TextEncoderTCN (hierarchy_net.py:22-52) -> our
    TextEncoderTCN params."""
    sd = _strip_module_prefix(sd)
    tcn = {}
    for i in range(n_layers):
        block = {
            "WeightNormConv1d_0": _weightnorm_conv(
                sd, f"tcn.network.{i}.conv1"),
            "WeightNormConv1d_1": _weightnorm_conv(
                sd, f"tcn.network.{i}.conv2"),
        }
        if f"tcn.network.{i}.downsample.weight" in sd:
            block["Conv_0"] = _conv1d(sd, f"tcn.network.{i}.downsample")
        tcn[f"TemporalBlock_{i}"] = block
    return {
        "embedding": _np(sd["embedding.weight"]),
        "TemporalConvNet_0": tcn,
        "Dense_0": _linear(sd, "decoder"),
    }


def convert_generator(sd: dict, n_layers: int) -> dict:
    """Reference Hierarchical_PoseGenerator (hierarchy_net.py:55-149) ->
    HierarchicalPoseGenerator params."""
    sd = _strip_module_prefix(sd)
    params = {
        "TextEncoderTCN_0": convert_text_encoder(
            {k[len("text_encoder."):]: v for k, v in sd.items()
             if k.startswith("text_encoder.")}, n_layers),
        "GRU_0": _gru(sd, "gru", n_layers),
        "Dense_0": _dense(sd, "out.0"),
        "Dense_1": _dense(sd, "out.2"),
    }
    if "speaker_embedding.0.weight" in sd:
        params["SpeakerZ_0"] = {
            "embedding": _np(sd["speaker_embedding.0.weight"]),
            "Dense_0": _dense(sd, "speaker_embedding.1"),
            "Dense_1": _dense(sd, "speaker_mu"),
            "Dense_2": _dense(sd, "speaker_logvar"),
        }
    return params


def convert_wav_encoder(sd: dict, prefix="audio_encoder"):
    """Reference raw-waveform WavEncoder (multimodal_context_net.py:9-28):
    4 strided Conv1d (+BN on the first three) -> (params, batch_stats)."""
    p, s = {}, {}
    conv_slots = (0, 3, 6, 9)   # Sequential indices of the convs
    bn_slots = (1, 4, 7)        # BatchNorm1d after the first three convs
    for i, slot in enumerate(conv_slots):
        p[f"Conv1d_{i}"] = {"Conv_0": _conv1d(
            sd, f"{prefix}.feat_extractor.{slot}")}
    for i, slot in enumerate(bn_slots):
        p[f"BatchNorm_{i}"] = _bn_params(sd, f"{prefix}.feat_extractor.{slot}")
        s[f"BatchNorm_{i}"] = _bn_stats(sd, f"{prefix}.feat_extractor.{slot}")
    return p, s


def convert_multimodal_generator(sd: dict, n_layers: int
                                 ) -> tuple[dict, dict]:
    """Reference multimodal-context PoseGenerator
    (multimodal_context_net.py:64-160) -> (params, batch_stats)."""
    sd = _strip_module_prefix(sd)
    wav_p, wav_s = convert_wav_encoder(sd)
    params = {
        "WavEncoder_0": wav_p,
        "TextEncoderTCN_0": convert_text_encoder(
            {k[len("text_encoder."):]: v for k, v in sd.items()
             if k.startswith("text_encoder.")}, n_layers),
        "GRU_0": _gru(sd, "gru", n_layers),
        "Dense_0": _dense(sd, "out.0"),
        "Dense_1": _dense(sd, "out.2"),
    }
    if "speaker_embedding.0.weight" in sd:
        params["SpeakerZ_0"] = {
            "embedding": _np(sd["speaker_embedding.0.weight"]),
            "Dense_0": _dense(sd, "speaker_embedding.1"),
            "Dense_1": _dense(sd, "speaker_mu"),
            "Dense_2": _dense(sd, "speaker_logvar"),
        }
    return params, {"WavEncoder_0": wav_s}


def convert_seq2seq(sd: dict, n_layers: int) -> tuple[dict, dict]:
    """Reference Seq2SeqNet gen_dict (seq2seq_net.py:219-254; generic
    loader train_utils.py:197-213) -> (params, batch_stats) for our
    Seq2SeqNet."""
    sd = _strip_module_prefix(sd)
    enc = {"embedding": _np(sd["encoder.embedding.weight"])}
    enc.update(_gru(sd, "encoder.gru", n_layers, bidirectional=True))
    pref = "decoder.decoder"
    dec = {
        "Attn_0": {"Dense_0": _dense(sd, f"{pref}.attn.attn"),
                   "v": _np(sd[f"{pref}.attn.v"])},
        "Dense_0": _dense(sd, f"{pref}.pre_linear.0"),
        "BatchNorm_0": _bn_params(sd, f"{pref}.pre_linear.1"),
        "GRUCell_0": _gru_cell(sd, f"{pref}.gru", n_layers),
        "Dense_1": _dense(sd, f"{pref}.out"),
    }
    if f"{pref}.speaker_embedding.weight" in sd:
        dec["speaker_embedding"] = _np(
            sd[f"{pref}.speaker_embedding.weight"])
    params = {"MaskedBiGRUEncoder_0": enc, "decoder_step": dec}
    stats = {"decoder_step": {
        "BatchNorm_0": _bn_stats(sd, f"{pref}.pre_linear.1")}}
    return params, stats


def _s2g_cnr(sd, key, is_2d=False):
    """speech2gesture ConvNormRelu Sequential (conv .0 + bn .1)
    -> our ConvNormRelu {Conv_0, BatchNorm_0} (params, stats)."""
    conv = _conv2d(sd, f"{key}.0") if is_2d else _conv1d(sd, f"{key}.0")
    return ({"Conv_0": conv, "BatchNorm_0": _bn_params(sd, f"{key}.1")},
            {"BatchNorm_0": _bn_stats(sd, f"{key}.1")})


def convert_s2g_generator(sd: dict) -> tuple[dict, dict]:
    """Reference speech2gesture.Generator (speech2gesture.py:200-231) ->
    (params, batch_stats) for our speech2gesture.Generator.  Flax auto-names
    follow call order: first_net 0-7 -> AudioEncoder ConvNormRelu_0..7,
    down1.0/down1.1 -> _8/_9, down2..down6 -> _10.._14, up1..up5 ->
    UnetUp_0..4."""
    sd = _strip_module_prefix(sd)
    ae_p, ae_s = {}, {}
    for i in range(8):
        p, s = _s2g_cnr(sd, f"audio_encoder.first_net.{i}", is_2d=True)
        ae_p[f"ConvNormRelu_{i}"], ae_s[f"ConvNormRelu_{i}"] = p, s
    for i, key in enumerate(
            ["down1.0", "down1.1", "down2", "down3", "down4", "down5",
             "down6"]):
        p, s = _s2g_cnr(sd, f"audio_encoder.{key}")
        ae_p[f"ConvNormRelu_{8 + i}"], ae_s[f"ConvNormRelu_{8 + i}"] = p, s
    for i in range(5):
        p, s = _s2g_cnr(sd, f"audio_encoder.up{i + 1}.conv")
        ae_p[f"UnetUp_{i}"] = {"ConvNormRelu_0": p}
        ae_s[f"UnetUp_{i}"] = {"ConvNormRelu_0": s}

    params = {"AudioEncoder_0": ae_p,
              "Dense_0": _dense(sd, "pre_pose_encoder.0"),
              "BatchNorm_0": _bn_params(sd, "pre_pose_encoder.1"),
              "Dense_1": _dense(sd, "pre_pose_encoder.3"),
              "Conv_0": _conv1d(sd, "final_out")}
    stats = {"AudioEncoder_0": ae_s,
             "BatchNorm_0": _bn_stats(sd, "pre_pose_encoder.1")}
    for i in range(4):
        p, s = _s2g_cnr(sd, f"decoder.{i}")
        params[f"ConvNormRelu_{i}"], stats[f"ConvNormRelu_{i}"] = p, s
    return params, stats


def convert_s2g_discriminator(sd: dict) -> tuple[dict, dict]:
    """Reference speech2gesture.Discriminator (speech2gesture.py:234-250)
    -> (params, batch_stats)."""
    sd = _strip_module_prefix(sd)
    p1, s1 = _s2g_cnr(sd, "net.2")
    p2, s2 = _s2g_cnr(sd, "net.3")
    params = {"Conv_0": _conv1d(sd, "net.0"),
              "ConvNormRelu_0": p1, "ConvNormRelu_1": p2,
              "Conv_1": _conv1d(sd, "net.4")}
    return params, {"ConvNormRelu_0": s1, "ConvNormRelu_1": s2}


def _se_block(sd, key, has_downsample):
    """SEBasicBlock (ResNetBlocks.py:7-37)."""
    block_p = {
        "Conv2d_0": {"Conv_0": _conv2d(sd, f"{key}.conv1", bias=False)},
        "BatchNorm_0": _bn_params(sd, f"{key}.bn1"),
        "Conv2d_1": {"Conv_0": _conv2d(sd, f"{key}.conv2", bias=False)},
        "BatchNorm_1": _bn_params(sd, f"{key}.bn2"),
        "SELayer_0": {"Dense_0": _dense(sd, f"{key}.se.fc.0"),
                      "Dense_1": _dense(sd, f"{key}.se.fc.2")},
    }
    block_s = {"BatchNorm_0": _bn_stats(sd, f"{key}.bn1"),
               "BatchNorm_1": _bn_stats(sd, f"{key}.bn2")}
    if has_downsample:
        block_p["Conv2d_2"] = {"Conv_0": _conv2d(
            sd, f"{key}.downsample.0", bias=False)}
        block_p["BatchNorm_2"] = _bn_params(sd, f"{key}.downsample.1")
        block_s["BatchNorm_2"] = _bn_stats(sd, f"{key}.downsample.1")
    return block_p, block_s


def convert_audio_encoder(sd: dict, layers=(3, 4, 6, 3)) -> tuple[dict, dict]:
    """Reference ResNetSE audio_dict (hierarchy_net.py:10-19 wraps
    ResNetSE34V2.py) -> (params, batch_stats) for HierarchicalWavEncoder."""
    sd = _strip_module_prefix(sd)
    if any(k.startswith("feat_extractor.") for k in sd):
        sd = {k[len("feat_extractor."):]: v for k, v in sd.items()
              if k.startswith("feat_extractor.")}

    params: dict[str, Any] = {
        "Conv2d_0": {"Conv_0": _conv2d(sd, "conv1")},
        "BatchNorm_0": _bn_params(sd, "bn1"),
    }
    stats: dict[str, Any] = {"BatchNorm_0": _bn_stats(sd, "bn1")}

    block_idx = 0
    for stage, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            key = f"layer{stage + 1}.{b}"
            has_ds = f"{key}.downsample.0.weight" in sd
            bp, bs = _se_block(sd, key, has_ds)
            params[f"SEBasicBlock_{block_idx}"] = bp
            stats[f"SEBasicBlock_{block_idx}"] = bs
            block_idx += 1

    # taps: conv_low/mid/high + bn + fc (ResNetSE34V2.py:34-44)
    for i, name in enumerate(("low", "mid", "high")):
        params[f"Conv2d_{i + 1}"] = {"Conv_0": _conv2d(sd, f"conv_{name}")}
        params[f"BatchNorm_{i + 1}"] = _bn_params(sd, f"bn_{name}")
        stats[f"BatchNorm_{i + 1}"] = _bn_stats(sd, f"bn_{name}")
        params[f"Dense_{i}"] = _dense(sd, f"fc_{name}")

    if "speaker_embedding.0.weight" in sd:
        params["speaker_embedding"] = _np(sd["speaker_embedding.0.weight"])
        params["Dense_3"] = _dense(sd, "speaker_embedding.1")
        params["Dense_4"] = _dense(sd, "fc1")
        params["Dense_5"] = _dense(sd, "fc2")
    return {"ResNetSE_0": params}, {"ResNetSE_0": stats}


def convert_discriminator(sd: dict) -> tuple[dict, dict]:
    """Reference Hierarchical_ConvDiscriminator (hierarchy_net.py:197-242)
    -> ConvDiscriminator (params, batch_stats)."""
    sd = _strip_module_prefix(sd)
    params = {
        "Conv1d_0": {"Conv_0": _conv1d(sd, "pre_conv.0")},
        "BatchNorm_0": _bn_params(sd, "pre_conv.1"),
        "Conv1d_1": {"Conv_0": _conv1d(sd, "pre_conv.3")},
        "BatchNorm_1": _bn_params(sd, "pre_conv.4"),
        "Conv1d_2": {"Conv_0": _conv1d(sd, "pre_conv.6")},
        "GRU_0": _gru(sd, "gru", 4),
        "Dense_0": _dense(sd, "out"),
        "Dense_1": _dense(sd, "out2"),
    }
    stats = {"BatchNorm_0": _bn_stats(sd, "pre_conv.1"),
             "BatchNorm_1": _bn_stats(sd, "pre_conv.4")}
    return params, stats


def _convT1d(sd, key):
    """torch ConvTranspose1d weight (in, out, k) -> flax (k, in, out).

    torch's transposed conv is the true conv gradient (spatially flipped
    kernel); flax ConvTranspose is a fractionally-strided conv without the
    flip, so the spatial axis is reversed on import."""
    w = _np(sd[f"{key}.weight"]).transpose(2, 0, 1)[::-1]
    return {"kernel": np.ascontiguousarray(w),
            "bias": _np(sd[f"{key}.bias"])}


def _cnr(sd, key):
    """ConvNormRelu Sequential(conv, bn, lrelu) (embedding_net.py:16-39)."""
    p = {"Conv1d_0": {"Conv_0": _conv1d(sd, f"{key}.0")},
         "BatchNorm_0": _bn_params(sd, f"{key}.1")}
    s = {"BatchNorm_0": _bn_stats(sd, f"{key}.1")}
    return p, s


def convert_pose_encoder(sd: dict, prefix="pose_encoder"):
    """Reference PoseEncoderConv (embedding_net.py:42-82) ->
    (params, batch_stats) for our PoseEncoderConv."""
    p, s = {}, {}
    for i in range(3):
        bp, bs = _cnr(sd, f"{prefix}.net.{i}")
        p[f"ConvNormRelu1d_{i}"] = bp
        s[f"ConvNormRelu1d_{i}"] = bs
    p["Conv1d_0"] = {"Conv_0": _conv1d(sd, f"{prefix}.net.3")}
    p["Dense_0"] = _dense(sd, f"{prefix}.out_net.0")
    p["BatchNorm_0"] = _bn_params(sd, f"{prefix}.out_net.1")
    s["BatchNorm_0"] = _bn_stats(sd, f"{prefix}.out_net.1")
    p["Dense_1"] = _dense(sd, f"{prefix}.out_net.3")
    p["BatchNorm_1"] = _bn_params(sd, f"{prefix}.out_net.4")
    s["BatchNorm_1"] = _bn_stats(sd, f"{prefix}.out_net.4")
    p["Dense_2"] = _dense(sd, f"{prefix}.out_net.6")
    if f"{prefix}.fc_mu.weight" in sd:  # MotionAE's encoder has no heads
        p["Dense_3"] = _dense(sd, f"{prefix}.fc_mu")
        p["Dense_4"] = _dense(sd, f"{prefix}.fc_logvar")
    return p, s


def convert_pose_decoder(sd: dict, prefix="decoder"):
    """Reference PoseDecoderConv (embedding_net.py:165-217) ->
    (params, batch_stats) for our PoseDecoderConv/MotionDecoderConv."""
    p = {"Dense_0": _dense(sd, f"{prefix}.pre_net.0"),
         "BatchNorm_0": _bn_params(sd, f"{prefix}.pre_net.1"),
         "Dense_1": _dense(sd, f"{prefix}.pre_net.3"),
         "ConvTranspose_0": _convT1d(sd, f"{prefix}.net.0"),
         "BatchNorm_1": _bn_params(sd, f"{prefix}.net.1"),
         "ConvTranspose_1": _convT1d(sd, f"{prefix}.net.3"),
         "BatchNorm_2": _bn_params(sd, f"{prefix}.net.4"),
         "Conv1d_0": {"Conv_0": _conv1d(sd, f"{prefix}.net.6")},
         "Conv1d_1": {"Conv_0": _conv1d(sd, f"{prefix}.net.7")}}
    s = {"BatchNorm_0": _bn_stats(sd, f"{prefix}.pre_net.1"),
         "BatchNorm_1": _bn_stats(sd, f"{prefix}.net.1"),
         "BatchNorm_2": _bn_stats(sd, f"{prefix}.net.4")}
    return p, s


def convert_embedding_net_pose(sd: dict) -> tuple[dict, dict]:
    """Reference EmbeddingNet(mode='pose') gen_dict — the TED-Gesture FGD
    embedder (embedding_space_evaluator.py:27-30)."""
    sd = _strip_module_prefix(sd)
    enc_p, enc_s = convert_pose_encoder(sd)
    dec_p, dec_s = convert_pose_decoder(sd)
    return ({"PoseEncoderConv_0": enc_p, "PoseDecoderConv_0": dec_p},
            {"PoseEncoderConv_0": enc_s, "PoseDecoderConv_0": dec_s})


def convert_motion_ae(sd: dict) -> tuple[dict, dict]:
    """Reference MotionAE motion_ae dict — the TED Expressive FGD embedder
    (embedding_space_evaluator.py:31-34; motion_ae.py:118-130)."""
    sd = _strip_module_prefix(sd)
    enc_p, enc_s = convert_pose_encoder(sd, prefix="encoder")
    dec_p, dec_s = convert_pose_decoder(sd, prefix="decoder")
    return ({"MotionEncoderConv_0": enc_p, "MotionDecoderConv_0": dec_p},
            {"MotionEncoderConv_0": enc_s, "MotionDecoderConv_0": dec_s})


def convert_embedding_net_full(sd: dict, tcn_layers: int = 4
                               ) -> tuple[dict, dict]:
    """Reference EmbeddingNet(mode='speech'/'both') gen_dict — the
    joint_embedding model (embedding_net.py:260-294: ContextEncoder +
    PoseEncoderConv + PoseDecoderGRU) -> (params, batch_stats)."""
    sd = _strip_module_prefix(sd)
    sub = lambda prefix: {k[len(prefix):]: v for k, v in sd.items()
                          if k.startswith(prefix)}
    wav_p, wav_s = convert_wav_encoder(sd, prefix="context_encoder.audio_encoder")
    ctx_p = {
        "TextEncoderTCN_0": convert_text_encoder(
            sub("context_encoder.text_encoder."), tcn_layers),
        "WavEncoder_0": wav_p,
        "GRU_0": _gru(sd, "context_encoder.gru", 2, bidirectional=False),
        "Dense_0": _dense(sd, "context_encoder.out.0"),
        "BatchNorm_0": _bn_params(sd, "context_encoder.out.1"),
        "Dense_1": _dense(sd, "context_encoder.out.3"),
        "Dense_2": _dense(sd, "context_encoder.fc_mu"),
        "Dense_3": _dense(sd, "context_encoder.fc_logvar"),
    }
    ctx_s = {"WavEncoder_0": wav_s,
             "BatchNorm_0": _bn_stats(sd, "context_encoder.out.1")}
    pose_p, pose_s = convert_pose_encoder(sd, prefix="pose_encoder")
    dec_p = {
        "Dense_0": _dense(sd, "decoder.pre_pose_net.0"),
        "BatchNorm_0": _bn_params(sd, "decoder.pre_pose_net.1"),
        "Dense_1": _dense(sd, "decoder.pre_pose_net.3"),
        "GRU_0": _gru(sd, "decoder.gru", 4, bidirectional=True),
        "Dense_2": _dense(sd, "decoder.out.0"),
        "Dense_3": _dense(sd, "decoder.out.2"),
    }
    dec_s = {"BatchNorm_0": _bn_stats(sd, "decoder.pre_pose_net.1")}
    return ({"ContextEncoder_0": ctx_p, "PoseEncoderConv_0": pose_p,
             "PoseDecoderGRU_0": dec_p},
            {"ContextEncoder_0": ctx_s, "PoseEncoderConv_0": pose_s,
             "PoseDecoderGRU_0": dec_s})


# ---------------------------------------------------------------------------
# Full checkpoint import
# ---------------------------------------------------------------------------

def vocab_from_pickled(obj) -> "Vocab":
    """Rebuild our Vocab from the reference's pickled Vocab attributes
    (word2index/index2word/n_words, optional word_embedding_weights)."""
    from ha2g_tpu.data.vocab import Vocab
    v = Vocab(getattr(obj, "name", "words"),
              insert_default_tokens="<SOS>" in getattr(obj, "word2index", {})
              or 1 in getattr(obj, "index2word", {})
              and getattr(obj, "index2word", {}).get(1) == "<SOS>")
    v.word2index = dict(obj.word2index)
    v.index2word = {int(k): w for k, w in obj.index2word.items()}
    v.word2count = dict(getattr(obj, "word2count", {}))
    v.n_words = int(obj.n_words)
    wev = getattr(obj, "word_embedding_weights", None)
    if wev is not None:
        v.word_embedding_weights = np.asarray(wev, np.float32)
    return v


def config_from_reference_args(args_obj) -> "Config":
    """Reference checkpoints embed their argparse Namespace
    (train_utils.py:172); map its fields onto our Config."""
    from ha2g_tpu.config import Config
    d = dict(vars(args_obj)) if not isinstance(args_obj, dict)         else dict(args_obj)
    if "model" not in d:
        d["model"] = "hierarchy"
    d["dataset"] = "ted_expressive" if d.get("pose_dim") == 126         else "ted_gesture"
    for k in ("mean_dir_vec", "mean_pose"):
        if k in d and d[k] is not None:
            d[k] = list(np.asarray(d[k], np.float32).reshape(-1).astype(float))
    for k in ("train_data_path", "val_data_path", "test_data_path"):
        if isinstance(d.get(k), list):
            d[k] = d[k][0] if d[k] else ""
    # reference-trained expressive hierarchy weights expect the off-by-one
    # pre-seq head-fill layout (skeleton.py::ref_routing_compat)
    if d["model"] == "hierarchy" and d["dataset"] == "ted_expressive":
        d["ref_routing_compat"] = True
    return Config.from_dict(d)


def _check_tree(template, new, path=""):
    """Structural check of an imported tree against the init template, with
    informative errors."""
    t_keys = set(template.keys())
    n_keys = set(new.keys())
    assert t_keys == n_keys, \
        f"{path}: template {sorted(t_keys)} vs import {sorted(n_keys)}"
    for k in t_keys:
        if isinstance(template[k], dict):
            _check_tree(template[k], new[k], f"{path}/{k}")
        else:
            assert template[k].shape == new[k].shape, \
                f"{path}/{k}: {template[k].shape} vs {new[k].shape}"


def import_hierarchy_checkpoint(ckpt: dict, state, n_layers: int = 4):
    """Map a reference hierarchy checkpoint dict (train.py:232-243 keys)
    onto a HierarchyState, returning the new state.  `state` provides the
    pytree template (from HierarchySystem.init)."""
    import jax

    n_levels = len(state.params["gens"])
    gens = tuple(
        convert_generator(ckpt[f"gen_dict_{l + 1}"], n_layers)
        for l in range(n_levels))
    audio_p, audio_s = convert_audio_encoder(ckpt["audio_dict"])
    dis_p, dis_s = convert_discriminator(ckpt["dis_dict"])
    text_p = convert_text_encoder(ckpt["text_dict"], n_layers)

    new_params = {"audio": audio_p, "text": text_p, "gens": gens,
                  "dis": dis_p}
    new_stats = {"audio": audio_s, "dis": dis_s}

    check = _check_tree
    check(state.params["audio"], audio_p, "audio")
    check(state.params["text"], text_p, "text")
    for l in range(n_levels):
        check(state.params["gens"][l], gens[l], f"g{l + 1}")
    check(state.params["dis"], dis_p, "dis")
    check(state.batch_stats["audio"], audio_s, "audio_stats")
    check(state.batch_stats["dis"], dis_s, "dis_stats")

    as_jnp = lambda tree: jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), tree)
    return state.replace(params=as_jnp(new_params),
                         batch_stats=as_jnp(new_stats))


def import_generic_checkpoint(ckpt: dict, state, cfg):
    """Map a reference generic checkpoint ({args, gen_dict, dis_dict, ...},
    train.py:239-244; loader train_utils.py:197-213) onto the matching
    system state for multimodal_context / seq2seq / speech2gesture /
    joint_embedding.  `state` provides the pytree template."""
    import jax

    model = cfg.model
    n_layers = cfg.n_layers
    if model == "multimodal_context":
        gen_p, gen_s = convert_multimodal_generator(ckpt["gen_dict"],
                                                    n_layers)
        dis_p, dis_s = convert_discriminator(ckpt["dis_dict"])
        new_params = {"gen": gen_p, "dis": dis_p}
        new_stats = {"gen": gen_s, "dis": dis_s}
    elif model == "seq2seq":
        new_params, new_stats = convert_seq2seq(ckpt["gen_dict"], n_layers)
    elif model == "speech2gesture":
        gen_p, gen_s = convert_s2g_generator(ckpt["gen_dict"])
        dis_p, dis_s = convert_s2g_discriminator(ckpt["dis_dict"])
        new_params = {"gen": gen_p, "dis": dis_p}
        new_stats = {"gen": gen_s, "dis": dis_s}
    elif model == "joint_embedding":
        new_params, new_stats = convert_embedding_net_full(ckpt["gen_dict"])
    else:
        raise ValueError(f"no generic importer for model {model!r} "
                         "(hierarchy uses import_hierarchy_checkpoint)")

    _check_tree(state.params, new_params, "params")
    _check_tree(state.batch_stats, new_stats, "batch_stats")
    as_jnp = lambda tree: jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), tree)
    return state.replace(params=as_jnp(new_params),
                         batch_stats=as_jnp(new_stats))

"""Clean-room PyTorch mirrors of the reference HA2G architectures.

Written from the architecture descriptions in SURVEY.md / PARITY.md (NOT
copied from the reference): these exist solely so tests can produce
state dicts with the reference's key names and forward math, to validate
ha2g_tpu/import_torch.py end to end (random weights -> import -> forward
equivalence).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm


class TorchTemporalBlock(nn.Module):
    def __init__(self, n_in, n_out, k, dilation):
        super().__init__()
        pad = (k - 1) * dilation
        self.conv1 = weight_norm(nn.Conv1d(n_in, n_out, k, padding=pad,
                                           dilation=dilation))
        self.conv2 = weight_norm(nn.Conv1d(n_out, n_out, k, padding=pad,
                                           dilation=dilation))
        self.downsample = nn.Conv1d(n_in, n_out, 1) if n_in != n_out else None
        self.pad = pad

    def forward(self, x):
        y = F.relu(self.conv1(x)[:, :, :-self.pad])
        y = F.relu(self.conv2(y)[:, :, :-self.pad])
        res = x if self.downsample is None else self.downsample(x)
        return F.relu(y + res)


class TorchTCN(nn.Module):
    def __init__(self, n_in, channels, k=2):
        super().__init__()
        blocks = []
        for i, ch in enumerate(channels):
            blocks.append(TorchTemporalBlock(
                n_in if i == 0 else channels[i - 1], ch, k, 2 ** i))
        self.network = nn.Sequential(*blocks)

    def forward(self, x):
        return self.network(x)


class TorchTextEncoderTCN(nn.Module):
    """Key names match reference TextEncoderTCN (hierarchy_net.py:22-52)."""

    def __init__(self, n_words, embed=300, hidden=16, n_layers=2):
        super().__init__()
        self.embedding = nn.Embedding(n_words, embed)
        self.tcn = TorchTCN(embed, [hidden] * n_layers)
        self.decoder = nn.Linear(hidden, 32)

    def forward(self, tokens):
        emb = self.embedding(tokens)
        y = self.tcn(emb.transpose(1, 2)).transpose(1, 2)
        return self.decoder(y)


class TorchHierGenerator(nn.Module):
    """Key names match reference Hierarchical_PoseGenerator
    (hierarchy_net.py:55-149)."""

    def __init__(self, pose_dim, n_words, n_speakers, hidden=16, n_layers=2,
                 embed_dim=300):
        super().__init__()
        self.hidden_size = hidden
        self.text_encoder = TorchTextEncoderTCN(n_words, embed_dim, hidden,
                                                n_layers)
        self.speaker_embedding = nn.Sequential(nn.Embedding(n_speakers, 16),
                                               nn.Linear(16, 16))
        self.speaker_mu = nn.Linear(16, 16)
        self.speaker_logvar = nn.Linear(16, 16)
        in_size = 32 + 32 + pose_dim + 1 + 16
        self.gru = nn.GRU(in_size, hidden, n_layers, batch_first=True,
                          bidirectional=True)
        self.out = nn.Sequential(nn.Linear(hidden, hidden // 2),
                                 nn.LeakyReLU(),  # slope 0.01
                                 nn.Linear(hidden // 2, pose_dim))

    def forward(self, pre_seq, tokens, audio_feat, vids):
        text_feat = self.text_encoder(tokens)
        z = self.speaker_embedding(vids)
        mu = self.speaker_mu(z)
        logvar = self.speaker_logvar(z)
        z = mu + torch.randn_like(mu) * torch.exp(0.5 * logvar)
        x = torch.cat([pre_seq, audio_feat, text_feat,
                       z.unsqueeze(1).repeat(1, pre_seq.shape[1], 1)], dim=2)
        out, _ = self.gru(x)
        out = out[:, :, :self.hidden_size] + out[:, :, self.hidden_size:]
        return self.out(out), z, mu, logvar


class TorchSEBasic(nn.Module):
    def __init__(self, n_in, planes, stride=1, reduction=8):
        super().__init__()
        self.conv1 = nn.Conv2d(n_in, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.se = nn.Module()
        self.se.fc = nn.Sequential(nn.Linear(planes, planes // reduction),
                                   nn.ReLU(), nn.Linear(planes // reduction,
                                                        planes), nn.Sigmoid())
        if stride != 1 or n_in != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(n_in, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))
        else:
            self.downsample = None

    def forward(self, x):
        res = x
        y = self.bn1(F.relu(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        w = self.se.fc(y.mean(dim=(2, 3)))
        y = y * w[:, :, None, None]
        if self.downsample is not None:
            res = self.downsample(x)
        return F.relu(y + res)


class TorchResNetSE(nn.Module):
    """Key names match reference ResNetSE (ResNetSE34V2.py)."""

    def __init__(self, n_speakers, pose_level=3, n_out=32,
                 layers=(3, 4, 6, 3), filters=(32, 64, 128, 256)):
        super().__init__()
        self.pose_level = pose_level
        self.conv1 = nn.Conv2d(1, filters[0], 3, 1, 1)
        self.bn1 = nn.BatchNorm2d(filters[0])

        def stage(n_in, planes, blocks, stride):
            mods = [TorchSEBasic(n_in, planes, stride)]
            for _ in range(1, blocks):
                mods.append(TorchSEBasic(planes, planes))
            return nn.Sequential(*mods)

        self.layer1 = stage(filters[0], filters[0], layers[0], 1)
        self.layer2 = stage(filters[0], filters[1], layers[1], 2)
        self.layer3 = stage(filters[1], filters[2], layers[2], 2)
        self.layer4 = stage(filters[2], filters[3], layers[3], 2)

        self.conv_low = nn.Conv2d(64, 64, 2)
        self.bn_low = nn.BatchNorm2d(64)
        self.fc_low = nn.Linear(63 * 64, n_out)
        self.conv_mid = nn.Conv2d(32, 32, 3)
        self.bn_mid = nn.BatchNorm2d(32)
        self.fc_mid = nn.Linear(62 * 32, n_out)
        self.conv_high = nn.Conv2d(16, 16, 3)
        self.bn_high = nn.BatchNorm2d(16)
        self.fc_high = nn.Linear(62 * 16, n_out)

        self.speaker_embedding = nn.Sequential(nn.Embedding(n_speakers, 16),
                                               nn.Linear(16, 16))
        self.fc1 = nn.Linear(16, 32)
        self.fc2 = nn.Linear(32, pose_level * 3)

    def _tap(self, feat, conv, bn, fc, shuffle):
        if shuffle > 1:
            feat = F.pixel_shuffle(feat, shuffle)
        feat = bn(F.relu(conv(feat)))
        B = feat.shape[0]
        feat = feat.reshape(B, -1, feat.shape[-1]).transpose(1, 2)
        return fc(feat)

    def forward(self, spec, vids):
        x = spec.unsqueeze(1)
        x = self.bn1(F.relu(self.conv1(x)))
        x = self.layer1(x)
        f1 = self.layer2(x)
        f2 = self.layer3(f1)
        f3 = self.layer4(f2)
        lo = self._tap(f1, self.conv_low, self.bn_low, self.fc_low, 1)
        mid = self._tap(f2, self.conv_mid, self.bn_mid, self.fc_mid, 2)
        hi = self._tap(f3, self.conv_high, self.bn_high, self.fc_high, 4)
        z = self.speaker_embedding(vids)
        h = F.elu(z)
        h = F.elu(self.fc1(h))
        w = F.softmax(self.fc2(h).reshape(-1, 3, self.pose_level), dim=1)
        blends = [w[:, 0, i, None, None] * lo + w[:, 1, i, None, None] * mid
                  + w[:, 2, i, None, None] * hi
                  for i in range(self.pose_level)]
        return w, lo, mid, hi, blends


class TorchConvDiscriminator(nn.Module):
    """Key names match reference Hierarchical_ConvDiscriminator
    (hierarchy_net.py:197-242)."""

    def __init__(self, input_size, hidden=64):
        super().__init__()
        self.hidden_size = hidden
        self.pre_conv = nn.Sequential(
            nn.Conv1d(input_size, 16, 3), nn.BatchNorm1d(16), nn.LeakyReLU(),
            nn.Conv1d(16, 8, 3), nn.BatchNorm1d(8), nn.LeakyReLU(),
            nn.Conv1d(8, 8, 3))
        self.gru = nn.GRU(8, hidden, 4, bidirectional=True, batch_first=True,
                          dropout=0.3)
        self.out = nn.Linear(hidden, 1)
        self.out2 = nn.Linear(28, 1)

    def forward(self, poses):
        x = self.pre_conv(poses.transpose(1, 2)).transpose(1, 2)
        out, _ = self.gru(x)
        out = out[:, :, :self.hidden_size] + out[:, :, self.hidden_size:]
        out = self.out(out).squeeze(-1)
        return torch.sigmoid(self.out2(out))


class TorchPoseEncoderConv(nn.Module):
    """Key names match reference PoseEncoderConv (embedding_net.py:42-82);
    with_heads=False gives MotionAE's encoder (motion_ae.py:33-62)."""

    def __init__(self, pose_dim, latent=32, with_heads=True):
        super().__init__()
        def cnr(i, o, k=3, s=1):
            return nn.Sequential(nn.Conv1d(i, o, k, s), nn.BatchNorm1d(o),
                                 nn.LeakyReLU(0.2))
        self.net = nn.Sequential(cnr(pose_dim, 32), cnr(32, 64),
                                 cnr(64, 64, 4, 2), nn.Conv1d(64, 32, 3))
        self.out_net = nn.Sequential(
            nn.Linear(384, 256), nn.BatchNorm1d(256), nn.LeakyReLU(1.0),
            nn.Linear(256, 128), nn.BatchNorm1d(128), nn.LeakyReLU(1.0),
            nn.Linear(128, latent))
        self.with_heads = with_heads
        if with_heads:
            self.fc_mu = nn.Linear(latent, latent)
            self.fc_logvar = nn.Linear(latent, latent)

    def forward(self, poses):
        x = self.net(poses.transpose(1, 2)).flatten(1)
        x = self.out_net(x)
        if self.with_heads:
            return self.fc_mu(x)  # z = mu (variational off)
        return x


class TorchPoseDecoderConv(nn.Module):
    """Key names match reference PoseDecoderConv (embedding_net.py:165-217,
    34-frame branch)."""

    def __init__(self, pose_dim, latent=32):
        super().__init__()
        self.pre_net = nn.Sequential(nn.Linear(latent, 64),
                                     nn.BatchNorm1d(64), nn.LeakyReLU(1.0),
                                     nn.Linear(64, 136))
        self.net = nn.Sequential(
            nn.ConvTranspose1d(4, 32, 3), nn.BatchNorm1d(32),
            nn.LeakyReLU(0.2),
            nn.ConvTranspose1d(32, 32, 3), nn.BatchNorm1d(32),
            nn.LeakyReLU(0.2),
            nn.Conv1d(32, 32, 3), nn.Conv1d(32, pose_dim, 3))

    def forward(self, feat):
        x = self.pre_net(feat).view(feat.shape[0], 4, -1)
        return self.net(x).transpose(1, 2)


class TorchEmbeddingNetPose(nn.Module):
    """Key names match reference EmbeddingNet(mode='pose')."""

    def __init__(self, pose_dim):
        super().__init__()
        self.pose_encoder = TorchPoseEncoderConv(pose_dim)
        self.decoder = TorchPoseDecoderConv(pose_dim)

    def forward(self, poses):
        z = self.pose_encoder(poses)
        return self.decoder(z), z


class TorchMotionAE(nn.Module):
    """Key names match reference MotionAE (motion_ae.py:118-130)."""

    def __init__(self, pose_dim, latent=128):
        super().__init__()
        self.encoder = TorchPoseEncoderConv(pose_dim, latent,
                                            with_heads=False)
        self.decoder = TorchPoseDecoderConv(pose_dim, latent)

    def forward(self, poses):
        z = self.encoder(poses)
        return self.decoder(z), z


class TorchWavEncoder(nn.Module):
    """Key names match reference WavEncoder (multimodal_context_net.py:9-28)."""

    def __init__(self):
        super().__init__()
        self.feat_extractor = nn.Sequential(
            nn.Conv1d(1, 16, 15, stride=5, padding=1600),
            nn.BatchNorm1d(16), nn.LeakyReLU(0.3),
            nn.Conv1d(16, 32, 15, stride=6),
            nn.BatchNorm1d(32), nn.LeakyReLU(0.3),
            nn.Conv1d(32, 64, 15, stride=6),
            nn.BatchNorm1d(64), nn.LeakyReLU(0.3),
            nn.Conv1d(64, 32, 15, stride=6))

    def forward(self, wav):
        return self.feat_extractor(wav.unsqueeze(1)).transpose(1, 2)


class TorchMultimodalGenerator(nn.Module):
    """Key names match reference multimodal PoseGenerator
    (multimodal_context_net.py:64-160)."""

    def __init__(self, pose_dim, n_words, n_speakers, hidden=16, n_layers=2):
        super().__init__()
        self.hidden_size = hidden
        self.audio_encoder = TorchWavEncoder()
        self.text_encoder = TorchTextEncoderTCN(n_words, 300, hidden,
                                                n_layers)
        self.speaker_embedding = nn.Sequential(nn.Embedding(n_speakers, 16),
                                               nn.Linear(16, 16))
        self.speaker_mu = nn.Linear(16, 16)
        self.speaker_logvar = nn.Linear(16, 16)
        in_size = 32 + 32 + pose_dim + 1 + 16
        self.gru = nn.GRU(in_size, hidden, n_layers, batch_first=True,
                          bidirectional=True)
        self.out = nn.Sequential(nn.Linear(hidden, hidden // 2),
                                 nn.LeakyReLU(1.0),  # LeakyReLU(True) quirk
                                 nn.Linear(hidden // 2, pose_dim))

    def forward(self, pre_seq, tokens, wav, vids):
        audio_feat = self.audio_encoder(wav)
        text_feat = self.text_encoder(tokens)
        z = self.speaker_embedding(vids)
        mu = self.speaker_mu(z)
        logvar = self.speaker_logvar(z)
        z = mu + torch.randn_like(mu) * torch.exp(0.5 * logvar)
        x = torch.cat([pre_seq, audio_feat, text_feat,
                       z.unsqueeze(1).repeat(1, pre_seq.shape[1], 1)], dim=2)
        out, _ = self.gru(x)
        out = out[:, :, :self.hidden_size] + out[:, :, self.hidden_size:]
        return self.out(out), z, mu, logvar


class TorchAttn(nn.Module):
    """Key names match reference Attn (seq2seq_net.py:59-89)."""

    def __init__(self, hidden):
        super().__init__()
        self.hidden_size = hidden
        self.attn = nn.Linear(hidden * 2, hidden)
        self.v = nn.Parameter(torch.rand(hidden))
        self.v.data.normal_(0, 1.0 / (hidden ** 0.5))

    def forward(self, hidden, encoder_outputs):
        # hidden (B, H); encoder_outputs (T, B, H) -> (B, 1, T)
        T = encoder_outputs.size(0)
        H = hidden.repeat(T, 1, 1).transpose(0, 1)
        enc = encoder_outputs.transpose(0, 1)
        energy = torch.tanh(self.attn(torch.cat([H, enc], 2))).transpose(2, 1)
        v = self.v.repeat(enc.shape[0], 1).unsqueeze(1)
        return F.softmax(torch.bmm(v, energy).squeeze(1), dim=1).unsqueeze(1)


class TorchBahdanauDecoder(nn.Module):
    """Key names match reference BahdanauAttnDecoderRNN
    (seq2seq_net.py:94-187)."""

    def __init__(self, input_size, hidden, output_size, n_layers,
                 n_speakers=0):
        super().__init__()
        self.n_layers = n_layers
        linear_input_size = input_size + hidden
        if n_speakers:
            self.speaker_embedding = nn.Embedding(n_speakers, 8)
            linear_input_size += 8
        else:
            self.speaker_embedding = None
        self.pre_linear = nn.Sequential(nn.Linear(linear_input_size, hidden),
                                        nn.BatchNorm1d(hidden),
                                        nn.ReLU(inplace=True))
        self.attn = TorchAttn(hidden)
        self.gru = nn.GRU(hidden, hidden, n_layers)
        self.out = nn.Linear(hidden, output_size)

    def forward(self, motion_input, last_hidden, encoder_outputs, vids):
        motion_input = motion_input.view(1, motion_input.size(0), -1)
        attn_weights = self.attn(last_hidden[-1], encoder_outputs)
        context = attn_weights.bmm(
            encoder_outputs.transpose(0, 1)).transpose(0, 1)
        rnn_input = torch.cat((motion_input, context), 2)
        if self.speaker_embedding is not None:
            rnn_input = torch.cat(
                (rnn_input, self.speaker_embedding(vids).unsqueeze(0)), 2)
        rnn_input = self.pre_linear(rnn_input.squeeze(0)).unsqueeze(0)
        output, hidden = self.gru(rnn_input, last_hidden)
        return self.out(output.squeeze(0)), hidden, attn_weights


class _GeneratorWrap(nn.Module):
    """Reference Generator wraps the decoder (seq2seq_net.py:192-216), so
    checkpoint keys are decoder.decoder.*"""

    def __init__(self, decoder):
        super().__init__()
        self.decoder = decoder
        self.output_size = decoder.out.out_features
        self.n_layers = decoder.n_layers


class TorchSeq2SeqNet(nn.Module):
    """Key names match reference Seq2SeqNet (seq2seq_net.py:219-254)."""

    def __init__(self, pose_dim, n_frames, n_words, embed=300, hidden=16,
                 n_layers=2, n_pre_poses=4, n_speakers=0):
        super().__init__()
        enc = nn.Module()
        enc.embedding = nn.Embedding(n_words, embed)
        enc.gru = nn.GRU(embed, hidden, n_layers, bidirectional=True)
        self.encoder = enc
        self.hidden_size = hidden
        self.decoder = _GeneratorWrap(TorchBahdanauDecoder(
            pose_dim, hidden, pose_dim, n_layers, n_speakers))
        self.n_frames = n_frames
        self.n_pre_poses = n_pre_poses

    def forward(self, in_text, in_lengths, poses, vids):
        in_text = in_text.transpose(0, 1)
        poses = poses.transpose(0, 1)
        outputs = torch.zeros(self.n_frames, poses.size(1),
                              self.decoder.output_size)
        embedded = self.encoder.embedding(in_text)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            embedded, in_lengths, enforce_sorted=False)
        enc_out, enc_hidden = self.encoder.gru(packed)
        enc_out, _ = torch.nn.utils.rnn.pad_packed_sequence(enc_out)
        enc_out = enc_out[:, :, :self.hidden_size] + \
            enc_out[:, :, self.hidden_size:]
        decoder_hidden = enc_hidden[:self.decoder.n_layers]
        decoder_input = poses[0]
        outputs[0] = decoder_input
        for t in range(1, self.n_frames):
            out, decoder_hidden, _ = self.decoder.decoder(
                decoder_input, decoder_hidden, enc_out, vids)
            outputs[t] = out
            decoder_input = poses[t] if t < self.n_pre_poses else out
        return outputs.transpose(0, 1)


def _tf_same_pad_1d(x, k, s, dilation=1):
    n = x.size(2)
    eff = (k - 1) * dilation + 1
    out_size = (n + s - 1) // s
    total = max(0, (out_size - 1) * s + eff - n)
    return F.pad(x, [total // 2, total - total // 2])


def _tf_same_pad_2d(x, k, s):
    pads = []
    for dim in (3, 2):  # W then H for F.pad ordering
        n = x.size(dim)
        out_size = (n + s - 1) // s
        total = max(0, (out_size - 1) * s + k - n)
        pads += [total // 2, total - total // 2]
    return F.pad(x, pads)


class _ConvTF1d(nn.Conv1d):
    """Conv1d with TF SAME padding (speech2gesture.py:58-103); params live
    directly on the module so Sequential key names match the reference."""

    def __init__(self, n_in, n_out, k, s, padding="SAME"):
        super().__init__(n_in, n_out, k, s)
        self.pad_mode = padding

    def forward(self, x):
        if self.pad_mode == "SAME":
            x = _tf_same_pad_1d(x, self.kernel_size[0], self.stride[0])
        return F.conv1d(x, self.weight, self.bias, self.stride)


class _ConvTF2d(nn.Conv2d):
    """Conv2d with TF SAME padding (speech2gesture.py:9-55)."""

    def __init__(self, n_in, n_out, k, s, padding="SAME"):
        super().__init__(n_in, n_out, k, s)
        self.pad_mode = padding

    def forward(self, x):
        if self.pad_mode == "SAME":
            x = _tf_same_pad_2d(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, self.weight, self.bias, self.stride)


def t_cnr(n_in, n_out, is_2d=False, downsample=False, k=None, s=None,
          padding="SAME"):
    """ConvNormRelu mirror (speech2gesture.py:106-128): Sequential key
    names .0 (conv) / .1 (bn)."""
    if k is None and s is None:
        k, s = (3, 1) if not downsample else (4, 2)
    conv = (_ConvTF2d if is_2d else _ConvTF1d)(n_in, n_out, k, s, padding)
    norm = (nn.BatchNorm2d if is_2d else nn.BatchNorm1d)(n_out)
    return nn.Sequential(conv, norm, nn.LeakyReLU(0.2, True))


class TorchUnetUp(nn.Module):
    """UnetUp (speech2gesture.py:131-141)."""

    def __init__(self):
        super().__init__()
        self.conv = t_cnr(256, 256)

    def forward(self, x1, x2):
        x1 = torch.repeat_interleave(x1, 2, dim=2)[:, :, :x2.shape[2]]
        return self.conv(x1 + x2)


class TorchS2GAudioEncoder(nn.Module):
    """Key names match reference speech2gesture.AudioEncoder
    (speech2gesture.py:144-197)."""

    def __init__(self, n_frames):
        super().__init__()
        self.n_frames = n_frames
        self.first_net = nn.Sequential(
            t_cnr(1, 64, True), t_cnr(64, 64, True, True),
            t_cnr(64, 128, True), t_cnr(128, 128, True, True),
            t_cnr(128, 256, True), t_cnr(256, 256, True, True),
            t_cnr(256, 256, True), t_cnr(256, 256, True, padding="VALID"))
        self.make_1d = nn.Upsample((n_frames, 1), mode="bilinear",
                                   align_corners=False)
        self.down1 = nn.Sequential(t_cnr(256, 256), t_cnr(256, 256))
        self.down2 = t_cnr(256, 256, downsample=True)
        self.down3 = t_cnr(256, 256, downsample=True)
        self.down4 = t_cnr(256, 256, downsample=True)
        self.down5 = t_cnr(256, 256, downsample=True)
        self.down6 = t_cnr(256, 256, downsample=True)
        self.up1 = TorchUnetUp()
        self.up2 = TorchUnetUp()
        self.up3 = TorchUnetUp()
        self.up4 = TorchUnetUp()
        self.up5 = TorchUnetUp()

    def forward(self, spec):
        out = self.first_net(spec.unsqueeze(1).float())
        x1 = self.make_1d(out).squeeze(3)
        x2 = self.down1(x1)
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        x5 = self.down4(x4)
        x6 = self.down5(x5)
        x7 = self.down6(x6)
        x = self.up1(x7, x6)
        x = self.up2(x, x5)
        x = self.up3(x, x4)
        x = self.up4(x, x3)
        x = self.up5(x, x2)
        return x


class TorchS2GGenerator(nn.Module):
    """Key names match reference speech2gesture.Generator
    (speech2gesture.py:200-231)."""

    def __init__(self, n_poses, pose_dim, n_pre_poses):
        super().__init__()
        self.gen_length = n_poses
        self.audio_encoder = TorchS2GAudioEncoder(n_poses)
        self.pre_pose_encoder = nn.Sequential(
            nn.Linear(n_pre_poses * pose_dim, 32), nn.BatchNorm1d(32),
            nn.ReLU(inplace=True), nn.Linear(32, 16))
        self.decoder = nn.Sequential(
            t_cnr(256 + 16, 256), t_cnr(256, 256), t_cnr(256, 256),
            t_cnr(256, 256))
        self.final_out = nn.Conv1d(256, pose_dim, 1, 1)

    def forward(self, in_spec, pre_poses):
        audio = self.audio_encoder(in_spec)
        pre = self.pre_pose_encoder(pre_poses.reshape(pre_poses.shape[0], -1))
        pre = pre.unsqueeze(2).repeat(1, 1, self.gen_length)
        out = self.decoder(torch.cat((audio, pre), dim=1))
        return self.final_out(out).transpose(1, 2)


class TorchS2GDiscriminator(nn.Module):
    """Key names match reference speech2gesture.Discriminator
    (speech2gesture.py:234-250)."""

    def __init__(self, pose_dim):
        super().__init__()
        self.net = nn.Sequential(
            _ConvTF1d(pose_dim, 64, 4, 2),
            nn.LeakyReLU(0.2, True),
            t_cnr(64, 128, downsample=True),
            t_cnr(128, 256, k=4, s=1),
            _ConvTF1d(256, 1, 4, 1))

    def forward(self, x):
        x = (x[:, 1:] - x[:, :-1]).transpose(1, 2)
        return self.net(x)


class TorchContextEncoder(nn.Module):
    """Key names match reference ContextEncoder (embedding_net.py:218-257)."""

    def __init__(self, n_words, embed=300, hidden=16, n_layers=2):
        super().__init__()
        self.text_encoder = TorchTextEncoderTCN(n_words, embed, hidden,
                                                n_layers)
        self.audio_encoder = TorchWavEncoder()
        self.gru = nn.GRU(32 + 32, 256, 2, bidirectional=False,
                          batch_first=True)
        self.out = nn.Sequential(nn.Linear(256, 128), nn.BatchNorm1d(128),
                                 nn.ReLU(inplace=True), nn.Linear(128, 32))
        self.fc_mu = nn.Linear(32, 32)
        self.fc_logvar = nn.Linear(32, 32)

    def forward(self, in_text, in_audio):
        text_feat = self.text_encoder(in_text)
        audio_feat = self.audio_encoder(in_audio)
        x = torch.cat((audio_feat, text_feat), dim=2)
        output, _ = self.gru(x)
        out = self.out(output[:, -1])
        mu = self.fc_mu(out)
        logvar = self.fc_logvar(out)
        return mu, mu, logvar  # z frozen at mu for parity tests


class TorchPoseDecoderGRU(nn.Module):
    """Key names match reference PoseDecoderGRU (embedding_net.py:130-162)."""

    def __init__(self, gen_length, pose_dim, hidden=300):
        super().__init__()
        self.gen_length = gen_length
        self.hidden_size = hidden
        self.pre_pose_net = nn.Sequential(
            nn.Linear(pose_dim * 4, 32), nn.BatchNorm1d(32), nn.ReLU(),
            nn.Linear(32, 32))
        self.gru = nn.GRU(64, hidden, 4, batch_first=True,
                          bidirectional=True, dropout=0.3)
        self.out = nn.Sequential(nn.Linear(hidden, hidden // 2),
                                 nn.LeakyReLU(1.0),  # LeakyReLU(True) quirk
                                 nn.Linear(hidden // 2, pose_dim))

    def forward(self, latent_code, pre_poses):
        pre = self.pre_pose_net(pre_poses.reshape(pre_poses.shape[0], -1))
        feat = torch.cat((pre, latent_code), dim=1)
        feat = feat.unsqueeze(1).repeat(1, self.gen_length, 1)
        output, _ = self.gru(feat)
        output = output[:, :, :self.hidden_size] + \
            output[:, :, self.hidden_size:]
        output = self.out(output.reshape(-1, output.shape[2]))
        return output.view(pre_poses.shape[0], self.gen_length, -1)


class TorchEmbeddingNetFull(nn.Module):
    """Key names match reference EmbeddingNet(mode='speech'/'both')
    (embedding_net.py:260-294): ContextEncoder + PoseEncoderConv +
    PoseDecoderGRU."""

    def __init__(self, pose_dim, n_frames, n_words, embed=300, hidden=16,
                 n_layers=2):
        super().__init__()
        self.context_encoder = TorchContextEncoder(n_words, embed, hidden,
                                                   n_layers)
        self.pose_encoder = TorchPoseEncoderConv(pose_dim)
        self.decoder = TorchPoseDecoderGRU(n_frames, pose_dim)

    def forward(self, in_text, in_audio, pre_poses, poses,
                input_mode="speech"):
        context_feat, context_mu, context_logvar = self.context_encoder(
            in_text, in_audio)
        poses_feat = self.pose_encoder(poses) if poses is not None else None
        latent = context_feat if input_mode == "speech" else poses_feat
        out_poses = self.decoder(latent, pre_poses)
        return (context_feat, context_mu, context_logvar, poses_feat,
                out_poses)

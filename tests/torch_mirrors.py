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

    def __init__(self, pose_dim, n_words, n_speakers, hidden=16, n_layers=2):
        super().__init__()
        self.hidden_size = hidden
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

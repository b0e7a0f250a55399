"""One-step training-dynamics parity against torch mirrors.

The strongest parity evidence obtainable in this image (released datasets are
absent): with identical imported weights and randomness frozen out, ONE full
training iteration of our jitted train steps must reproduce the reference
iteration math — every loss term in the returned metrics AND the gradients
that flow into every parameter.

Method:
* torch mirrors (tests/torch_mirrors.py) are wired into a torch
  re-implementation (below) of the reference iteration semantics
  (scripts/train_eval/train_hierarchy.py:71-293 for the hierarchy GAN,
  scripts/train_eval/train_gan.py:13-103 for multimodal context).
* randomness is frozen: dropout 0 on both sides, speaker-z logvar biased to
  -100 (z == mu), and the speaker permutation drawn by the jax step is
  replicated outside and handed to the torch side.
* both sides step with SGD(lr) instead of Adam, so post-step parameter
  deltas equal  -lr * grad  exactly — comparing the full converted
  parameter trees compares every gradient (Adam's sqrt normalization would
  amplify fp noise near zero-gradient into sign flips).  Equivalence of the
  optimizer itself (one combined optax.adam == the reference's five
  per-module torch Adams with the same lr/betas) is a per-parameter
  algebraic identity and is covered by test_adam_partition_identity.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

from ha2g_tpu import import_torch as it
from tests import torch_mirrors as tm

N_WORDS, N_SPK = 11, 5
HID, NL = 16, 2
B, T = 4, 34
POSE_DIM = 27
LR = 0.05
# Adam trajectory test: the flagship's actual lr (configs/hierarchy.yaml)
LR_ADAM = 5e-4


# ---------------------------------------------------------------------------
# torch-side reference iteration math
# ---------------------------------------------------------------------------

def torch_contrastive(a, b):
    """SoftmaxContrastiveLoss (train_hierarchy.py:54-68): CE over clamped
    inverse pairwise-L2 similarity with diagonal labels."""
    a = F.normalize(a, p=2, dim=1)
    b = F.normalize(b, p=2, dim=1)
    dist = torch.norm(a.unsqueeze(1) - b.unsqueeze(0), p=2, dim=2)
    logits = torch.clamp(1.0 / (dist + 1e-8), min=1e-8)
    labels = torch.arange(a.shape[0])
    return F.cross_entropy(logits, labels)


def torch_physical(out, mean_dir_vec, pairs, avg, var):
    """Gaussian inter-bone angle prior (train_hierarchy.py:242-262)."""
    raw = out + torch.as_tensor(mean_dir_vec, dtype=out.dtype)
    raw = F.normalize(raw.reshape(raw.shape[0], raw.shape[1], -1, 3), dim=-1)
    flat = raw.reshape(-1, raw.shape[2], 3)
    loss = 0.0
    for k, (i, j) in enumerate(pairs):
        inner = torch.einsum("nd,nd->n", flat[:, i], flat[:, j])
        inner = torch.clamp(inner, -1 + 1e-7, 1 - 1e-7)
        angle = torch.acos(inner) / np.pi
        loss = loss + torch.mean((angle - avg[k]) ** 2 / (2 * var[k]))
    return loss


def torch_pre_seq(tgt, n_pre=4):
    ps = tgt.new_zeros(tgt.shape[0], tgt.shape[1], tgt.shape[2] + 1)
    ps[:, :n_pre, :-1] = tgt[:, :n_pre]
    ps[:, :n_pre, -1] = 1
    return ps


def torch_cascade(gens, tgt, toks, blends, vids, n_pre=4):
    """3-level routing (train_hierarchy.py:100-117 / :153-170)."""
    t1 = torch.cat((tgt[:, :, :12], tgt[:, :, 18:21]), dim=2)
    t2 = torch.cat((tgt[:, :, :15], tgt[:, :, 18:24]), dim=2)
    p1 = torch_pre_seq(t1, n_pre)
    o1, *_ = gens[0](p1, toks, blends[0], vids)
    p2 = torch_pre_seq(t2, n_pre)
    p2[:, n_pre:, :12] = o1[:, n_pre:, :12]
    p2[:, n_pre:, 15:18] = o1[:, n_pre:, 12:15]
    o2, *_ = gens[1](p2, toks, blends[1], vids)
    p3 = torch_pre_seq(tgt, n_pre)
    p3[:, n_pre:, :15] = o2[:, n_pre:, :15]
    p3[:, n_pre:, 18:24] = o2[:, n_pre:, 15:21]
    o3, z, mu, logvar = gens[2](p3, toks, blends[2], vids)
    return (o1, o2, o3), (t1, t2, tgt), z, mu, logvar


def sh(a, b, beta):
    return F.smooth_l1_loss(a / beta, b / beta) * beta


def torch_train_iter_hierarchy(cfg, gan_on, batch, gens, dis, audio, text,
                               opts, rand_vids, pairs, avg, var,
                               cascade_fn=None, physical_fn=None):
    """Reference train_iter_hierarchy semantics
    (train_hierarchy.py:71-293 for 3 levels; train_hierarchy_expressive.py:
    124-482 for 6 via cascade_fn/physical_fn), with the rand-speaker
    permutation injected for cross-framework determinism."""
    cascade_fn = cascade_fn or torch_cascade
    physical_fn = physical_fn or torch_physical
    g_keys = [f"g{i + 1}" for i in range(len(gens))] + ["audio", "text"]
    toks, spec, tgt, vids = (batch["text"], batch["spec"], batch["target"],
                             batch["vids"])
    _, lo, _, hi, blends = audio(spec, vids)
    text_feat = text(toks)

    ret = {}
    # ---- D phase ----
    if gan_on and cfg["loss_gan_weight"] > 0.0:
        opts["dis"].zero_grad()
        outs_d, _, _, _, _ = cascade_fn(
            gens, tgt, toks, [b.detach() for b in blends], vids)
        d_real = dis(tgt)
        d_fake = dis(outs_d[-1].detach())
        dis_error = torch.sum(-torch.mean(
            torch.log(d_real + 1e-8) + torch.log(1 - d_fake + 1e-8)))
        dis_error.backward()
        opts["dis"].step()
        ret["dis"] = dis_error.item()

    # ---- G phase (vs updated D) ----
    for k in g_keys:
        opts[k].zero_grad()
    opts["dis"].zero_grad()   # D grads from the G loss are discarded

    c_pos = torch_contrastive(text_feat.reshape(-1, text_feat.shape[2]),
                              hi.reshape(-1, hi.shape[2]))
    c_neg = -torch_contrastive(text_feat.reshape(-1, text_feat.shape[2]),
                               lo.reshape(-1, lo.shape[2]))

    outs, targets, z, mu, logvar = cascade_fn(gens, tgt, toks, blends, vids)
    huber = sum(sh(o, t, 0.1) for o, t in zip(outs, targets))
    o_last = outs[-1]
    d_out = dis(o_last)
    gen_error = -torch.mean(torch.log(d_out + 1e-8))

    outs_r, _, z_rand, _, _ = cascade_fn(gens, tgt, toks, blends, rand_vids)
    pose_l1 = (F.smooth_l1_loss(o_last / 0.05, outs_r[-1].detach() / 0.05,
                                reduction="none") * 0.05)
    pose_l1 = pose_l1.sum(dim=1).sum(dim=1).view(pose_l1.shape[0], -1).mean(1)
    z_l1 = F.l1_loss(z.detach(), z_rand.detach(), reduction="none")
    z_l1 = z_l1.view(z_l1.shape[0], -1).mean(1)
    div_reg = torch.clamp(-(pose_l1 / (z_l1 + 1e-5)), min=-1000).mean()
    kld = -0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())

    loss = (cfg["loss_regression_weight"] * huber
            + cfg["loss_kld_weight"] * kld
            + cfg["loss_reg_weight"] * div_reg)
    if gan_on:
        loss = loss + cfg["loss_gan_weight"] * gen_error
    loss = loss + cfg["loss_contrastive_pos_weight"] * c_pos
    loss = loss + cfg["loss_contrastive_neg_weight"] * c_neg
    phy = physical_fn(o_last, cfg["mean_dir_vec"], pairs, avg, var)
    loss = loss + cfg["loss_physical_weight"] * phy

    loss.backward()
    for k in g_keys:
        opts[k].step()

    ret.update({
        "loss": cfg["loss_regression_weight"] * huber.item(),
        "KLD": cfg["loss_kld_weight"] * kld.item(),
        "DIV_REG": cfg["loss_reg_weight"] * div_reg.item(),
        "c_pos": cfg["loss_contrastive_pos_weight"] * c_pos.item(),
        "c_neg": cfg["loss_contrastive_neg_weight"] * c_neg.item(),
        "phy": cfg["loss_physical_weight"] * phy.item()})
    if gan_on:
        ret["gen"] = cfg["loss_gan_weight"] * gen_error.item()
    return ret


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def _freeze_z(gen):
    with torch.no_grad():
        gen.speaker_logvar.weight.zero_()
        gen.speaker_logvar.bias.fill_(-100.0)


def _no_dropout(dis):
    dis.gru.dropout = 0.0
    return dis


def _hier_setup(seed=11):
    torch.manual_seed(seed)
    from ha2g_tpu.config import Config
    from ha2g_tpu.models.hierarchy import ConvDiscriminator
    from ha2g_tpu.train.hierarchy import HierarchySystem

    rng = np.random.default_rng(seed)
    mean_vec = (rng.normal(size=POSE_DIM) * 0.1).astype(np.float32)
    cfg = Config(model="hierarchy", dataset="ted_gesture",
                 pose_dim=POSE_DIM, n_poses=T, hidden_size=HID, n_layers=NL,
                 z_type="speaker", dropout_prob=0.0, learning_rate=LR,
                 mean_dir_vec=list(map(float, mean_vec)),
                 loss_regression_weight=500.0, loss_kld_weight=0.6,
                 loss_reg_weight=0.05, loss_gan_weight=5.0,
                 loss_contrastive_pos_weight=0.2,
                 loss_contrastive_neg_weight=0.005,
                 loss_physical_weight=0.01)

    dims = (15, 21, 27)
    t_gens = []
    for d in dims:
        g = tm.TorchHierGenerator(d, N_WORDS, N_SPK, HID, NL).train()
        _freeze_z(g)
        t_gens.append(g)
    t_audio = tm.TorchResNetSE(N_SPK, pose_level=3).train()
    t_dis = _no_dropout(tm.TorchConvDiscriminator(POSE_DIM)).train()
    t_text = tm.TorchTextEncoderTCN(N_WORDS, 300, HID, NL).train()

    system = HierarchySystem(cfg, n_words=N_WORDS, n_speakers=N_SPK)
    system.dis = ConvDiscriminator(slope=0.01, dropout=0.0)
    # the reference's TCN embedding dropout is a fixed 0.1 independent of
    # dropout_prob (hierarchy_net.py:25); freeze it for determinism
    system.text = system.text.clone(emb_dropout=0.0)
    system.gens = tuple(g.clone(emb_dropout=0.0) for g in system.gens)
    system.g_tx = optax.sgd(LR)
    system.d_tx = optax.sgd(LR * cfg.discriminator_lr_weight)

    batch = {
        "text": jnp.asarray(rng.integers(0, N_WORDS, (B, T))),
        "spec": jnp.asarray(rng.normal(size=(B, 128, 70)).astype(np.float32)),
        "target": jnp.asarray(
            rng.normal(size=(B, T, POSE_DIM)).astype(np.float32) * 0.2),
        "vids": jnp.asarray(rng.integers(0, N_SPK, (B,))),
    }
    state = system.init(jax.random.PRNGKey(0), batch)
    ckpt = {"gen_dict_1": t_gens[0].state_dict(),
            "gen_dict_2": t_gens[1].state_dict(),
            "gen_dict_3": t_gens[2].state_dict(),
            "audio_dict": t_audio.state_dict(),
            "dis_dict": t_dis.state_dict(),
            "text_dict": t_text.state_dict()}
    state = it.import_hierarchy_checkpoint(ckpt, state, n_layers=NL)
    return cfg, system, state, batch, (t_gens, t_audio, t_dis, t_text), \
        mean_vec


def _convert_hier_params(t_gens, t_audio, t_dis, t_text):
    gens = tuple(it.convert_generator(g.state_dict(), NL) for g in t_gens)
    audio_p, _ = it.convert_audio_encoder(t_audio.state_dict())
    dis_p, _ = it.convert_discriminator(t_dis.state_dict())
    text_p = it.convert_text_encoder(t_text.state_dict(), NL)
    return {"audio": audio_p, "text": text_p, "gens": gens, "dis": dis_p}


def _assert_grad_tree_close(new, old, want_new, rel=0.05, cos_min=0.995,
                            path=""):
    """Compare parameter DELTAS (== -lr * grad under SGD) per leaf by
    relative L2 error and cosine similarity.  Elementwise comparison is
    wrong for this: the backward through the 34-layer SE-ResNet / the
    36k-sample wav convs accumulates fp32 reduction noise that is a few
    percent on near-cancelling elements, while a *missing or wrong gradient
    path* changes a leaf's delta direction and norm wholesale — which norm
    + cosine catches."""
    if isinstance(want_new, dict):
        assert set(new.keys()) == set(want_new.keys()), path
        for k in want_new:
            _assert_grad_tree_close(new[k], old[k], want_new[k], rel,
                                    cos_min, f"{path}/{k}")
    elif isinstance(want_new, (tuple, list)):
        for i, (n, o, w) in enumerate(zip(new, old, want_new)):
            _assert_grad_tree_close(n, o, w, rel, cos_min, f"{path}[{i}]")
    else:
        da = (np.asarray(new, np.float64) -
              np.asarray(old, np.float64)).ravel()
        db = (np.asarray(want_new, np.float64) -
              np.asarray(old, np.float64)).ravel()
        nb = np.linalg.norm(db)
        na = np.linalg.norm(da)
        diff = np.linalg.norm(da - db)
        # absolute floor: leaves whose true gradient is ~0 (e.g. a conv
        # bias immediately followed by BatchNorm, whose mean-subtraction
        # cancels it) sit at delta ~ lr * 1e-5; relative error there is
        # pure noise ratio
        if diff <= 2e-5:
            return
        assert nb > 1e-9, f"{path}: torch delta 0 but ours {na}"
        err = diff / nb
        cos = float(np.dot(da, db) / (na * nb + 1e-30))
        assert err <= rel, f"{path}: rel delta err {err:.4f} (> {rel})"
        assert cos >= cos_min, f"{path}: delta cosine {cos:.6f}"


# ---------------------------------------------------------------------------
# hierarchy tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gan_on", [True, False])
def test_hierarchy_one_step_parity(gan_on):
    cfg, system, state, batch, torch_mods, mean_vec = _hier_setup()
    t_gens, t_audio, t_dis, t_text = torch_mods

    step = system.make_train_step(gan_on=gan_on)
    rng = jax.random.PRNGKey(42)
    new_state, metrics = step(state, batch, rng)

    # replicate the speaker permutation the jitted step drew
    k_perm = jax.random.split(rng, 5)[3]
    rand_vids = np.asarray(jax.random.permutation(k_perm, batch["vids"]))

    opts = {"g1": torch.optim.SGD(t_gens[0].parameters(), lr=LR),
            "g2": torch.optim.SGD(t_gens[1].parameters(), lr=LR),
            "g3": torch.optim.SGD(t_gens[2].parameters(), lr=LR),
            "audio": torch.optim.SGD(t_audio.parameters(), lr=LR),
            "text": torch.optim.SGD(t_text.parameters(), lr=LR),
            "dis": torch.optim.SGD(
                t_dis.parameters(), lr=LR * cfg.discriminator_lr_weight)}
    tb = {k: torch.from_numpy(np.asarray(v)) for k, v in batch.items()}
    spec = system.spec
    ret = torch_train_iter_hierarchy(
        {"loss_regression_weight": cfg.loss_regression_weight,
         "loss_kld_weight": cfg.loss_kld_weight,
         "loss_reg_weight": cfg.loss_reg_weight,
         "loss_gan_weight": cfg.loss_gan_weight,
         "loss_contrastive_pos_weight": cfg.loss_contrastive_pos_weight,
         "loss_contrastive_neg_weight": cfg.loss_contrastive_neg_weight,
         "loss_physical_weight": cfg.loss_physical_weight,
         "mean_dir_vec": mean_vec},
        gan_on, tb, t_gens, t_dis, t_audio, t_text, opts,
        torch.from_numpy(rand_vids),
        spec.angle_prior.pairs, spec.angle_prior.avg, spec.angle_prior.var)

    # every reference ret_dict term matches our metrics
    assert set(ret.keys()) == set(metrics.keys()), \
        (sorted(ret.keys()), sorted(metrics.keys()))
    # fp32 drift budget: the existing forward-parity tests already allow
    # ~5e-4 on the level-3 cascade output (test_import_torch.py:193); loss
    # terms sit on top of that, so 2e-3 relative is the fp32 noise floor,
    # not slack in the math.
    for k, want in ret.items():
        np.testing.assert_allclose(float(metrics[k]), want, rtol=2e-3,
                                   atol=1e-4, err_msg=k)

    # post-SGD parameter deltas match => every gradient matches
    want_params = _convert_hier_params(t_gens, t_audio, t_dis, t_text)
    _assert_grad_tree_close(new_state.params, jax.device_get(state.params),
                            want_params)


# ---------------------------------------------------------------------------
# sliding-window synthesis parity (generate_gestures_hierarchy)
# ---------------------------------------------------------------------------

def torch_generate_hierarchy(gens, audio_mod, full_spec, words, lang, vid,
                             clip_seconds, n_pre=4):
    """Reference generate_gestures_hierarchy window loop
    (synthesize_hierarchy.py:36-166): window layout (:53-58), frame-aligned
    word indices (:100-113), carry of the last n_pre predicted frames into
    every level's target (:117-122), the train-identical cascade fills
    (:129-146), and the linear overlap cross-fade (:151-159).

    Two reference input-slicing details are intentionally NOT reproduced
    (they are input-preparation bugs, not learned model layout — see the
    repo synthesizer, synthesis.py:156-165):
    * :84 computes the window's spectrogram start from
      `spectrogram.shape[0]` — the mel-bin count (always 128), not the
      frame count; this mirror uses the true frame count like our engine;
    * :86 leaves the final window's spectrogram slice SHORT instead of
      padding; this mirror edge-pads like our engine.
    """
    import math as _math
    from ha2g_tpu.data.dataset import spectrogram_length_for

    T_ = 34
    unit_time = T_ / 15
    stride_time = (T_ - n_pre) / 15
    if clip_seconds < unit_time:
        num = 1
    else:
        num = _math.ceil((clip_seconds - unit_time) / stride_time) + 1
    spec_len = spectrogram_length_for(T_, 15)
    S_total = full_spec.shape[1]

    out_list = []
    prev_out = None
    vid_t = torch.LongTensor([vid])
    for i in range(num):
        start_time = i * stride_time
        end_time = start_time + unit_time

        s0 = _math.floor(start_time / clip_seconds * S_total)
        s1 = s0 + spec_len
        spec = full_spec
        if s1 > S_total:
            spec = np.pad(full_spec, ((0, 0), (0, s1 - S_total)),
                          mode="edge")
        in_spec = torch.from_numpy(spec[:, s0:s1]).float().unsqueeze(0)

        # frame-aligned word indices (:102-113)
        ext = np.zeros(T_)
        frame_duration = (end_time - start_time) / T_
        for w in words:
            if w[1] < start_time or w[1] > end_time:
                continue
            idx = max(0, int(np.floor((w[1] - start_time) / frame_duration)))
            if idx < T_:
                ext[idx] = lang.get_word_index(w[0])
        toks = torch.LongTensor(ext).unsqueeze(0)

        # carry into every level's target (:117-122 == level slices of the
        # full-resolution carry)
        tgt = torch.zeros((1, T_, 27))
        if prev_out is not None:
            tgt[:, :n_pre] = prev_out[:, -n_pre:]

        _, _, _, _, blends = audio_mod(in_spec, vid_t)
        (o1, o2, o3), _, _, _, _ = torch_cascade(gens, tgt, toks, blends,
                                                 vid_t, n_pre)
        prev_out = o3.detach()
        out_seq = o3[0].detach().numpy().copy()

        if out_list:    # linear cross-fade (:151-159)
            last = out_list[-1][-n_pre:]
            out_list[-1] = out_list[-1][:-n_pre]
            for j in range(n_pre):
                out_seq[j] = (last[j] * (n_pre - j) / (n_pre + 1)
                              + out_seq[j] * (j + 1) / (n_pre + 1))
        out_list.append(out_seq)
    return np.vstack(out_list)


def test_hierarchy_synthesis_window_loop_parity():
    """Multi-window synthesis through HierarchySynthesizer.generate matches
    the reference window-loop math run on the torch mirrors with imported
    identical weights: 3 windows, pre-seq carry across windows, per-window
    cascade, overlap cross-fade."""
    from ha2g_tpu.data.vocab import Vocab
    from ha2g_tpu.ops.mel import batched_log_mel
    from ha2g_tpu.synthesis import HierarchySynthesizer

    cfg, system, state, _batch_unused, torch_mods, _ = _hier_setup()
    t_gens, t_audio, t_dis, t_text = torch_mods
    for mod in (*t_gens, t_audio):
        mod.eval()

    lang = Vocab("words")
    while lang.n_words < N_WORDS:
        lang.index_word(f"w{lang.n_words}")

    rng = np.random.default_rng(5)
    seconds = 4.8
    audio = rng.normal(size=(1, int(seconds * 16000))).astype(np.float32) * .1
    words = [(f"w{rng.integers(4, N_WORDS)}", float(t), float(t + 0.2))
             for t in np.arange(0.25, seconds - 0.3, 0.5)]
    vid = 2

    synth = HierarchySynthesizer(system, state)
    ours = synth.generate(audio, [words], lang, np.array([vid], np.int32),
                          rng=jax.random.PRNGKey(0))

    full_spec = np.asarray(batched_log_mel(jnp.asarray(audio)))[0]
    want = torch_generate_hierarchy(t_gens, t_audio, full_spec, words, lang,
                                    vid, seconds)

    assert ours.shape == (1, want.shape[0], 27)
    np.testing.assert_allclose(ours[0], want, rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# expressive (6-level) hierarchy: torch-side reference math
# ---------------------------------------------------------------------------

E_POSE_DIM = 126
E_DIMS = (24, 30, 36, 66, 96, 126)


def torch_cascade_expressive(gens, tgt, toks, blends, vids, n_pre=4):
    """Literal 6-level reference semantics: targets
    (train_hierarchy_expressive.py:140-145) and pre-seq fills (:252-310) —
    the fills applied to the real (dim+1)-wide buffers, which reproduces
    the reference's off-by-one head-block layout (the `-5*3:` slices land
    one column late; see SkeletonSpec.ref_routing_compat)."""
    from tests.test_skeleton import EXPRESSIVE_REF_FILLS
    cat = lambda *p: torch.cat(p, dim=2)
    t = tgt
    targets = [
        cat(t[:, :, :9], t[:, :, -15:]),
        cat(t[:, :, :12], t[:, :, 60:63], t[:, :, -15:]),
        cat(t[:, :, :15], t[:, :, 60:66], t[:, :, -15:]),
        cat(t[:, :, :18], t[:, :, 24:27], t[:, :, 33:36], t[:, :, 42:45],
            t[:, :, 51:54], t[:, :, 60:69], t[:, :, 75:78], t[:, :, 84:87],
            t[:, :, 93:96], t[:, :, 102:105], t[:, :, -15:]),
        cat(t[:, :, :21], t[:, :, 24:30], t[:, :, 33:39], t[:, :, 42:48],
            t[:, :, 51:57], t[:, :, 60:72], t[:, :, 75:81], t[:, :, 84:90],
            t[:, :, 93:99], t[:, :, 102:108], t[:, :, -15:]),
        t,
    ]
    outs, prev = [], None
    z = mu = logvar = None
    for k in range(6):
        ps = torch_pre_seq(targets[k], n_pre)
        if k > 0:
            for dst_sl, src_sl in EXPRESSIVE_REF_FILLS[k - 1]:
                ps[:, n_pre:, dst_sl] = prev[:, n_pre:, src_sl]
        out, z, mu, logvar = gens[k](ps, toks, blends[k], vids)
        outs.append(out)
        prev = out
    return outs, targets, z, mu, logvar


def torch_physical_expressive(out, mean_dir_vec, pairs, avg, var):
    """Angle prior with the palm cross-product extension
    (train_hierarchy_expressive.py:426-447): left palm = raw bones 11 x 17,
    right palm = 28 x 34, appended BEFORE the joint normalize."""
    raw = out + torch.as_tensor(mean_dir_vec, dtype=out.dtype)
    left = torch.cross(raw[:, :, 33:36], raw[:, :, 51:54], dim=2)
    right = torch.cross(raw[:, :, 84:87], raw[:, :, 102:105], dim=2)
    raw = torch.cat((raw, left, right), dim=2)
    raw = F.normalize(raw.reshape(raw.shape[0], raw.shape[1], -1, 3), dim=-1)
    flat = raw.reshape(-1, raw.shape[2], 3)
    loss = 0.0
    for k, (i, j) in enumerate(pairs):
        inner = torch.einsum("nd,nd->n", flat[:, i], flat[:, j])
        inner = torch.clamp(inner, -1 + 1e-7, 1 - 1e-7)
        angle = torch.acos(inner) / np.pi
        loss = loss + torch.mean((angle - avg[k]) ** 2 / (2 * var[k]))
    return loss


def _hier_setup_expressive(seed=13, B=3):
    torch.manual_seed(seed)
    from ha2g_tpu.config import Config
    from ha2g_tpu.models.hierarchy import ConvDiscriminator
    from ha2g_tpu.train.hierarchy import HierarchySystem

    rng = np.random.default_rng(seed)
    mean_vec = (rng.normal(size=E_POSE_DIM) * 0.05).astype(np.float32)
    cfg = Config(model="hierarchy", dataset="ted_expressive",
                 pose_dim=E_POSE_DIM, n_poses=T, hidden_size=HID,
                 n_layers=NL, z_type="speaker", dropout_prob=0.0,
                 learning_rate=LR, ref_routing_compat=True,
                 mean_dir_vec=list(map(float, mean_vec)),
                 loss_regression_weight=300.0, loss_kld_weight=0.6,
                 loss_reg_weight=0.05, loss_gan_weight=5.0,
                 loss_contrastive_pos_weight=0.2,
                 loss_contrastive_neg_weight=0.005,
                 loss_physical_weight=0.01)
    assert cfg.skeleton.ref_routing_compat  # compat variant engaged

    t_gens = []
    for d in E_DIMS:
        g = tm.TorchHierGenerator(d, N_WORDS, N_SPK, HID, NL).train()
        _freeze_z(g)
        t_gens.append(g)
    t_audio = tm.TorchResNetSE(N_SPK, pose_level=6).train()
    t_dis = _no_dropout(tm.TorchConvDiscriminator(E_POSE_DIM)).train()
    t_text = tm.TorchTextEncoderTCN(N_WORDS, 300, HID, NL).train()

    system = HierarchySystem(cfg, n_words=N_WORDS, n_speakers=N_SPK)
    system.dis = ConvDiscriminator(slope=0.01, dropout=0.0)
    system.text = system.text.clone(emb_dropout=0.0)
    system.gens = tuple(g.clone(emb_dropout=0.0) for g in system.gens)
    system.g_tx = optax.sgd(LR)
    system.d_tx = optax.sgd(LR * cfg.discriminator_lr_weight)

    batch = {
        "text": jnp.asarray(rng.integers(0, N_WORDS, (B, T))),
        "spec": jnp.asarray(rng.normal(size=(B, 128, 70)).astype(np.float32)),
        "target": jnp.asarray(
            rng.normal(size=(B, T, E_POSE_DIM)).astype(np.float32) * 0.2),
        "vids": jnp.asarray(rng.integers(0, N_SPK, (B,))),
    }
    state = system.init(jax.random.PRNGKey(0), batch)
    ckpt = {f"gen_dict_{l + 1}": t_gens[l].state_dict() for l in range(6)}
    ckpt.update({"audio_dict": t_audio.state_dict(),
                 "dis_dict": t_dis.state_dict(),
                 "text_dict": t_text.state_dict()})
    state = it.import_hierarchy_checkpoint(ckpt, state, n_layers=NL)
    return cfg, system, state, batch, (t_gens, t_audio, t_dis, t_text), \
        mean_vec


def test_hierarchy_expressive_one_step_parity():
    """One full train_iter_hierarchy_expressive iteration
    (train_hierarchy_expressive.py:124-482): all 6 huber levels, the
    off-by-one compat routing, the palm-cross-product physical prior, and
    every gradient — vs the torch mirror with imported identical weights."""
    cfg, system, state, batch, torch_mods, mean_vec = _hier_setup_expressive()
    t_gens, t_audio, t_dis, t_text = torch_mods

    step = system.make_train_step(gan_on=True)
    rng = jax.random.PRNGKey(42)
    new_state, metrics = step(state, batch, rng)

    k_perm = jax.random.split(rng, 5)[3]
    rand_vids = np.asarray(jax.random.permutation(k_perm, batch["vids"]))

    opts = {f"g{l + 1}": torch.optim.SGD(t_gens[l].parameters(), lr=LR)
            for l in range(6)}
    opts["audio"] = torch.optim.SGD(t_audio.parameters(), lr=LR)
    opts["text"] = torch.optim.SGD(t_text.parameters(), lr=LR)
    opts["dis"] = torch.optim.SGD(
        t_dis.parameters(), lr=LR * cfg.discriminator_lr_weight)
    tb = {k: torch.from_numpy(np.asarray(v)) for k, v in batch.items()}
    spec = system.spec
    ret = torch_train_iter_hierarchy(
        {"loss_regression_weight": cfg.loss_regression_weight,
         "loss_kld_weight": cfg.loss_kld_weight,
         "loss_reg_weight": cfg.loss_reg_weight,
         "loss_gan_weight": cfg.loss_gan_weight,
         "loss_contrastive_pos_weight": cfg.loss_contrastive_pos_weight,
         "loss_contrastive_neg_weight": cfg.loss_contrastive_neg_weight,
         "loss_physical_weight": cfg.loss_physical_weight,
         "mean_dir_vec": mean_vec},
        True, tb, t_gens, t_dis, t_audio, t_text, opts,
        torch.from_numpy(rand_vids),
        spec.angle_prior.pairs, spec.angle_prior.avg, spec.angle_prior.var,
        cascade_fn=torch_cascade_expressive,
        physical_fn=torch_physical_expressive)

    assert set(ret.keys()) == set(metrics.keys()), \
        (sorted(ret.keys()), sorted(metrics.keys()))
    # the 6-level cascade is twice as deep as the gesture one, so the fp32
    # drift budget doubles relative to the 2e-3 floor established there
    for k, want in ret.items():
        np.testing.assert_allclose(float(metrics[k]), want, rtol=4e-3,
                                   atol=2e-4, err_msg=k)

    want_params = {
        "gens": tuple(it.convert_generator(g.state_dict(), NL)
                      for g in t_gens),
        "audio": it.convert_audio_encoder(t_audio.state_dict())[0],
        "dis": it.convert_discriminator(t_dis.state_dict())[0],
        "text": it.convert_text_encoder(t_text.state_dict(), NL),
    }
    _assert_grad_tree_close(new_state.params, jax.device_get(state.params),
                            want_params)


def torch_generate_hierarchy_expressive(gens, audio_mod, full_spec, words,
                                        lang, vid, clip_seconds, n_pre=4):
    """Reference synthesize_expressive_hierarchy.py window loop (:36-260):
    same layout/word-index/cross-fade math as the gesture variant
    (torch_generate_hierarchy above, incl. the two documented input-slicing
    corrections), with the 6-level cascade applied through the literal fill
    blocks (:132-187) — i.e. INCLUDING the off-by-one head fill on the
    (dim+1)-wide buffers.  Carry seeding (:120-124) uses positive slices of
    the 126-wide output, so the carry itself is quirk-free."""
    import math as _math
    from ha2g_tpu.data.dataset import spectrogram_length_for

    T_ = 34
    unit_time = T_ / 15
    stride_time = (T_ - n_pre) / 15
    num = 1 if clip_seconds < unit_time else \
        _math.ceil((clip_seconds - unit_time) / stride_time) + 1
    spec_len = spectrogram_length_for(T_, 15)
    S_total = full_spec.shape[1]

    out_list = []
    prev_out = None
    vid_t = torch.LongTensor([vid])
    for i in range(num):
        start_time = i * stride_time
        end_time = start_time + unit_time
        s0 = _math.floor(start_time / clip_seconds * S_total)
        s1 = s0 + spec_len
        spec = full_spec if s1 <= S_total else np.pad(
            full_spec, ((0, 0), (0, s1 - S_total)), mode="edge")
        in_spec = torch.from_numpy(spec[:, s0:s1]).float().unsqueeze(0)

        ext = np.zeros(T_)
        frame_duration = (end_time - start_time) / T_
        for w in words:
            if w[1] < start_time or w[1] > end_time:
                continue
            idx = max(0, int(np.floor((w[1] - start_time) / frame_duration)))
            if idx < T_:
                ext[idx] = lang.get_word_index(w[0])
        toks = torch.LongTensor(ext).unsqueeze(0)

        tgt = torch.zeros((1, T_, E_POSE_DIM))
        if prev_out is not None:
            tgt[:, :n_pre] = prev_out[:, -n_pre:]

        _, _, _, _, blends = audio_mod(in_spec, vid_t)
        outs, _, _, _, _ = torch_cascade_expressive(gens, tgt, toks, blends,
                                                    vid_t, n_pre)
        prev_out = outs[-1].detach()
        out_seq = outs[-1][0].detach().numpy().copy()

        if out_list:
            last = out_list[-1][-n_pre:]
            out_list[-1] = out_list[-1][:-n_pre]
            for j in range(n_pre):
                out_seq[j] = (last[j] * (n_pre - j) / (n_pre + 1)
                              + out_seq[j] * (j + 1) / (n_pre + 1))
        out_list.append(out_seq)
    return np.vstack(out_list)


def test_hierarchy_expressive_synthesis_parity_compat():
    """An imported reference-layout expressive model synthesizes identically
    through our engine: HierarchySynthesizer.generate on the
    ref_routing_compat spec vs the literal 6-level reference window loop
    (off-by-one head fills and all), 3 windows with carry + cross-fade."""
    from ha2g_tpu.data.vocab import Vocab
    from ha2g_tpu.ops.mel import batched_log_mel
    from ha2g_tpu.synthesis import HierarchySynthesizer

    cfg, system, state, _b, torch_mods, _ = _hier_setup_expressive(B=1)
    t_gens, t_audio, _t_dis, _t_text = torch_mods
    for mod in (*t_gens, t_audio):
        mod.eval()

    lang = Vocab("words")
    while lang.n_words < N_WORDS:
        lang.index_word(f"w{lang.n_words}")

    rng = np.random.default_rng(6)
    seconds = 4.8
    audio = rng.normal(size=(1, int(seconds * 16000))).astype(np.float32) * .1
    words = [(f"w{rng.integers(4, N_WORDS)}", float(t), float(t + 0.2))
             for t in np.arange(0.25, seconds - 0.3, 0.5)]
    vid = 1

    synth = HierarchySynthesizer(system, state)
    assert synth.spec.ref_routing_compat
    ours = synth.generate(audio, [words], lang, np.array([vid], np.int32),
                          rng=jax.random.PRNGKey(0))

    full_spec = np.asarray(batched_log_mel(jnp.asarray(audio)))[0]
    want = torch_generate_hierarchy_expressive(
        t_gens, t_audio, full_spec, words, lang, vid, seconds)

    assert ours.shape == (1, want.shape[0], E_POSE_DIM)
    np.testing.assert_allclose(ours[0], want, rtol=2e-3, atol=2e-4)


def test_adam_partition_identity():
    """One optax.adam over the combined G-side tree takes the same step as
    independent per-module adams with identical lr/betas (the reference's
    five-optimizer layout, train.py:155-163): Adam state is per-parameter,
    so the partition is immaterial."""
    rng = np.random.default_rng(0)
    tree = {"a": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(7,)).astype(np.float32))}
    grads = {"a": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
             "b": jnp.asarray(rng.normal(size=(7,)).astype(np.float32))}
    tx = optax.adam(1e-3, b1=0.5, b2=0.999)
    st = tx.init(tree)
    up, _ = tx.update(grads, st, tree)
    combined = optax.apply_updates(tree, up)

    for key in ("a", "b"):
        sub = {key: tree[key]}
        g = {key: grads[key]}
        st_i = tx.init(sub)
        up_i, _ = tx.update(g, st_i, sub)
        got = optax.apply_updates(sub, up_i)
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(combined[key]), rtol=1e-6)


def test_hierarchy_multistep_adam_trajectory_parity():
    """THREE full iterations under the reference's real optimizer layout —
    per-module torch.optim.Adam(lr, betas=(0.5, 0.999)) with the
    discriminator at lr * discriminator_lr_weight (train.py:155-170) vs our
    combined optax.adam pair — must produce the same loss trajectory.

    This closes the gap the one-step SGD tests leave open: steps 2 and 3
    are computed THROUGH the parameters Adam produced at steps 1 and 2, so
    any error in the optimizer wiring (betas, eps, bias correction, the
    G/D partition, the D lr scaling) compounds into the later metrics.
    Parameter trees are not compared leaf-wise here: Adam's per-element
    sqrt(v) normalization maps the fp32 noise on true-zero gradients
    (BN-shadowed biases) to O(lr) updates of arbitrary sign, which is real
    behavior on both sides but makes elementwise comparison meaningless —
    the metric trajectory is the invariant that must (and does) match.
    Tolerances widen per step with compounding fp32 drift."""
    cfg, system, state, batch, torch_mods, mean_vec = _hier_setup()
    t_gens, t_audio, t_dis, t_text = torch_mods

    # the reference optimizer (train.py:155-170), replacing _hier_setup's
    # SGD; opt states re-initialized to match
    system.g_tx = optax.adam(LR_ADAM, b1=0.5, b2=0.999)
    system.d_tx = optax.adam(LR_ADAM * cfg.discriminator_lr_weight,
                             b1=0.5, b2=0.999)
    g_params = {k: state.params[k] for k in ("audio", "text", "gens")}
    state = state.replace(g_opt=system.g_tx.init(g_params),
                          d_opt=system.d_tx.init(state.params["dis"]))

    adam = lambda ps, lr: torch.optim.Adam(ps, lr=lr, betas=(0.5, 0.999))
    opts = {"g1": adam(t_gens[0].parameters(), LR_ADAM),
            "g2": adam(t_gens[1].parameters(), LR_ADAM),
            "g3": adam(t_gens[2].parameters(), LR_ADAM),
            "audio": adam(t_audio.parameters(), LR_ADAM),
            "text": adam(t_text.parameters(), LR_ADAM),
            "dis": adam(t_dis.parameters(),
                        LR_ADAM * cfg.discriminator_lr_weight)}
    tcfg = {"loss_regression_weight": cfg.loss_regression_weight,
            "loss_kld_weight": cfg.loss_kld_weight,
            "loss_reg_weight": cfg.loss_reg_weight,
            "loss_gan_weight": cfg.loss_gan_weight,
            "loss_contrastive_pos_weight": cfg.loss_contrastive_pos_weight,
            "loss_contrastive_neg_weight": cfg.loss_contrastive_neg_weight,
            "loss_physical_weight": cfg.loss_physical_weight,
            "mean_dir_vec": mean_vec}
    tb = {k: torch.from_numpy(np.asarray(v)) for k, v in batch.items()}
    spec = system.spec

    step = system.make_train_step(gan_on=True)
    rtols = (2e-3, 8e-3, 2e-2)
    for i, rtol in enumerate(rtols):
        rng = jax.random.PRNGKey(42 + i)
        state, metrics = step(state, batch, rng)
        k_perm = jax.random.split(rng, 5)[3]
        rand_vids = np.asarray(
            jax.random.permutation(k_perm, batch["vids"]))
        ret = torch_train_iter_hierarchy(
            tcfg, True, tb, t_gens, t_dis, t_audio, t_text, opts,
            torch.from_numpy(rand_vids), spec.angle_prior.pairs,
            spec.angle_prior.avg, spec.angle_prior.var)
        assert set(ret.keys()) == set(metrics.keys()), i
        for k, want in ret.items():
            np.testing.assert_allclose(
                float(metrics[k]), want, rtol=rtol, atol=1e-4,
                err_msg=f"step {i}: {k}")


# ---------------------------------------------------------------------------
# remaining families: seq2seq / speech2gesture / joint-embed / motion-AE
# ---------------------------------------------------------------------------

def test_seq2seq_one_step_parity():
    """train_iter_seq2seq (train_seq2seq.py:6-51): custom loss (weighted
    MSE + continuity + motion-variance bonus), grad-clip 5, one step."""
    torch.manual_seed(21)
    from ha2g_tpu.config import Config
    from ha2g_tpu.train.baselines import Seq2SeqSystem

    cfg = Config(model="seq2seq", pose_dim=POSE_DIM, n_poses=T,
                 hidden_size=HID, n_layers=NL, dropout_prob=0.0,
                 loss_regression_weight=500.0, loss_kld_weight=0.1,
                 loss_reg_weight=0.01)
    tnet = tm.TorchSeq2SeqNet(POSE_DIM, T, N_WORDS, 300, HID, NL,
                              n_pre_poses=4, n_speakers=0).train()
    rng = np.random.default_rng(21)
    tokens = rng.integers(1, N_WORDS, (B, 12))
    lengths = np.array([12, 10, 9, 7])
    for b, ln in enumerate(lengths):
        tokens[b, ln:] = 0
    batch = {"word_seq": jnp.asarray(tokens),
             "word_lengths": jnp.asarray(lengths),
             "target": jnp.asarray(
                 rng.normal(size=(B, T, POSE_DIM)).astype(np.float32) * .2),
             "vids": jnp.zeros((B,), jnp.int32)}

    system = Seq2SeqSystem(cfg, n_words=N_WORDS)
    system.tx = optax.chain(optax.clip_by_global_norm(5.0), optax.sgd(LR))
    state = system.init(jax.random.PRNGKey(0), batch)
    params, stats = it.convert_seq2seq(tnet.state_dict(), NL)
    state = state.replace(params=params, batch_stats=stats)
    new_state, metrics = system.make_train_step()(
        state, batch, jax.random.PRNGKey(5))

    # torch side: the reference iteration
    opt = torch.optim.SGD(tnet.parameters(), lr=LR)
    opt.zero_grad()
    tt = torch.from_numpy(np.asarray(batch["target"]))
    outputs = tnet(torch.from_numpy(tokens), torch.from_numpy(lengths),
                   tt, None)
    n_el = outputs.numel()
    mse = F.mse_loss(outputs, tt) * cfg.loss_regression_weight
    diff = [torch.abs(outputs[:, n] - outputs[:, n - 1])
            for n in range(1, outputs.shape[1])]
    cont = torch.sum(torch.stack(diff)) / n_el * cfg.loss_kld_weight
    var = -torch.sum(torch.norm(outputs, 2, 1)) / n_el * cfg.loss_reg_weight
    loss = mse + cont + var
    loss.backward()
    torch.nn.utils.clip_grad_norm_(tnet.parameters(), 5)
    opt.step()

    np.testing.assert_allclose(float(metrics["loss"]), loss.item(),
                               rtol=2e-3, atol=1e-4)
    want_params, _ = it.convert_seq2seq(tnet.state_dict(), NL)
    _assert_grad_tree_close(new_state.params, jax.device_get(state.params),
                            want_params)


def test_speech2gesture_one_step_parity():
    """train_iter_speech2gesture (train_speech2gesture.py:5-37): LS-GAN on
    (double-differenced — the reference's own quirk) motion, L1 pose loss,
    D then G, one step each."""
    torch.manual_seed(22)
    from ha2g_tpu.config import Config
    from ha2g_tpu.train.baselines import S2GSystem

    cfg = Config(model="speech2gesture", pose_dim=POSE_DIM, n_poses=T,
                 loss_regression_weight=500.0, loss_gan_weight=5.0,
                 learning_rate=LR)
    tg = tm.TorchS2GGenerator(T, POSE_DIM, 4).train()
    td = tm.TorchS2GDiscriminator(POSE_DIM).train()
    rng = np.random.default_rng(22)
    batch = {"spec": jnp.asarray(
                 rng.normal(size=(B, 128, 70)).astype(np.float32)),
             "target": jnp.asarray(
                 rng.normal(size=(B, T, POSE_DIM)).astype(np.float32) * .2),
             "vids": jnp.zeros((B,), jnp.int32)}

    system = S2GSystem(cfg)
    system.g_tx = optax.sgd(LR)
    system.d_tx = optax.sgd(LR * cfg.discriminator_lr_weight)
    state = system.init(jax.random.PRNGKey(0), batch)
    gp, gs = it.convert_s2g_generator(tg.state_dict())
    dp, ds = it.convert_s2g_discriminator(td.state_dict())
    state = state.replace(params={"gen": gp, "dis": dp},
                          batch_stats={"gen": gs, "dis": ds})
    new_state, metrics = system.make_train_step()(
        state, batch, jax.random.PRNGKey(6))

    g_opt = torch.optim.SGD(tg.parameters(), lr=LR)
    d_opt = torch.optim.SGD(td.parameters(),
                            lr=LR * cfg.discriminator_lr_weight)
    tt = torch.from_numpy(np.asarray(batch["target"]))
    spec = torch.from_numpy(np.asarray(batch["spec"]))
    pre = tt[:, :4]
    out = tg(spec, pre)
    target_motion = tt[:, 1:] - tt[:, :-1]
    out_motion = out[:, 1:] - out[:, :-1]
    d_opt.zero_grad()
    d_real = td(target_motion)
    d_fake = td(out_motion.detach())
    dis_error = F.mse_loss(torch.ones_like(d_real), d_real) + \
        F.mse_loss(torch.zeros_like(d_fake), d_fake)
    dis_error.backward()
    d_opt.step()
    g_opt.zero_grad()
    l1 = F.l1_loss(out, tt)
    d_out = td(out_motion)
    gen_error = F.mse_loss(torch.ones_like(d_out), d_out)
    (cfg.loss_regression_weight * l1 +
     cfg.loss_gan_weight * gen_error).backward()
    g_opt.step()

    np.testing.assert_allclose(float(metrics["dis"]), dis_error.item(),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(float(metrics["loss"]),
                               cfg.loss_regression_weight * l1.item(),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(float(metrics["gen"]),
                               cfg.loss_gan_weight * gen_error.item(),
                               rtol=2e-3, atol=1e-4)
    wg, _ = it.convert_s2g_generator(tg.state_dict())
    wd, _ = it.convert_s2g_discriminator(td.state_dict())
    _assert_grad_tree_close(new_state.params, jax.device_get(state.params),
                            {"gen": wg, "dis": wd})


def test_gesture_autoencoder_one_step_parity():
    """train_iter_embed (train_joint_embed.py:5-52, mode='pose',
    variational off): per-sample-mean-then-SUM L1 recon loss."""
    torch.manual_seed(23)
    from ha2g_tpu.config import Config
    from ha2g_tpu.train.baselines import EmbedSystem

    cfg = Config(model="gesture_autoencoder", pose_dim=POSE_DIM, n_poses=T,
                 learning_rate=LR)
    tnet = tm.TorchEmbeddingNetPose(POSE_DIM).train()
    rng = np.random.default_rng(23)
    batch = {"target": jnp.asarray(
                 rng.normal(size=(B, T, POSE_DIM)).astype(np.float32) * .2),
             "vids": jnp.zeros((B,), jnp.int32)}

    system = EmbedSystem(cfg)
    system.tx = optax.sgd(LR)
    state = system.init(jax.random.PRNGKey(0), batch)
    p, s = it.convert_embedding_net_pose(tnet.state_dict())
    state = state.replace(params=p, batch_stats=s)
    new_state, metrics = system.make_train_step()(
        state, batch, jax.random.PRNGKey(7))

    opt = torch.optim.SGD(tnet.parameters(), lr=LR)
    opt.zero_grad()
    tt = torch.from_numpy(np.asarray(batch["target"]))
    recon, _ = tnet(tt)
    recon_loss = torch.sum(torch.mean(
        F.l1_loss(recon, tt, reduction="none"), dim=(1, 2)))
    recon_loss.backward()
    opt.step()

    np.testing.assert_allclose(float(metrics["loss"]), recon_loss.item(),
                               rtol=2e-3, atol=1e-4)
    want, _ = it.convert_embedding_net_pose(tnet.state_dict())
    _assert_grad_tree_close(new_state.params, jax.device_get(state.params),
                            want)


def test_h36m_extractor_one_step_parity():
    """train_feature_extractor.py:54-97 (the H36M FGD-embedder trainer):
    same as train_iter_embed PLUS the pose-diff L1 term its `if True`
    branch enables (vs train_iter_embed's `if False`) — gated here by
    Config.embed_pose_diff_loss, auto-set on the H36M data path."""
    torch.manual_seed(25)
    from ha2g_tpu.config import Config
    from ha2g_tpu.train.baselines import EmbedSystem

    cfg = Config(model="gesture_autoencoder", pose_dim=POSE_DIM, n_poses=T,
                 learning_rate=LR, embed_pose_diff_loss=True)
    tnet = tm.TorchEmbeddingNetPose(POSE_DIM).train()
    rng = np.random.default_rng(25)
    batch = {"target": jnp.asarray(
                 rng.normal(size=(B, T, POSE_DIM)).astype(np.float32) * .2),
             "vids": jnp.zeros((B,), jnp.int32)}

    system = EmbedSystem(cfg)
    system.tx = optax.sgd(LR)
    state = system.init(jax.random.PRNGKey(0), batch)
    p, s = it.convert_embedding_net_pose(tnet.state_dict())
    state = state.replace(params=p, batch_stats=s)
    new_state, metrics = system.make_train_step()(
        state, batch, jax.random.PRNGKey(9))

    opt = torch.optim.SGD(tnet.parameters(), lr=LR)
    opt.zero_grad()
    tt = torch.from_numpy(np.asarray(batch["target"]))
    recon, _ = tnet(tt)
    rl = torch.mean(F.l1_loss(recon, tt, reduction="none"), dim=(1, 2))
    rl = rl + torch.mean(F.l1_loss(recon[:, 1:] - recon[:, :-1],
                                   tt[:, 1:] - tt[:, :-1],
                                   reduction="none"), dim=(1, 2))
    rl = torch.sum(rl)
    rl.backward()
    opt.step()

    np.testing.assert_allclose(float(metrics["loss"]), rl.item(),
                               rtol=2e-3, atol=1e-4)
    want, _ = it.convert_embedding_net_pose(tnet.state_dict())
    _assert_grad_tree_close(new_state.params, jax.device_get(state.params),
                            want)


def test_motion_ae_one_step_parity():
    """train_feature_extractor_expressive.py:120-148: L1 + pose-diff L1
    (per-sample mean then sum) + cos_loss_weight * SUM(1 - cos)."""
    torch.manual_seed(24)
    from ha2g_tpu.config import Config
    from ha2g_tpu.train.baselines import MotionAESystem

    cfg = Config(model="gesture_autoencoder", dataset="ted_expressive",
                 pose_dim=126, n_poses=T, latent_dim=128,
                 cos_loss_weight=0.001, learning_rate=LR)
    tnet = tm.TorchMotionAE(126, 128).train()
    rng = np.random.default_rng(24)
    batch = {"target": jnp.asarray(
                 rng.normal(size=(B, T, 126)).astype(np.float32) * .2),
             "vids": jnp.zeros((B,), jnp.int32)}

    system = MotionAESystem(cfg)
    system.tx = optax.inject_hyperparams(optax.sgd)(learning_rate=LR)
    state = system.init(jax.random.PRNGKey(0), batch)
    p, s = it.convert_motion_ae(tnet.state_dict())
    state = state.replace(params=p, batch_stats=s)
    new_state, metrics = system.make_train_step()(
        state, batch, jax.random.PRNGKey(8), LR)

    opt = torch.optim.SGD(tnet.parameters(), lr=LR)
    opt.zero_grad()
    tt = torch.from_numpy(np.asarray(batch["target"]))
    pred, _ = tnet(tt)
    rl = torch.mean(F.l1_loss(pred, tt, reduction="none"), dim=(1, 2))
    rl = rl + torch.mean(F.l1_loss(pred[:, 1:] - pred[:, :-1],
                                   tt[:, 1:] - tt[:, :-1],
                                   reduction="none"), dim=(1, 2))
    rl = torch.sum(rl)
    cos = torch.sum(1 - torch.cosine_similarity(
        pred.view(pred.shape[0], pred.shape[1], -1, 3),
        tt.view(tt.shape[0], tt.shape[1], -1, 3), dim=-1))
    loss = cfg.cos_loss_weight * cos + rl
    loss.backward()
    opt.step()

    np.testing.assert_allclose(float(metrics["loss"]), loss.item(),
                               rtol=2e-3, atol=1e-4)
    want, _ = it.convert_motion_ae(tnet.state_dict())
    _assert_grad_tree_close(new_state.params, jax.device_get(state.params),
                            want)


# ---------------------------------------------------------------------------
# multimodal-context (train_iter_gan) tests
# ---------------------------------------------------------------------------

def torch_train_iter_gan(cfg, gan_on, batch, gen, dis, g_opt, d_opt,
                         rand_vids):
    """Reference train_iter_gan semantics (train_gan.py:13-103)."""
    toks, wav, tgt, vids = (batch["text"], batch["audio"], batch["target"],
                            batch["vids"])
    pre_seq = torch_pre_seq(tgt)
    ret = {}
    if gan_on and cfg["loss_gan_weight"] > 0.0:
        d_opt.zero_grad()
        out, *_ = gen(pre_seq, toks, wav, vids)
        d_real = dis(tgt)
        d_fake = dis(out.detach())
        dis_error = torch.sum(-torch.mean(
            torch.log(d_real + 1e-8) + torch.log(1 - d_fake + 1e-8)))
        dis_error.backward()
        d_opt.step()
        ret["dis"] = dis_error.item()

    g_opt.zero_grad()
    d_opt.zero_grad()
    out, z, mu, logvar = gen(pre_seq, toks, wav, vids)
    huber = sh(out, tgt, 0.1)
    d_out = dis(out)
    gen_error = -torch.mean(torch.log(d_out + 1e-8))

    out_r, z_r, _, _ = gen(pre_seq, toks, wav, rand_vids)
    pose_l1 = (F.smooth_l1_loss(out / 0.05, out_r.detach() / 0.05,
                                reduction="none") * 0.05)
    pose_l1 = pose_l1.sum(dim=1).sum(dim=1).view(pose_l1.shape[0], -1).mean(1)
    z_l1 = F.l1_loss(z.detach(), z_r.detach(), reduction="none")
    z_l1 = z_l1.view(z_l1.shape[0], -1).mean(1)
    div_reg = torch.clamp(-(pose_l1 / (z_l1 + 1e-5)), min=-1000).mean()
    kld = -0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())

    loss = (cfg["loss_regression_weight"] * huber
            + cfg["loss_kld_weight"] * kld + cfg["loss_reg_weight"] * div_reg)
    if gan_on:
        loss = loss + cfg["loss_gan_weight"] * gen_error
    loss.backward()
    g_opt.step()

    ret.update({"loss": cfg["loss_regression_weight"] * huber.item(),
                "KLD": cfg["loss_kld_weight"] * kld.item(),
                "DIV_REG": cfg["loss_reg_weight"] * div_reg.item()})
    if gan_on:
        ret["gen"] = cfg["loss_gan_weight"] * gen_error.item()
    return ret


@pytest.mark.parametrize("gan_on", [True, False])
def test_multimodal_gan_one_step_parity(gan_on):
    torch.manual_seed(21)
    from ha2g_tpu.config import Config
    from ha2g_tpu.models.hierarchy import ConvDiscriminator
    from ha2g_tpu.train.baselines import MultimodalGanSystem

    cfg = Config(model="multimodal_context", dataset="ted_gesture",
                 pose_dim=POSE_DIM, n_poses=T, hidden_size=HID, n_layers=NL,
                 z_type="speaker", dropout_prob=0.0, learning_rate=LR,
                 loss_regression_weight=500.0, loss_kld_weight=0.6,
                 loss_reg_weight=0.05, loss_gan_weight=5.0)

    t_gen = tm.TorchMultimodalGenerator(POSE_DIM, N_WORDS, N_SPK, HID,
                                        NL).train()
    _freeze_z(t_gen)
    t_dis = _no_dropout(tm.TorchConvDiscriminator(POSE_DIM)).train()
    # multimodal variant: the LeakyReLU(True) quirk == identity
    t_dis.pre_conv[2] = torch.nn.LeakyReLU(1.0)
    t_dis.pre_conv[5] = torch.nn.LeakyReLU(1.0)

    system = MultimodalGanSystem(cfg, n_words=N_WORDS, n_speakers=N_SPK)
    system.dis = ConvDiscriminator(slope=1.0, dropout=0.0)
    system.gen = system.gen.clone(emb_dropout=0.0)
    system.g_tx = optax.sgd(LR)
    system.d_tx = optax.sgd(LR * cfg.discriminator_lr_weight)

    rng_np = np.random.default_rng(21)
    n_samples = int(round(T / 15 * 16000))
    batch = {
        "text": jnp.asarray(rng_np.integers(0, N_WORDS, (B, T))),
        "audio": jnp.asarray(
            rng_np.normal(size=(B, n_samples)).astype(np.float32) * 0.1),
        "target": jnp.asarray(
            rng_np.normal(size=(B, T, POSE_DIM)).astype(np.float32) * 0.2),
        "vids": jnp.asarray(rng_np.integers(0, N_SPK, (B,))),
    }
    state = system.init(jax.random.PRNGKey(0), batch)
    gen_p, gen_s = it.convert_multimodal_generator(t_gen.state_dict(), NL)
    dis_p, dis_s = it.convert_discriminator(t_dis.state_dict())
    state = state.replace(
        params={"gen": gen_p, "dis": dis_p},
        batch_stats={"gen": gen_s, "dis": dis_s})

    step = system.make_train_step(gan_on=gan_on)
    rng = jax.random.PRNGKey(7)
    new_state, metrics = step(state, batch, rng)

    k_perm = jax.random.split(rng, 4)[3]
    rand_vids = np.asarray(jax.random.permutation(k_perm, batch["vids"]))

    g_opt = torch.optim.SGD(t_gen.parameters(), lr=LR)
    d_opt = torch.optim.SGD(t_dis.parameters(),
                            lr=LR * cfg.discriminator_lr_weight)
    tb = {k: torch.from_numpy(np.asarray(v)) for k, v in batch.items()}
    ret = torch_train_iter_gan(
        {"loss_regression_weight": cfg.loss_regression_weight,
         "loss_kld_weight": cfg.loss_kld_weight,
         "loss_reg_weight": cfg.loss_reg_weight,
         "loss_gan_weight": cfg.loss_gan_weight},
        gan_on, tb, t_gen, t_dis, g_opt, d_opt, torch.from_numpy(rand_vids))

    assert set(ret.keys()) == set(metrics.keys()), \
        (sorted(ret.keys()), sorted(metrics.keys()))
    for k, want in ret.items():
        np.testing.assert_allclose(float(metrics[k]), want, rtol=2e-3,
                                   atol=1e-4, err_msg=k)

    want_gen, _ = it.convert_multimodal_generator(t_gen.state_dict(), NL)
    want_dis, _ = it.convert_discriminator(t_dis.state_dict())
    old = jax.device_get(state.params)
    _assert_grad_tree_close(new_state.params["gen"], old["gen"], want_gen)
    _assert_grad_tree_close(new_state.params["dis"], old["dis"], want_dis)


# ---------------------------------------------------------------------------
# trajectory parity across the GAN warm-up boundary (VERDICT r3 item 1)
# ---------------------------------------------------------------------------

def _stream_batch(seed):
    """One batch of the shared synthetic stream (same shapes/scales as
    _hier_setup's batch, fresh content per step)."""
    rng = np.random.default_rng(seed)
    return {
        "text": jnp.asarray(rng.integers(0, N_WORDS, (B, T))),
        "spec": jnp.asarray(rng.normal(size=(B, 128, 70)).astype(np.float32)),
        "target": jnp.asarray(
            rng.normal(size=(B, T, POSE_DIM)).astype(np.float32) * 0.2),
        "vids": jnp.asarray(rng.integers(0, N_SPK, (B,))),
    }


def test_hierarchy_warmup_trajectory_parity():
    """TWENTY consecutive flagship iterations spanning the reference's GAN
    warm-up boundary, on a shared synthetic batch STREAM (fresh batch every
    step), under the reference's real optimizer layout — per-module
    torch.optim.Adam(lr, betas=(0.5, 0.999)), D at lr *
    discriminator_lr_weight (train.py:155-170).

    Steps 0-9 run the warm-up variant (D phase off, no G-side GAN term —
    the `epoch > loss_warmup` gate at train_hierarchy.py:93 /
    train_gan.py:26-45 resolved False); steps 10-19 run the full
    adversarial iteration.  The flip exercises exactly what one-step tests
    cannot: the D optimizer's Adam moments start mid-trajectory, the D
    BatchNorm stats start from 10 G-phase-only updates, and every later
    metric is computed THROUGH the parameters produced by the other
    framework's preceding 10+ updates.

    fp32 drift budget (stated per VERDICT r3 item 1): per-key relative
    metric error at step i must stay within min(base * (i+1), cap), with
    three budget classes set at ~2-4x the drift measured on this seed:
    * core terms (loss, KLD, c_pos, c_neg, dis, gen): base 2e-3, cap
      2.5e-2 — measured drift stays <= 5.6e-3 through step 19;
    * phy (the FK angle prior): base 8e-3, cap 1.2e-1 — acos near its
      clamp edges amplifies parameter drift (measured <= 4.1e-2);
    * DIV_REG: base 6e-2, cap 5e-1 — a ratio of near-cancelling L1
      differences, the designated drift amplifier (measured <= 2.4e-1 at
      step 18; its ABSOLUTE scale stays ~3.7 so a wholesale break — wrong
      sign, missing clamp, wrong denominator — still trips the cap).

    Plus the eval metric along the trajectory: FGD and mean feature
    distance computed by BOTH frameworks through ONE shared frozen
    EmbeddingNet embedder at 3 eval points (after steps 5, 10, 20) on a
    held-out eval stream must agree."""
    cfg, system, state, _b0, torch_mods, mean_vec = _hier_setup()
    t_gens, t_audio, t_dis, t_text = torch_mods
    N_STEPS, WARMUP = 20, 10

    system.g_tx = optax.adam(LR_ADAM, b1=0.5, b2=0.999)
    system.d_tx = optax.adam(LR_ADAM * cfg.discriminator_lr_weight,
                             b1=0.5, b2=0.999)
    g_params = {k: state.params[k] for k in ("audio", "text", "gens")}
    state = state.replace(g_opt=system.g_tx.init(g_params),
                          d_opt=system.d_tx.init(state.params["dis"]))

    adam = lambda ps, lr: torch.optim.Adam(ps, lr=lr, betas=(0.5, 0.999))
    opts = {"g1": adam(t_gens[0].parameters(), LR_ADAM),
            "g2": adam(t_gens[1].parameters(), LR_ADAM),
            "g3": adam(t_gens[2].parameters(), LR_ADAM),
            "audio": adam(t_audio.parameters(), LR_ADAM),
            "text": adam(t_text.parameters(), LR_ADAM),
            "dis": adam(t_dis.parameters(),
                        LR_ADAM * cfg.discriminator_lr_weight)}
    tcfg = {"loss_regression_weight": cfg.loss_regression_weight,
            "loss_kld_weight": cfg.loss_kld_weight,
            "loss_reg_weight": cfg.loss_reg_weight,
            "loss_gan_weight": cfg.loss_gan_weight,
            "loss_contrastive_pos_weight": cfg.loss_contrastive_pos_weight,
            "loss_contrastive_neg_weight": cfg.loss_contrastive_neg_weight,
            "loss_physical_weight": cfg.loss_physical_weight,
            "mean_dir_vec": mean_vec}
    spec = system.spec

    steps = {False: system.make_train_step(gan_on=False),
             True: system.make_train_step(gan_on=True)}
    eval_step = system.make_eval_step()

    # ONE shared frozen embedder (random init, frozen — what it measures is
    # that both frameworks' generated populations embed identically)
    from ha2g_tpu.eval.fgd import EmbeddingSpaceEvaluator
    from ha2g_tpu.models.embedding_net import EmbeddingNet
    emb = EmbeddingNet(pose_dim=POSE_DIM, n_frames=T, mode="pose")
    ev_vars = emb.init(
        {"params": jax.random.PRNGKey(77), "noise": jax.random.PRNGKey(78)},
        None, None, None, np.zeros((2, T, POSE_DIM), np.float32))
    evaluator = EmbeddingSpaceEvaluator(POSE_DIM, T, ev_vars["params"],
                                        ev_vars["batch_stats"])
    eval_batches = [_stream_batch(900 + j) for j in range(6)]

    def fgd_jax(st):
        evaluator.reset()
        for j, b in enumerate(eval_batches):
            out, _ = eval_step(st, b, jax.random.PRNGKey(500 + j))
            evaluator.push_samples(np.asarray(out), np.asarray(b["target"]))
        return evaluator.get_scores()

    def fgd_torch():
        mods = (t_audio, t_text, t_dis, *t_gens)
        for m in mods:
            m.eval()
        evaluator.reset()
        with torch.no_grad():
            for b in eval_batches:
                tb = {k: torch.from_numpy(np.asarray(v))
                      for k, v in b.items()}
                _, _, _, _, blends = t_audio(tb["spec"], tb["vids"])
                (_, _, o3), _, _, _, _ = torch_cascade(
                    t_gens, tb["target"], tb["text"], blends, tb["vids"])
                evaluator.push_samples(o3.numpy(), np.asarray(b["target"]))
        for m in mods:
            m.train()
        return evaluator.get_scores()

    BUDGET = {"phy": (8e-3, 1.2e-1), "DIV_REG": (6e-2, 5e-1)}
    CORE = (2e-3, 2.5e-2)
    EVAL_AT = {5, 10, 20}
    worst = 0.0
    for i in range(N_STEPS):
        gan_on = i >= WARMUP
        batch = _stream_batch(100 + i)
        rng = jax.random.PRNGKey(42 + i)
        state, metrics = steps[gan_on](state, batch, rng)

        k_perm = jax.random.split(rng, 5)[3]
        rand_vids = np.asarray(jax.random.permutation(k_perm, batch["vids"]))
        tb = {k: torch.from_numpy(np.asarray(v)) for k, v in batch.items()}
        ret = torch_train_iter_hierarchy(
            tcfg, gan_on, tb, t_gens, t_dis, t_audio, t_text, opts,
            torch.from_numpy(rand_vids), spec.angle_prior.pairs,
            spec.angle_prior.avg, spec.angle_prior.var)

        assert set(ret.keys()) == set(metrics.keys()), \
            (i, sorted(ret.keys()), sorted(metrics.keys()))
        for k, want in ret.items():
            got = float(metrics[k])
            err = abs(got - want) / max(abs(want), 1e-4)
            base, cap = BUDGET.get(k, CORE)
            budget = min(base * (i + 1), cap)
            if k not in BUDGET:
                worst = max(worst, err)
            assert err <= budget, \
                f"step {i} ({'gan' if gan_on else 'warmup'}): {k} " \
                f"rel err {err:.2e} > budget {budget:.2e} " \
                f"(got {got}, want {want})"

        if (i + 1) in EVAL_AT:
            fd_j, feat_j = fgd_jax(state)
            fd_t, feat_t = fgd_torch()
            # both scores run through the SAME evaluator code + embedder;
            # the only variable is each framework's generated poses.  The
            # 1e-3 absolute floors cover the random-embedder regime where
            # the populations nearly coincide and both scores sit at ~1e-2
            # (5% of which is below accumulated fp32 drift).
            assert abs(fd_j - fd_t) <= max(0.05 * abs(fd_t), 1e-3), \
                (i + 1, fd_j, fd_t)
            assert abs(feat_j - feat_t) <= max(0.05 * abs(feat_t), 1e-3), \
                (i + 1, feat_j, feat_t)

    print(f"[trajectory] worst per-step CORE metric rel err over {N_STEPS} "
          f"steps: {worst:.3e}")

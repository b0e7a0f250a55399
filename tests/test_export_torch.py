"""Checkpoint EXPORT validation (ha2g_tpu/export_torch.py).

Two directions of proof:
* exact round trip — export_hierarchy_checkpoint -> import_torch converters
  must reproduce the native state bit-for-bit (transposes are lossless);
* strict=True state-dict loads into the clean-room torch mirrors (whose key
  names match the reference modules) + forward parity, proving the exported
  key set and layouts are exactly what reference code expects.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ha2g_tpu import export_torch as et
from ha2g_tpu import import_torch as it
from tests import torch_mirrors as tm

N_WORDS, N_SPK = 11, 5
HID, NL = 16, 2
B, T = 2, 34


def _tiny_state(dataset="ted_gesture", pose_dim=27, seed=0):
    from ha2g_tpu.config import Config
    from ha2g_tpu.train.hierarchy import HierarchySystem

    cfg = Config(model="hierarchy", dataset=dataset, pose_dim=pose_dim,
                 n_poses=T, hidden_size=HID, n_layers=NL, z_type="speaker")
    system = HierarchySystem(cfg, n_words=N_WORDS, n_speakers=N_SPK)
    rng = np.random.default_rng(seed)
    batch = {
        "text": jnp.asarray(rng.integers(0, N_WORDS, (B, T))),
        "spec": jnp.asarray(rng.normal(size=(B, 128, 70)).astype(np.float32)),
        "target": jnp.asarray(
            rng.normal(size=(B, T, pose_dim)).astype(np.float32) * 0.1),
        "vids": jnp.asarray(rng.integers(0, N_SPK, (B,))),
    }
    state = system.init(jax.random.PRNGKey(seed), batch)
    # non-trivial BN running stats so the stats mapping is actually tested
    leaf_rng = np.random.default_rng(seed + 1)
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            np.abs(leaf_rng.normal(size=np.shape(x))) + 0.5, jnp.float32),
        jax.device_get(state.batch_stats))
    return cfg, system, state.replace(batch_stats=stats)


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a.keys()) == set(b.keys()), path
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, (tuple, list)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _tree_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=path)


@pytest.mark.parametrize("dataset,pose_dim",
                         [("ted_gesture", 27), ("ted_expressive", 126)])
def test_export_import_exact_roundtrip(dataset, pose_dim):
    """export -> import reproduces the native state bit-for-bit, on both
    skeletons (3 and 6 generator levels)."""
    cfg, system, state = _tiny_state(dataset, pose_dim)
    ckpt = et.export_hierarchy_checkpoint(state, cfg, epoch=7)
    assert ckpt["pose_dim"] == pose_dim and ckpt["epoch"] == 7
    assert f"gen_dict_{cfg.skeleton.n_levels}" in ckpt

    state2 = it.import_hierarchy_checkpoint(ckpt, state, n_layers=NL)
    _tree_equal(jax.device_get(state.params),
                jax.device_get(state2.params))
    _tree_equal(jax.device_get(state.batch_stats),
                jax.device_get(state2.batch_stats))

    # the embedded args round trip through the reference-args config path
    cfg2 = it.config_from_reference_args(ckpt["args"])
    assert (cfg2.model, cfg2.dataset, cfg2.pose_dim, cfg2.hidden_size) == \
        (cfg.model, cfg.dataset, cfg.pose_dim, cfg.hidden_size)


def test_strict_load_and_forward_parity():
    """Exported state dicts load into the reference-layout torch mirrors
    with strict=True (key/shape-exactness) and produce the same forwards
    as the native modules they came from."""
    cfg, system, state = _tiny_state()
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    rng = np.random.default_rng(3)

    # ---- generator (speaker z pinned to mu on the NATIVE side before
    # export, so both sides are deterministic) ----
    g0 = params["gens"][0]
    g0["SpeakerZ_0"]["Dense_2"]["Dense_0"]["kernel"] = \
        np.zeros_like(g0["SpeakerZ_0"]["Dense_2"]["Dense_0"]["kernel"])
    g0["SpeakerZ_0"]["Dense_2"]["Dense_0"]["bias"] = np.full_like(
        g0["SpeakerZ_0"]["Dense_2"]["Dense_0"]["bias"], -100.0)
    dim0 = system.spec.level_dim(0)
    tg = tm.TorchHierGenerator(dim0, N_WORDS, N_SPK, HID, NL).eval()
    tg.load_state_dict(et.export_generator(g0, NL), strict=True)

    pre = rng.normal(size=(B, T, dim0 + 1)).astype(np.float32) * 0.3
    tokens = rng.integers(0, N_WORDS, (B, T))
    audio = rng.normal(size=(B, T, 32)).astype(np.float32) * 0.3
    vids = rng.integers(0, N_SPK, (B,))
    with torch.no_grad():
        want, _, want_mu, _ = tg(torch.from_numpy(pre),
                                 torch.from_numpy(tokens),
                                 torch.from_numpy(audio),
                                 torch.from_numpy(vids))
    out, z, mu, logvar = system.gens[0].apply(
        {"params": g0}, jnp.asarray(pre), jnp.asarray(tokens),
        jnp.asarray(audio), jnp.asarray(vids), train=False,
        rngs={"noise": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(mu), want_mu.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), want.numpy(), atol=1e-4)

    # ---- audio encoder ----
    ta = tm.TorchResNetSE(N_SPK, pose_level=3).eval()
    ta.load_state_dict(
        et.export_audio_encoder(params["audio"], stats["audio"]),
        strict=True)
    spec = rng.normal(size=(B, 128, 70)).astype(np.float32)
    with torch.no_grad():
        w_t, lo_t, mid_t, hi_t, blends_t = ta(torch.from_numpy(spec),
                                              torch.from_numpy(vids))
    w, lo, mid, hi, blend = system.audio.apply(
        {"params": params["audio"], "batch_stats": stats["audio"]},
        jnp.asarray(spec), jnp.asarray(vids), train=False)
    np.testing.assert_allclose(np.asarray(hi), hi_t.numpy(), atol=2e-4)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(blend[i]),
                                   blends_t[i].numpy(), atol=2e-4)

    # ---- discriminator ----
    td = tm.TorchConvDiscriminator(cfg.pose_dim).eval()
    td.load_state_dict(
        et.export_discriminator(params["dis"], stats["dis"]), strict=True)
    poses = rng.normal(size=(B, T, cfg.pose_dim)).astype(np.float32) * 0.3
    with torch.no_grad():
        want_d = td(torch.from_numpy(poses)).numpy()
    got_d = system.dis.apply(
        {"params": params["dis"], "batch_stats": stats["dis"]},
        jnp.asarray(poses), train=False)
    np.testing.assert_allclose(np.asarray(got_d), want_d, atol=1e-5)

    # ---- standalone text encoder ----
    tt = tm.TorchTextEncoderTCN(N_WORDS, 300, HID, NL).eval()
    tt.load_state_dict(et.export_text_encoder(params["text"], NL),
                       strict=True)
    with torch.no_grad():
        want_t = tt(torch.from_numpy(tokens)).numpy()
    got_t = system.text.apply({"params": params["text"]},
                              jnp.asarray(tokens), deterministic=True)
    np.testing.assert_allclose(np.asarray(got_t), want_t, atol=1e-4)


@pytest.mark.parametrize("pose_dim", [27, 126])
def test_evalnet_export_roundtrip_and_strict_load(pose_dim):
    """FGD eval-net export: exact round trip through the importers AND a
    strict load + forward parity against the torch mirrors, for both the
    EmbeddingNet (27) and MotionAE (126) embedders."""
    from ha2g_tpu.config import Config
    from ha2g_tpu.train.loop import build_system

    dataset = "ted_expressive" if pose_dim == 126 else "ted_gesture"
    cfg = Config(model="gesture_autoencoder", dataset=dataset,
                 pose_dim=pose_dim, n_poses=T)
    system = build_system(cfg, 4, 1)
    rng = np.random.default_rng(5)
    batch = {"target": jnp.asarray(
        rng.normal(size=(B, T, pose_dim)).astype(np.float32) * 0.1)}
    state = system.init(jax.random.PRNGKey(0), batch)
    leaf_rng = np.random.default_rng(6)
    state = state.replace(batch_stats=jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            np.abs(leaf_rng.normal(size=np.shape(x))) + 0.5, jnp.float32),
        jax.device_get(state.batch_stats)))

    ckpt = et.export_evalnet_checkpoint(state, cfg, epoch=4)
    assert ckpt["pose_dim"] == pose_dim
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)

    if pose_dim == 126:
        p2, s2 = it.convert_motion_ae(ckpt["motion_ae"])
        tnet = tm.TorchMotionAE(pose_dim, latent=ckpt["latent_dim"])
        tnet.load_state_dict(ckpt["motion_ae"], strict=True)
    else:
        p2, s2 = it.convert_embedding_net_pose(ckpt["gen_dict"])
        tnet = tm.TorchEmbeddingNetPose(pose_dim)
        tnet.load_state_dict(ckpt["gen_dict"], strict=True)
    _tree_equal(params, p2)
    _tree_equal(stats, s2)


def _sd_equal(exported: dict, want: dict, skip_suffix=("num_batches_tracked",)):
    """Exported state dict == the original torch module's, tensor-exact.
    export(import(x)) == x proves key names, shapes, and every layout
    transform (transposes, GRU stacking, weight-norm v/g, conv flips)
    invert losslessly."""
    want = {k: v for k, v in want.items()
            if not k.endswith(skip_suffix)}
    got = {k: v for k, v in exported.items()
           if not k.endswith(skip_suffix)}
    assert set(got.keys()) == set(want.keys()), (
        sorted(set(want) - set(got)), sorted(set(got) - set(want)))
    for k, v in want.items():
        np.testing.assert_array_equal(got[k].numpy(), v.detach().numpy(),
                                      err_msg=k)


def test_export_inverts_import_all_generic_families():
    """For every generic family: torch mirror -> import converters ->
    export converters reproduces the mirror's own state dict exactly."""
    torch.manual_seed(20)

    # multimodal_context generator + its GRU discriminator-free dis
    tg = tm.TorchMultimodalGenerator(27, N_WORDS, N_SPK, HID, NL)
    p, s = it.convert_multimodal_generator(tg.state_dict(), NL)
    _sd_equal(et.export_multimodal_generator(p, s, NL), tg.state_dict())

    td = tm.TorchConvDiscriminator(27)
    p, s = it.convert_discriminator(td.state_dict())
    _sd_equal(et.export_discriminator(p, s), td.state_dict())

    # seq2seq
    ts = tm.TorchSeq2SeqNet(27, T, N_WORDS, 300, HID, NL, n_pre_poses=4,
                            n_speakers=N_SPK)
    p, s = it.convert_seq2seq(ts.state_dict(), NL)
    _sd_equal(et.export_seq2seq(p, s, NL), ts.state_dict())

    # speech2gesture
    tsg = tm.TorchS2GGenerator(T, 27, 4)
    p, s = it.convert_s2g_generator(tsg.state_dict())
    _sd_equal(et.export_s2g_generator(p, s), tsg.state_dict())
    tsd = tm.TorchS2GDiscriminator(27)
    p, s = it.convert_s2g_discriminator(tsd.state_dict())
    _sd_equal(et.export_s2g_discriminator(p, s), tsd.state_dict())

    # joint_embedding
    tj = tm.TorchEmbeddingNetFull(27, T, N_WORDS, 300, hidden=300,
                                  n_layers=4)
    p, s = it.convert_embedding_net_full(tj.state_dict())
    _sd_equal(et.export_embedding_net_full(p, s), tj.state_dict())


def test_torch_save_load_without_repo_classes(tmp_path):
    """The saved .bin unpickles with only torch + numpy (args and vocabs
    are SimpleNamespace duck-types, not our classes)."""
    from ha2g_tpu.data.vocab import Vocab

    cfg, system, state = _tiny_state()
    lang = Vocab("words")
    for i in range(N_WORDS - lang.n_words):
        lang.index_word(f"w{i}")
    speaker = Vocab("vids", insert_default_tokens=False)
    speaker.index_word("s0")
    path = tmp_path / "exported.bin"
    et.save_reference_checkpoint(str(path), state, cfg, lang, speaker,
                                 epoch=12)
    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    assert type(ckpt["args"]).__module__ == "types"
    assert ckpt["lang_model"].n_words == N_WORDS
    assert ckpt["lang_model"].word2index["w0"] == 4  # after PAD/SOS/EOS/UNK
    assert ckpt["speaker_model"].n_words == 2  # <UNK> + s0
    assert ckpt["epoch"] == 12
    # and it feeds straight back through the import CLI path
    state2 = it.import_hierarchy_checkpoint(ckpt, state, n_layers=NL)
    _tree_equal(jax.device_get(state.params), jax.device_get(state2.params))

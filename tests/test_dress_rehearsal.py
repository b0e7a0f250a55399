"""One-command dress rehearsal (VERDICT r4 item 4): the COMPLETE real-data
day flow as ONE chained test, so when the released TED lmdb files land the
only new variable is the data itself.

Chain (reference flow: lmdb_data_loader.py:58 -> train.py:652 ->
train_utils.py:197):

  reference-layout source lmdb (liblmdb pages + pyarrow-0.14 legacy
  envelope, the released datasets' exact wire format)
    -> `cli import-lmdb`                      (ingest)
    -> vocab build (inside `cli train`'s _prepare)
    -> `cli train` gesture_autoencoder        (the FGD embedder)
    -> `cli train` hierarchy w/ eval_net_path (FGD/MAJE each epoch)
    -> `cli eval --bc`                        (FGD + MAJE + BC in one pass)
    -> `cli export-checkpoint`                (reference torch .bin layout)
    -> torch.load + mirror strict-load        (key/shape-exact)
    -> forward parity torch-vs-native on the deterministic paths.

Every piece is covered in isolation elsewhere (test_lmdb_import, test_cli,
test_export_torch); this test proves the CHAIN."""

import ast
import json
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ha2g_tpu import cli  # noqa: E402
from ha2g_tpu.data.lmdb_import import write_reference_lmdb  # noqa: E402
from ha2g_tpu.data.synthetic import synthetic_clips  # noqa: E402
from ha2g_tpu.skeleton import TED_GESTURE  # noqa: E402

HID, NL, EMB = 16, 2, 32


def _write_source_lmdb(root: Path) -> Path:
    """A mini source lmdb in the reference's exact wire format
    (make_ted_dataset.py:215-220 layout: per-video {vid, clips} records,
    pyarrow-0.14 legacy serialization, liblmdb pages)."""
    clips = synthetic_clips(TED_GESTURE, n_clips=6, clip_seconds=6.0,
                            n_speakers=3, seed=11)
    videos = []
    for i in range(3):
        videos.append({
            "vid": f"vid_{i}",
            "clips": [{
                "words": [list(w) for w in c["words"]],
                "skeletons_3d": c["skeletons_3d"],
                "audio_feat": np.zeros((128, 10), np.float32),
                "audio_raw": c["audio_raw"],
                "start_frame_no": c["start_frame_no"],
                "end_frame_no": c["end_frame_no"],
                "start_time": c["start_time"],
                "end_time": c["end_time"],
            } for c in clips[2 * i:2 * i + 2]],
        })
    out = root / "lmdb_train"
    write_reference_lmdb(out, videos)
    return out


def test_dress_rehearsal_lmdb_to_torch(tmp_path, capsys):
    # 1. reference-format source lmdb -> `cli import-lmdb`
    lmdb_dir = _write_source_lmdb(tmp_path)
    clips_dir = tmp_path / "clips"
    assert cli.cmd_import_lmdb([str(lmdb_dir), str(clips_dir)]) == 0
    assert (clips_dir / "clips.npz").exists() or any(clips_dir.iterdir())

    # 2. train the FGD embedder on the imported clips (vocab is built from
    #    the clips inside _prepare — the reference's build_vocab step)
    ae_out = tmp_path / "out_ae"
    ae_yaml = tmp_path / "ae.yaml"
    ae_yaml.write_text("\n".join([
        "model: gesture_autoencoder", "dataset: ted_gesture",
        "name: rehearsal_ae", "pose_dim: 27",
        f"train_data_path: {clips_dir}", f"val_data_path: {clips_dir}",
        f"model_save_path: {ae_out}", "epochs: 1", "batch_size: 8",
        "hidden_size: 16", "n_layers: 1", f"wordembed_dim: {EMB}",
        "dropout_prob: 0.0", "random_seed: 5", "save_result_video: false",
    ]))
    assert cli.cmd_train(["--config", str(ae_yaml)]) == 0
    evalnet = ae_out / "checkpoint_final"
    assert evalnet.exists()

    # 3. train the flagship family with the embedder wired in: FGD + MAJE
    #    run every epoch like the reference driver (train.py:190-193)
    h_out = tmp_path / "out_h"
    h_yaml = tmp_path / "h.yaml"
    h_yaml.write_text("\n".join([
        "model: hierarchy", "dataset: ted_gesture",
        "name: rehearsal_h", "pose_dim: 27", "z_type: speaker",
        f"train_data_path: {clips_dir}", f"val_data_path: {clips_dir}",
        f"model_save_path: {h_out}", f"eval_net_path: {evalnet}",
        "epochs: 2", "batch_size: 8", f"hidden_size: {HID}",
        f"n_layers: {NL}", f"wordembed_dim: {EMB}", "dropout_prob: 0.0",
        "random_seed: 5", "save_result_video: false",
    ]))
    assert cli.cmd_train(["--config", str(h_yaml)]) == 0
    ckpt = h_out / "checkpoint_final"
    assert ckpt.exists()
    rows = [json.loads(l) for l in
            (h_out / "history.jsonl").read_text().splitlines()]
    assert len(rows) >= 2
    for row in rows:        # FGD + MAJE were live during training
        for k in ("frechet", "feat_dist", "diversity", "joint_mae",
                  "accel", "loss"):
            assert k in row and np.isfinite(row[k]), (k, row)

    # 4. `cli eval --bc`: FGD + MAJE + beat consistency from the trained
    #    checkpoint in one pass (reference synthesize.py eval mode +
    #    train.py:423-455 BC)
    capsys.readouterr()
    assert cli.cmd_eval([str(ckpt), "--clips", str(clips_dir),
                         "--bc"]) == 0
    printed = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = ast.literal_eval(printed)
    for k in ("loss", "joint_mae", "accel", "BC", "frechet", "feat_dist",
              "diversity"):
        assert k in metrics and np.isfinite(metrics[k]), (k, metrics)

    # 5. export BACK to the reference's torch .bin layout
    bin_path = tmp_path / "rehearsal_checkpoint.bin"
    assert cli.cmd_export_checkpoint([str(ckpt), str(bin_path)]) == 0

    # 6. torch-side strict load: the reference's exact checkpoint keys
    #    (train.py:232-243), loadable with only torch + numpy
    blob = torch.load(bin_path, map_location="cpu", weights_only=False)
    for k in ("args", "epoch", "lang_model", "speaker_model", "pose_dim",
              "gen_dict_1", "gen_dict_2", "gen_dict_3", "dis_dict",
              "audio_dict", "text_dict"):
        assert k in blob, k
    assert blob["pose_dim"] == 27

    from tests import torch_mirrors as tm
    cfg, lang, speaker, system, state = \
        cli._load_checkpoint_system(str(ckpt))
    n_words, n_spk = lang.n_words, max(speaker.n_words, 1)
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    rng = np.random.default_rng(3)
    B, T = 4, cfg.n_poses

    # audio_dict is the Hierarchical_WavEncoder state dict (reference
    # checkpoint layout, hierarchy_net.py:10-19: the ResNetSE lives under
    # a `feat_extractor.` attribute); the bare mirror drops the prefix
    t_audio = tm.TorchResNetSE(n_spk, pose_level=3).eval()
    t_audio.load_state_dict(
        {k.removeprefix("feat_extractor."): v
         for k, v in blob["audio_dict"].items()}, strict=True)
    t_text = tm.TorchTextEncoderTCN(n_words, EMB, HID, NL).eval()
    t_text.load_state_dict(blob["text_dict"], strict=True)
    t_dis = tm.TorchConvDiscriminator(27).eval()
    t_dis.load_state_dict(blob["dis_dict"], strict=True)
    dim0 = system.spec.level_dim(0)
    t_g1 = tm.TorchHierGenerator(dim0, n_words, n_spk, HID, NL,
                                 embed_dim=EMB).eval()
    t_g1.load_state_dict(blob["gen_dict_1"], strict=True)

    # 7. forward parity on the deterministic paths (generator-with-
    #    pinned-z parity is pinned by test_export_torch; here the trained
    #    weights came through train -> checkpoint -> export -> torch.load)
    spec_in = rng.normal(size=(B, 128, 70)).astype(np.float32)
    vids = rng.integers(0, n_spk, (B,))
    with torch.no_grad():
        _, _, _, hi_t, blends_t = t_audio(torch.from_numpy(spec_in),
                                          torch.from_numpy(vids))
    _, _, _, hi, blend = system.audio.apply(
        {"params": params["audio"], "batch_stats": stats["audio"]},
        jnp.asarray(spec_in), jnp.asarray(vids), train=False)
    np.testing.assert_allclose(np.asarray(hi), hi_t.numpy(), atol=2e-4)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(blend[i]),
                                   blends_t[i].numpy(), atol=2e-4)

    tokens = rng.integers(0, n_words, (B, T))
    with torch.no_grad():
        want_t = t_text(torch.from_numpy(tokens)).numpy()
    got_t = system.text.apply({"params": params["text"]},
                              jnp.asarray(tokens), deterministic=True)
    np.testing.assert_allclose(np.asarray(got_t), want_t, atol=1e-4)

    poses = rng.normal(size=(B, T, 27)).astype(np.float32) * 0.3
    with torch.no_grad():
        want_d = t_dis(torch.from_numpy(poses)).numpy()
    got_d = system.dis.apply(
        {"params": params["dis"], "batch_stats": stats["dis"]},
        jnp.asarray(poses), train=False)
    np.testing.assert_allclose(np.asarray(got_d), want_d, atol=1e-5)

    pre = rng.normal(size=(B, T, dim0 + 1)).astype(np.float32) * 0.3
    afeat = rng.normal(size=(B, T, 32)).astype(np.float32) * 0.3
    with torch.no_grad():
        _, _, mu_t, _ = t_g1(torch.from_numpy(pre),
                             torch.from_numpy(tokens),
                             torch.from_numpy(afeat),
                             torch.from_numpy(vids))
    _, _, mu, _ = system.gens[0].apply(
        {"params": params["gens"][0]}, jnp.asarray(pre),
        jnp.asarray(tokens), jnp.asarray(afeat), jnp.asarray(vids),
        train=False, rngs={"noise": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(), atol=1e-5)

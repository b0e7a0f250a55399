"""End-to-end CLI coverage: train -> checkpoint -> from-text synthesis, and
the dataset stats commands.

The from-text path exercises the one alignment route that works in this
image — a user-supplied wav + uniform word alignment (no GCP TTS, no gentle;
reference synthesize.py:273-338) — through a real trained checkpoint to a
written pose file.
"""

import json
import wave
from pathlib import Path

import numpy as np
import pytest

from ha2g_tpu import cli


@pytest.fixture(scope="module")
def trained_checkpoint(tmp_path_factory):
    """One-epoch multimodal_context training on the synthetic dataset at
    tiny capacity; returns the final checkpoint dir."""
    root = tmp_path_factory.mktemp("cli_train")
    cfg_path = root / "tiny.yaml"
    cfg_path.write_text("\n".join([
        "model: multimodal_context",
        "dataset: ted_gesture",
        "name: tiny_cli",
        "train_data_path: synthetic",
        "val_data_path: synthetic",
        f"model_save_path: {root / 'out'}",
        "epochs: 1",
        "batch_size: 8",
        "hidden_size: 16",
        "n_layers: 1",
        "wordembed_dim: 32",
        "dropout_prob: 0.0",
        "loader_workers: 0",
    ]))
    rc = cli.cmd_train(["--config", str(cfg_path)])
    assert rc == 0
    ckpt = root / "out" / "checkpoint_final"
    assert ckpt.exists()
    return ckpt


def test_cli_train_h36m_feature_extractor(tmp_path):
    """The H36M FGD-embedder path end to end (reference
    train_feature_extractor.py): a fabricated h36m npz -> cli train
    (gesture_autoencoder) -> checkpoints, with the extractor's pose-diff
    recon term auto-enabled (config.embed_pose_diff_loss) and recorded in
    the self-describing checkpoint."""
    import json as _json

    rng = np.random.default_rng(2)
    positions = {"S1": {"Walking": rng.normal(size=(700, 32, 3)).astype(
        np.float32)}, "S11": {"Eating": rng.normal(
            size=(500, 32, 3)).astype(np.float32)}}
    np.savez(tmp_path / "h36m.npz",
             positions_3d=np.array(positions, dtype=object))
    cfg_path = tmp_path / "h36m.yaml"
    cfg_path.write_text("\n".join([
        "model: gesture_autoencoder",
        "dataset: ted_gesture",
        "name: h36m_ae",
        f"train_data_path: {tmp_path / 'h36m.npz'}",
        f"model_save_path: {tmp_path / 'out'}",
        "epochs: 1",
        "batch_size: 8",   # divisible by the virtual 8-device test mesh
        "loader_workers: 0",
    ]))
    rc = cli.cmd_train(["--config", str(cfg_path)])
    assert rc == 0
    ckpt = tmp_path / "out" / "checkpoint_final"
    assert ckpt.exists()
    saved = _json.loads((ckpt / "config.json").read_text())
    assert saved["config"]["embed_pose_diff_loss"] is True


def _write_wav(path: Path, seconds: float = 3.0, sr: int = 16000):
    t = np.arange(int(seconds * sr)) / sr
    sig = (0.3 * np.sin(2 * np.pi * 220 * t) *
           (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)))
    pcm = (sig * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return path


def test_from_text_end_to_end(trained_checkpoint, tmp_path):
    """cli from-text with a generated wav runs transcript -> uniform_align
    -> sliding-window synthesis -> written npz (VERDICT r2 item 8)."""
    wav = _write_wav(tmp_path / "speech.wav")
    out = tmp_path / "gestures.npz"
    rc = cli.cmd_from_text([
        str(trained_checkpoint),
        "--text", "hello there this is a synthesized gesture test",
        "--wav", str(wav), "--out", str(out)])
    assert rc == 0
    data = np.load(out)
    dir_vec = data["dir_vec"]
    assert dir_vec.ndim == 3 and dir_vec.shape[0] == 1
    assert dir_vec.shape[2] == 27          # ted_gesture pose dim
    # 3 s at 15 fps, windowed with stride 30 -> >= 45 frames
    assert dir_vec.shape[1] >= 45
    assert np.isfinite(dir_vec).all()
    assert float(np.abs(dir_vec).max()) > 0


def test_synthesize_and_eval_cli(trained_checkpoint, tmp_path, capsys):
    out = tmp_path / "synth.npz"
    rc = cli.cmd_synthesize([str(trained_checkpoint), "--n", "2",
                             "--out", str(out)])
    assert rc == 0
    assert np.isfinite(np.load(out)["dir_vec"]).all()

    # eval mode (reference synthesize.py:263-271): testset metrics from the
    # restored checkpoint
    rc = cli.cmd_eval([str(trained_checkpoint)])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "loss" in printed and "joint_mae" in printed


def _parse_yaml_block(text: str) -> dict:
    """Parse the stats commands' YAML-ready output."""
    import yaml
    lines = [ln for ln in text.splitlines() if not ln.startswith("#")]
    return yaml.safe_load("\n".join(lines))


def test_motion_stats_cli(tmp_path, capsys):
    """cli motion-stats emits the YAML constants and they match
    tools.motion_stats on the same store (reference
    calculate_motion_stats.py:12-51)."""
    from ha2g_tpu.data.storage import save_clips
    from ha2g_tpu.data.synthetic import synthetic_clips
    from ha2g_tpu.skeleton import TED_GESTURE
    from ha2g_tpu.tools import motion_stats

    clips = synthetic_clips(TED_GESTURE, n_clips=4, clip_seconds=4.0,
                            n_speakers=2, seed=3)
    store = tmp_path / "train"
    save_clips(store, clips)

    rc = cli.cmd_motion_stats([str(store), "--dataset", "ted_gesture"])
    assert rc == 0
    got = _parse_yaml_block(capsys.readouterr().out)
    want = motion_stats(clips, TED_GESTURE)
    np.testing.assert_allclose(np.asarray(got["mean_dir_vec"]),
                               want["mean_dir_vec"], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got["mean_pose"]),
                               want["mean_pose"], rtol=2e-5, atol=2e-6)
    assert len(got["mean_dir_vec"]) == TED_GESTURE.n_bones * 3


def test_angle_stats_cli(tmp_path, capsys):
    """cli angle-stats over the synthetic set emits AnglePrior-shaped
    constants (reference calculate_angle_stats.py:39-197)."""
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text("\n".join([
        "model: hierarchy",
        "dataset: ted_gesture",
        "train_data_path: synthetic",
        "val_data_path: synthetic",
        "wordembed_dim: 32",
    ]))
    rc = cli.cmd_angle_stats(["--config", str(cfg_path)])
    assert rc == 0
    out = capsys.readouterr().out
    got = _parse_yaml_block(out)
    from ha2g_tpu.skeleton import TED_GESTURE
    n_pairs = len(TED_GESTURE.angle_prior.pairs)
    for key in ("avg_angle", "var_angle", "change_angle"):
        vals = np.asarray(got[key], np.float64)
        assert vals.shape == (n_pairs,)
        assert np.isfinite(vals).all()
    # angles are normalized by pi -> [0, 1]
    assert ((0 <= np.asarray(got["avg_angle"]))
            & (np.asarray(got["avg_angle"]) <= 1)).all()
    assert got["angle_pairs"] == [list(p)
                                  for p in TED_GESTURE.angle_prior.pairs]

"""Aux subsystem tests: checkpoint resume, rendering, stats tools, h36m,
TTS fallback alignment, expressive hierarchy train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_checkpoint_roundtrip(tmp_path):
    from ha2g_tpu.checkpoint import (load_config, load_state, load_vocabs,
                                     save_checkpoint)
    from ha2g_tpu.config import Config
    from ha2g_tpu.data.vocab import Vocab
    from ha2g_tpu.train.baselines import EmbedSystem

    cfg = Config(model="gesture_autoencoder", pose_dim=27, n_poses=34)
    sys_ = EmbedSystem(cfg)
    batch = {"target": jnp.ones((2, 34, 27))}
    state = sys_.init(jax.random.PRNGKey(0), batch)
    lang = Vocab("words")
    lang.index_word("hello")
    lang.random_word_vectors(8)

    save_checkpoint(tmp_path / "ck", state, cfg, lang=lang,
                    extra={"epoch": 3})
    cfg2, extra = load_config(tmp_path / "ck")
    assert cfg2.model == "gesture_autoencoder" and extra["epoch"] == 3
    lang2, _ = load_vocabs(tmp_path / "ck")
    assert lang2.get_word_index("hello") == lang.get_word_index("hello")
    assert lang2.word_embedding_weights.shape == (lang.n_words, 8)

    template = sys_.init(jax.random.PRNGKey(1), batch)  # different init
    restored = load_state(tmp_path / "ck", template)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (resume capability)
    oa = jax.tree_util.tree_leaves(state.opt)
    ob = jax.tree_util.tree_leaves(restored.opt)
    for x, y in zip(oa, ob):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_render_gif(tmp_path):
    from ha2g_tpu.render import create_video_and_save
    from ha2g_tpu.skeleton import TED_GESTURE
    rng = np.random.default_rng(0)
    out = rng.normal(size=(6, 27)).astype(np.float32) * 0.3
    path = create_video_and_save(str(tmp_path), 0, "test", 0, out, out,
                                 np.zeros(27), "smoke", TED_GESTURE)
    assert path.endswith((".gif", ".mp4"))
    import os
    assert os.path.getsize(path) > 0


def test_motion_and_angle_stats():
    from ha2g_tpu.data.synthetic import default_mean_dir_vec, synthetic_clips
    from ha2g_tpu.skeleton import TED_GESTURE
    from ha2g_tpu.tools import angle_stats, motion_stats
    clips = synthetic_clips(TED_GESTURE, n_clips=2, clip_seconds=4.0)
    ms = motion_stats(clips, TED_GESTURE)
    assert ms["mean_dir_vec"].shape == (27,)
    assert ms["mean_bone_lengths"].shape == (9,)
    # synthetic FK uses spec bone lengths exactly
    np.testing.assert_allclose(ms["mean_bone_lengths"],
                               TED_GESTURE.lengths, atol=1e-4)
    targets = np.random.default_rng(0).normal(
        size=(4, 34, 27)).astype(np.float32) * 0.2
    st = angle_stats(targets, default_mean_dir_vec(TED_GESTURE), TED_GESTURE)
    assert st["avg_angle"].shape == (4,)
    assert st["change_angle"].shape == (4,)
    assert (st["var_angle"] >= 0).all()


def test_h36m_pipeline(tmp_path):
    from ha2g_tpu.data.h36m import h36m_windows
    rng = np.random.default_rng(0)
    # fabricate an h36m-format npz: 2 subjects, 32-joint skeletons
    positions = {"S1": {"Walking": rng.normal(size=(200, 32, 3)).astype(
        np.float32)}, "S11": {"Eating": rng.normal(
            size=(150, 32, 3)).astype(np.float32)}}
    np.savez(tmp_path / "h36m.npz",
             positions_3d=np.array(positions, dtype=object))
    mean = np.zeros(27, np.float32)
    train = h36m_windows(str(tmp_path / "h36m.npz"), mean, is_train=True)
    test = h36m_windows(str(tmp_path / "h36m.npz"), mean, is_train=False)
    assert train.shape[1:] == (34, 27)
    assert test.shape[0] < train.shape[0]
    # targets are unit dir vecs (mean 0 subtracted)
    norms = np.linalg.norm(train[0].reshape(34, 9, 3), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_uniform_align():
    from ha2g_tpu.tts_align import uniform_align
    words = uniform_align("hello world how are you", 5.0)
    assert len(words) == 5
    assert all(0 < w[1] < 5.0 for w in words)
    assert words[0][0] == "hello"
    assert uniform_align("", 5.0) == []


def test_expressive_hierarchy_train_step():
    """6-level cascade end to end (tiny dims)."""
    from ha2g_tpu.config import Config
    from ha2g_tpu.data.synthetic import default_mean_dir_vec
    from ha2g_tpu.skeleton import TED_EXPRESSIVE
    from ha2g_tpu.train.hierarchy import HierarchySystem

    cfg = Config(model="hierarchy", dataset="ted_expressive", pose_dim=126,
                 n_poses=34, hidden_size=32, n_layers=2, z_type="speaker",
                 loss_warmup=10, loss_gan_weight=5.0,
                 loss_regression_weight=70.0, loss_kld_weight=0.1,
                 loss_reg_weight=0.05, loss_contrastive_pos_weight=0.2,
                 loss_contrastive_neg_weight=0.005, loss_physical_weight=0.01,
                 mean_dir_vec=list(map(float,
                                       default_mean_dir_vec(TED_EXPRESSIVE))))
    sys_ = HierarchySystem(cfg, n_words=12, n_speakers=3)
    rng = np.random.default_rng(0)
    batch = {
        "text": jnp.asarray(rng.integers(0, 12, (2, 34))),
        "spec": jnp.asarray(rng.normal(size=(2, 128, 70)).astype(np.float32)),
        "target": jnp.asarray(
            rng.normal(size=(2, 34, 126)).astype(np.float32) * 0.1),
        "vids": jnp.asarray(rng.integers(0, 3, (2,))),
    }
    state = sys_.init(jax.random.PRNGKey(0), batch)
    step = sys_.make_train_step(gan_on=True)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss", "dis", "gen", "phy", "KLD"):
        assert np.isfinite(float(metrics[k])), k


def test_training_is_reproducible():
    """Golden-trajectory property (SURVEY.md section 4): fixed seeds give an
    identical loss trajectory run to run."""
    from ha2g_tpu.config import Config
    from ha2g_tpu.data import (BatchLoader, Vocab, build_vocab,
                               default_mean_dir_vec, synthetic_clips,
                               window_clips)
    from ha2g_tpu.skeleton import TED_GESTURE
    from ha2g_tpu.train.loop import Trainer

    cfg = Config(model="gesture_autoencoder", pose_dim=27, n_poses=34,
                 batch_size=8, epochs=1, random_seed=7,
                 model_save_path="/tmp/ha2g_repro")
    clips = synthetic_clips(TED_GESTURE, n_clips=3, clip_seconds=6.0)
    lang = build_vocab("words", [clips])
    speaker = Vocab("vid", insert_default_tokens=False)
    for c in clips:
        speaker.index_word(c["vid"])
    samples = window_clips(clips, TED_GESTURE, lang, speaker,
                           np.zeros(30, np.float32),
                           default_mean_dir_vec(TED_GESTURE))

    def run():
        tr = Trainer(cfg, samples, samples, lang, speaker, use_mesh=False)
        _, history = tr.fit(epochs=1, save_path="/tmp/ha2g_repro")
        return [h["loss"] for h in history]

    assert run() == run()


def test_h36m_cli_prepare(tmp_path):
    """The CLI's H36M path produces trainable samples for the FGD AE."""
    from ha2g_tpu.cli import _prepare
    from ha2g_tpu.config import Config
    rng = np.random.default_rng(0)
    positions = {"S1": {"Walk": rng.normal(size=(180, 32, 3)).astype(
        np.float32)}, "S11": {"Eat": rng.normal(size=(150, 32, 3)).astype(
            np.float32)}}
    p = tmp_path / "h36m.npz"
    np.savez(p, positions_3d=np.array(positions, dtype=object))
    cfg = Config(model="gesture_autoencoder", pose_dim=27, n_poses=34,
                 train_data_path=str(p), val_data_path=str(p))
    cfg2, lang, speaker, train_s, val_s = _prepare(cfg)
    assert len(train_s) > 0 and len(val_s) > 0
    assert train_s.target.shape[1:] == (34, 27)


def test_resume_continues_training(tmp_path):
    """Resume restores params + optimizer state and continues at the next
    epoch."""
    from ha2g_tpu.config import Config
    from ha2g_tpu.data import (Vocab, build_vocab, default_mean_dir_vec,
                               synthetic_clips, window_clips)
    from ha2g_tpu.skeleton import TED_GESTURE
    from ha2g_tpu.train.loop import Trainer

    cfg = Config(model="gesture_autoencoder", pose_dim=27, n_poses=34,
                 batch_size=8, random_seed=3,
                 model_save_path=str(tmp_path))
    clips = synthetic_clips(TED_GESTURE, n_clips=3, clip_seconds=6.0)
    lang = build_vocab("words", [clips])
    speaker = Vocab("vid", insert_default_tokens=False)
    for c in clips:
        speaker.index_word(c["vid"])
    samples = window_clips(clips, TED_GESTURE, lang, speaker,
                           np.zeros(30, np.float32),
                           default_mean_dir_vec(TED_GESTURE))

    tr = Trainer(cfg, samples, samples, lang, speaker, use_mesh=False)
    state1, hist1 = tr.fit(epochs=2, save_path=str(tmp_path))

    tr2 = Trainer(cfg, samples, samples, lang, speaker, use_mesh=False)
    state2, hist2 = tr2.fit(epochs=4, save_path=str(tmp_path / "resumed"),
                            resume_from=str(tmp_path / "checkpoint_final"))
    # the restored state's first eval reproduces the first run's FINAL
    # eval (same params, same eval rng): the actual resume guarantee —
    # and a far stronger check than the old "improved vs epoch 0", whose
    # 1e-4 margin was at the mercy of XLA CPU reduction ordering
    assert np.isclose(hist2[0]["loss"], hist1[-1]["loss"],
                      rtol=1e-5, atol=1e-6)
    assert int(state2.step) > int(state1.step)


def test_bench_eval_tiny_smoke():
    """bench_eval.py's TINY mode exercises the full val-pass glue (eval
    cascade -> FGD push -> Frechet/diversity -> MAJE/accel) end to end on
    CPU in a subprocess; stdout must be one JSON line."""
    import json
    import os
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parents[1]
    env = dict(os.environ, HA2G_BENCH_EVAL_TINY="1")
    r = subprocess.run([sys.executable, str(root / "bench_eval.py")],
                       capture_output=True, text=True, timeout=600,
                       cwd=str(root), env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["metric"] == "expressive_val_pass_wall_time"
    # TINY runs are tagged, report the raw (unrounded) wall time, and omit
    # vs_baseline — a smoke capture must not masquerade as a real one
    assert payload["tiny"] is True
    assert "vs_baseline" not in payload
    assert isinstance(payload["value"], float) and payload["value"] > 0
    assert "32-sample" in payload["unit"]

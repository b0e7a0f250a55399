"""Command-line entry points.

  python -m ha2g_tpu.cli train --config configs/hierarchy.yml
  python -m ha2g_tpu.cli synthesize <checkpoint_dir> [--clips DIR] [--n N]
  python -m ha2g_tpu.cli import-lmdb SRC DST

Mirrors the reference's driver surface (scripts/train.py,
scripts/synthesize_hierarchy.py {eval,from_db_clip} modes; the from_text
mode needs external TTS + forced alignment and is provided via
ha2g_tpu.tts_align behind optional deps).

Data paths in configs may be:
  * a clip-storage directory (ha2g_tpu/data/storage.py)
  * "synthetic" / empty — a built-in synthetic dataset (for smoke runs)
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np


def _load_split(path: str, cfg, seed: int):
    from ha2g_tpu.data.storage import load_clips
    from ha2g_tpu.data.synthetic import synthetic_clips
    if path and path not in ("synthetic", "none") and Path(path).exists():
        return load_clips(path)
    n = {0: 24, 1: 8, 2: 8}[seed % 3]
    return synthetic_clips(cfg.skeleton, n_clips=n, clip_seconds=8.0,
                           n_speakers=6, seed=seed)


def _h36m_samples(cfg, is_train):
    """H36M windows -> WindowedSamples with dummy text/audio channels (the
    gesture autoencoder consumes only `target`; reference
    train_feature_extractor.py:110-131)."""
    from ha2g_tpu.data.dataset import WindowedSamples, spectrogram_length_for
    from ha2g_tpu.data.h36m import h36m_windows
    targets = h36m_windows(cfg.train_data_path, cfg.mean_dir_vec_array,
                           is_train=is_train, n_poses=cfg.n_poses)
    n = targets.shape[0]
    audio_len = int(round(cfg.n_poses / cfg.motion_resampling_framerate
                          * 16000))
    spec_len = spectrogram_length_for(cfg.n_poses,
                                      cfg.motion_resampling_framerate)
    z = np.zeros
    return WindowedSamples(
        text=z((n, cfg.n_poses), np.int32),
        word_seq=z((n, 2), np.int32), word_lengths=np.full(n, 2, np.int32),
        pose=z((n, cfg.n_poses, 30), np.float32), target=targets,
        audio=z((n, audio_len), np.float32),
        spec=z((n, 128, spec_len), np.float32), vids=z((n,), np.int32))


def _prepare(cfg):
    """Load clips, build vocabs, window into samples."""
    from ha2g_tpu.data.dataset import window_clips
    from ha2g_tpu.data.synthetic import default_mean_dir_vec
    from ha2g_tpu.data.vocab import Vocab, build_vocab

    if cfg.train_data_path.endswith(".npz"):
        # H36M feature-extractor path (reference train_feature_extractor.py)
        # — its train_iter adds the pose-diff L1 term train_iter_embed
        # lacks (train_feature_extractor.py:68-71 vs train_joint_embed.py:29)
        cfg.embed_pose_diff_loss = True
        lang = Vocab("words")
        speaker = Vocab("vid", insert_default_tokens=False)
        lang.random_word_vectors(cfg.wordembed_dim)
        return (cfg, lang, speaker, _h36m_samples(cfg, True),
                _h36m_samples(cfg, False))

    if Path(cfg.train_data_path, "samples.npz").exists():
        # pre-windowed samples from `import-lmdb --format cache`
        from ha2g_tpu.data.lmdb_import import load_imported_samples
        train_s, lang, speaker = load_imported_samples(cfg.train_data_path)
        val_path = cfg.test_data_path or cfg.val_data_path
        if val_path and Path(val_path, "samples.npz").exists():
            val_s, _, _ = load_imported_samples(val_path)
        else:
            logging.warning(
                "no imported validation samples found (%s): validating on "
                "the TRAINING set — per-epoch metrics and best-checkpoint "
                "selection will be optimistic; set test_data_path/"
                "val_data_path to an imported split", val_path or "<unset>")
            val_s = train_s
        if cfg.wordembed_path and Path(cfg.wordembed_path).exists():
            lang.load_word_vectors(cfg.wordembed_path, cfg.wordembed_dim)
        else:
            lang.random_word_vectors(cfg.wordembed_dim)
        logging.info(f"imported samples: train {len(train_s)}, "
                     f"val {len(val_s)}, vocab {lang.n_words} words")
        return cfg, lang, speaker, train_s, val_s

    train_clips = _load_split(cfg.train_data_path, cfg, 0)
    # the reference driver validates on the TEST loader each epoch
    # (train.py:652-724 passes test_loader to train_epochs); prefer
    # test_data_path for the eval split when it is set
    eval_path = cfg.test_data_path or cfg.val_data_path
    val_clips = _load_split(eval_path, cfg, 1)

    lang = build_vocab("words", [train_clips, val_clips])
    if cfg.wordembed_path and Path(cfg.wordembed_path).exists():
        # .bin (fastText, incl. the reference configs' default
        # crawl-300d-2M-subword.bin), .vec text, or pre-aligned .npy
        lang.load_word_vectors(cfg.wordembed_path, cfg.wordembed_dim)
    else:
        lang.random_word_vectors(cfg.wordembed_dim)
    speaker = Vocab("vid", insert_default_tokens=False)
    for c in train_clips + val_clips:
        speaker.index_word(c["vid"])

    if cfg.mean_dir_vec is not None:
        mean_vec = cfg.mean_dir_vec_array
    else:
        mean_vec = default_mean_dir_vec(cfg.skeleton)
        cfg = cfg.replace(mean_dir_vec=list(map(float, mean_vec)))
    mean_pose = cfg.mean_pose_array if cfg.mean_pose is not None else \
        np.zeros(cfg.skeleton.n_joints * 3, np.float32)

    static = (6, 7) if cfg.dataset == "ted_expressive" else (6, 9)
    kw = dict(spec=cfg.skeleton, lang=lang, speaker=speaker,
              mean_pose=mean_pose, mean_dir_vec=mean_vec,
              n_poses=cfg.n_poses, subdivision_stride=cfg.subdivision_stride,
              fps=cfg.motion_resampling_framerate, static_joints=static)
    train_samples = window_clips(train_clips, **kw)
    val_samples = window_clips(val_clips, **kw)
    logging.info(f"train samples: {len(train_samples)}, "
                 f"val: {len(val_samples)}, vocab: {lang.n_words} words, "
                 f"{speaker.n_words} speakers")
    return cfg, lang, speaker, train_samples, val_samples


def _make_evaluator(cfg, lang):
    """Load the frozen FGD embedder if eval_net_path points at one."""
    from ha2g_tpu import checkpoint as ckpt
    from ha2g_tpu.eval.fgd import EmbeddingSpaceEvaluator
    if not cfg.eval_net_path or not Path(cfg.eval_net_path).exists():
        return None
    ev_cfg, _ = ckpt.load_config(cfg.eval_net_path)
    from ha2g_tpu.train.loop import build_system
    import jax
    sys_ = build_system(ev_cfg, lang.n_words, 1)
    # template init to restore into
    from ha2g_tpu.data.synthetic import synthetic_clips  # noqa
    import jax.numpy as jnp
    dummy = {"text": jnp.zeros((2, ev_cfg.n_poses), jnp.int32),
             "audio": jnp.zeros((2, int(round(ev_cfg.n_poses / 15 * 16000)))),
             "spec": jnp.zeros((2, 128, 70)),
             "target": jnp.zeros((2, ev_cfg.n_poses, ev_cfg.pose_dim)),
             "vids": jnp.zeros((2,), jnp.int32)}
    template = sys_.init(jax.random.PRNGKey(0), dummy)
    state = ckpt.load_state(cfg.eval_net_path, template)
    return EmbeddingSpaceEvaluator(ev_cfg.pose_dim, ev_cfg.n_poses,
                                   state.params, state.batch_stats,
                                   latent_dim=ev_cfg.latent_dim)


def cmd_train(argv):
    from ha2g_tpu.config import parse_cli
    from ha2g_tpu.train.loop import Trainer
    from ha2g_tpu.utils import set_logger, set_random_seed

    resume = None
    if "--resume" in argv:
        i = argv.index("--resume")
        resume = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    cfg = parse_cli(argv)
    set_logger(cfg.model_save_path, cfg.name)
    if cfg.random_seed >= 0:
        set_random_seed(cfg.random_seed)
    logging.info(f"config: {cfg}")
    cfg, lang, speaker, train_s, val_s = _prepare(cfg)
    evaluator = _make_evaluator(cfg, lang)
    trainer = Trainer(cfg, train_s, val_s, lang, speaker, evaluator)
    state, history = trainer.fit(resume_from=resume)
    logging.info(f"best: {trainer.best_values}")
    return 0


def _dummy_batch(cfg):
    import jax.numpy as jnp
    audio_len = int(round(cfg.n_poses / cfg.motion_resampling_framerate
                          * 16000))
    from ha2g_tpu.data.dataset import spectrogram_length_for
    spec_len = spectrogram_length_for(cfg.n_poses,
                                      cfg.motion_resampling_framerate)
    return {"text": jnp.zeros((2, cfg.n_poses), jnp.int32),
            "word_seq": jnp.zeros((2, 8), jnp.int32),
            "word_lengths": jnp.asarray([8, 4]),
            "spec": jnp.zeros((2, 128, spec_len)),
            "audio": jnp.zeros((2, audio_len)),
            "target": jnp.zeros((2, cfg.n_poses, cfg.pose_dim)),
            "vids": jnp.zeros((2,), jnp.int32)}


def _load_checkpoint_system(checkpoint: str):
    import jax
    from ha2g_tpu import checkpoint as ckpt
    from ha2g_tpu.train.loop import build_system
    cfg, _ = ckpt.load_config(checkpoint)
    lang, speaker = ckpt.load_vocabs(checkpoint)
    system = build_system(cfg, lang.n_words, max(speaker.n_words, 1),
                          lang.word_embedding_weights)
    template = system.init(jax.random.PRNGKey(0), _dummy_batch(cfg))
    state = ckpt.load_state(checkpoint, template)
    return cfg, lang, speaker, system, state


def cmd_synthesize(argv):
    """from_db_clip-style synthesis from a checkpoint (any model family)."""
    from ha2g_tpu.synthesis import make_synthesizer

    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("--clips", default="synthetic")
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--out", default="synthesis_out.npz")
    p.add_argument("--fade_out", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="hierarchy only: run the whole window loop as one "
                        "on-device lax.scan")
    p.add_argument("--low_latency", action="store_true",
                   help="hierarchy only: Pallas fused-GRU generators "
                        "(fastest for --n <= 8 interactive use)")
    p.add_argument("--render", action="store_true",
                   help="also render a skeleton video per clip")
    a = p.parse_args(argv)

    cfg, lang, speaker, system, state = _load_checkpoint_system(a.checkpoint)
    clips = _load_split(a.clips, cfg, 2)[:a.n]

    synth = make_synthesizer(system, state, low_latency=a.low_latency)
    n_samples = min(len(c["audio_raw"]) for c in clips)
    audio = np.stack([np.asarray(c["audio_raw"][:n_samples], np.float32)
                      for c in clips])
    words = [c["words"] for c in clips]
    vids = np.asarray([speaker.get_word_index(c["vid"]) for c in clips],
                      np.int32)
    if a.fused and hasattr(synth, "generate_fused"):
        out = synth.generate_fused(audio, words, lang, vids)
    else:
        out = synth.generate(audio, words, lang, vids, fade_out=a.fade_out)
    np.savez(a.out, dir_vec=out, audio=audio)
    print(f"wrote {a.out}: {out.shape}")
    if a.render:
        from ha2g_tpu.render import create_video_and_save
        path = create_video_and_save(
            str(Path(a.out).parent), 0, "synth", 0, None, out[0],
            cfg.mean_dir_vec_array, "synthesized", cfg.skeleton,
            audio=audio[0])
        print(f"rendered {path}")
    return 0


def cmd_from_text(argv):
    """from_text synthesis: transcript (+optional wav) -> gestures
    (reference synthesize.py:273-338; TTS/gentle are optional deps —
    without them supply --wav and the uniform word alignment is used)."""
    from ha2g_tpu.synthesis import make_synthesizer
    from ha2g_tpu.tts_align import TTSHelper, uniform_align

    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("--text", required=True)
    p.add_argument("--wav", default=None, help="16kHz mono wav; if omitted, "
                   "Google TTS is attempted")
    p.add_argument("--out", default="from_text_out.npz")
    a = p.parse_args(argv)

    cfg, lang, speaker, system, state = _load_checkpoint_system(a.checkpoint)

    if a.wav:
        import wave
        with wave.open(a.wav, "rb") as w:
            assert w.getframerate() == 16000 and w.getnchannels() == 1
            pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        audio = (pcm.astype(np.float32) / 32767.0)[None]
    else:
        path = TTSHelper().synthesis(f"<speak>{a.text}</speak>")
        import wave
        with wave.open(path, "rb") as w:
            pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        audio = (pcm.astype(np.float32) / 32767.0)[None]

    duration = audio.shape[1] / 16000.0
    try:
        from ha2g_tpu.tts_align import gentle_align
        words = gentle_align(a.wav, a.text)
    except ImportError:
        words = uniform_align(a.text, duration)

    synth = make_synthesizer(system, state)
    vids = np.zeros((1,), np.int32)
    out = synth.generate(audio, [words], lang, vids, fade_out=True)
    np.savez(a.out, dir_vec=out, audio=audio)
    print(f"wrote {a.out}: {out.shape}")
    return 0


def cmd_eval(argv):
    """Testset metrics from a checkpoint (reference synthesize*.py eval
    mode, synthesize.py:263-271)."""
    from ha2g_tpu.train.loop import Trainer

    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("--clips", default="synthetic")
    p.add_argument("--bc", action="store_true",
                   help="also compute beat consistency")
    a = p.parse_args(argv)

    cfg, lang, speaker, system, state = _load_checkpoint_system(a.checkpoint)
    cfg2, lang2, speaker2, train_s, val_s = _prepare(
        cfg.replace(test_data_path=a.clips))
    evaluator = _make_evaluator(cfg, lang)
    trainer = Trainer(cfg, val_s, val_s, lang, speaker, evaluator,
                      use_mesh=False, beat_consistency_score=a.bc)
    # evaluate the restored state with the trainer-owned jitted eval step
    trainer.system = system
    metrics = trainer.evaluate(state, 0)
    print({k: round(float(v), 5) for k, v in metrics.items()})
    return 0


def cmd_import_checkpoint(argv):
    """Convert a reference torch .bin checkpoint into a native checkpoint
    directory (loadable by synthesize/eval).  Handles every family the
    reference's loaders handle: hierarchy (train_utils.py:169-195) and the
    generic gen_dict checkpoints — multimodal_context, seq2seq,
    speech2gesture, joint_embedding (train_utils.py:197-213)."""
    import jax
    from ha2g_tpu import import_torch as it
    from ha2g_tpu.checkpoint import save_checkpoint
    from ha2g_tpu.train.loop import build_system

    p = argparse.ArgumentParser()
    p.add_argument("bin_path")
    p.add_argument("out_dir")
    a = p.parse_args(argv)

    ckpt = it.load_reference_checkpoint(a.bin_path)
    cfg = it.config_from_reference_args(ckpt["args"])
    lang = it.vocab_from_pickled(ckpt["lang_model"])
    speaker = it.vocab_from_pickled(ckpt["speaker_model"])
    system = build_system(cfg, lang.n_words, max(speaker.n_words, 1),
                          lang.word_embedding_weights)
    template = system.init(jax.random.PRNGKey(0), _dummy_batch(cfg))
    if cfg.model == "hierarchy":
        state = it.import_hierarchy_checkpoint(ckpt, template,
                                               n_layers=cfg.n_layers)
    else:
        state = it.import_generic_checkpoint(ckpt, template, cfg)
    save_checkpoint(a.out_dir, state, cfg, lang, speaker,
                    extra={"epoch": int(ckpt.get("epoch", 0)),
                           "imported_from": a.bin_path})
    print(f"imported {a.bin_path} -> {a.out_dir}")
    return 0


def cmd_export_checkpoint(argv):
    """Export a native checkpoint BACK to the reference's torch .bin
    format (the inverse of import-checkpoint; hierarchy family) — train on
    TPU here, deploy in a stack built on the reference code
    (ha2g_tpu/export_torch.py)."""
    from ha2g_tpu.export_torch import save_reference_checkpoint

    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="native checkpoint directory")
    p.add_argument("out_bin", help="output torch .bin path")
    a = p.parse_args(argv)
    cfg, lang, speaker, system, state = _load_checkpoint_system(a.checkpoint)
    if cfg.model == "hierarchy":
        save_reference_checkpoint(a.out_bin, state, cfg, lang, speaker)
        print(f"wrote {a.out_bin} (reference train.py:232-243 layout, "
              f"{cfg.skeleton.n_levels} gen_dicts)")
    elif cfg.model == "gesture_autoencoder":
        import torch
        from ha2g_tpu.export_torch import export_evalnet_checkpoint
        torch.save(export_evalnet_checkpoint(state, cfg), a.out_bin)
        print(f"wrote {a.out_bin} (reference FGD eval-net layout, "
              f"pose_dim {cfg.pose_dim})")
    else:
        import torch
        from ha2g_tpu.export_torch import export_generic_checkpoint
        torch.save(export_generic_checkpoint(state, cfg, lang, speaker),
                   a.out_bin)
        print(f"wrote {a.out_bin} (reference generic checkpoint layout, "
              f"model {cfg.model})")
    return 0


def cmd_import_evalnet(argv):
    """Convert a reference FGD eval-net checkpoint (.bin) into a native
    eval_net_path directory: EmbeddingNet 'gen_dict' for pose_dim 27,
    MotionAE 'motion_ae' for 126 (embedding_space_evaluator.py:27-34)."""
    import jax
    from ha2g_tpu import import_torch as it
    from ha2g_tpu.checkpoint import save_checkpoint
    from ha2g_tpu.config import Config
    from ha2g_tpu.train.loop import build_system

    p = argparse.ArgumentParser()
    p.add_argument("bin_path")
    p.add_argument("out_dir")
    a = p.parse_args(argv)

    ckpt = it.load_reference_checkpoint(a.bin_path)
    pose_dim = int(ckpt["pose_dim"])
    if pose_dim == 126:
        cfg = Config(model="gesture_autoencoder", dataset="ted_expressive",
                     pose_dim=126, latent_dim=int(ckpt.get("latent_dim", 128)))
        params, stats = it.convert_motion_ae(ckpt["motion_ae"])
    else:
        cfg = Config(model="gesture_autoencoder", dataset="ted_gesture",
                     pose_dim=pose_dim)
        params, stats = it.convert_embedding_net_pose(ckpt["gen_dict"])
    system = build_system(cfg, 4, 1)
    template = system.init(jax.random.PRNGKey(0), _dummy_batch(cfg))
    state = template.replace(params=params, batch_stats=stats)
    save_checkpoint(a.out_dir, state, cfg,
                    extra={"imported_from": a.bin_path})
    print(f"imported eval net {a.bin_path} -> {a.out_dir}")
    return 0


def cmd_import_lmdb(argv):
    from ha2g_tpu.data.lmdb_import import import_cache_lmdb, import_lmdb
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--format", choices=("source", "cache"),
                   default="source",
                   help="'source' = per-video {vid, clips} lmdb "
                        "(lmdb_train/...); 'cache' = the preprocessed "
                        "per-sample lmdb_*_cache directories")
    p.add_argument("--n_poses", type=int, default=34)
    p.add_argument("--fps", type=int, default=15)
    a = p.parse_args(argv)
    if a.format == "cache":
        n = import_cache_lmdb(a.src, a.dst, n_poses=a.n_poses, fps=a.fps,
                              limit=a.limit)
        print(f"imported {n} windowed samples -> {a.dst}")
    else:
        n = import_lmdb(a.src, a.dst, a.limit)
        print(f"imported {n} clips -> {a.dst}")
    return 0


def cmd_serve(argv):
    """Persistent gesture-synthesis server: warm compiled model,
    micro-batching across concurrent requests, HTTP/JSON API
    (ha2g_tpu/serve.py)."""
    from ha2g_tpu.serve import serve_forever
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8017)
    p.add_argument("--max_clip_seconds", type=float, default=20.0)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--batch_window_ms", type=float, default=30.0)
    p.add_argument("--no_low_latency", action="store_true",
                   help="disable the Pallas fused-GRU generators")
    p.add_argument("--stream_batching", action="store_true",
                   help="coalesce concurrent live streams' windows into "
                        "one device call (serve.py::_WindowBatcher)")
    a = p.parse_args(argv)
    serve_forever(a.checkpoint, a.host, a.port,
                  max_clip_seconds=a.max_clip_seconds,
                  max_batch=a.max_batch,
                  batch_window_ms=a.batch_window_ms,
                  low_latency=not a.no_low_latency,
                  stream_batching=a.stream_batching)
    return 0


def cmd_make_librosa_goldens(argv):
    """Generate the DSP golden fixture AGAINST LIBROSA ITSELF (run in an
    env with librosa 0.8; see tests/test_mel_oracles.py)."""
    from ha2g_tpu.tools import make_librosa_goldens
    p = argparse.ArgumentParser()
    p.add_argument("out", nargs="?",
                   default="tests/fixtures/librosa_goldens.npz")
    a = p.parse_args(argv)
    Path(a.out).parent.mkdir(parents=True, exist_ok=True)
    print(f"wrote {make_librosa_goldens(a.out)}")
    return 0


def cmd_import_embeddings(argv):
    """Align a pretrained embedding model (fastText .bin / text .vec) to a
    dataset's vocabulary and write the (n_words, dim) .npy table — a
    precomputed cache for wordembed_path (reference vocab.py:70-84 does
    this inline at every training start)."""
    from ha2g_tpu.config import parse_cli
    from ha2g_tpu.data.vocab import build_vocab

    p = argparse.ArgumentParser()
    p.add_argument("model", help="fastText .bin or .vec/.txt text vectors")
    p.add_argument("out", help="output .npy path")
    p.add_argument("--config", required=True,
                   help="training config whose data defines the vocab")
    p.add_argument("--dim", type=int, default=300)
    a = p.parse_args(argv)

    cfg = parse_cli(["--config", a.config])
    train_clips = _load_split(cfg.train_data_path, cfg, 0)
    val_clips = _load_split(cfg.test_data_path or cfg.val_data_path, cfg, 1)
    lang = build_vocab("words", [train_clips, val_clips])
    lang.load_word_vectors(a.model, a.dim)
    np.save(a.out, lang.word_embedding_weights)
    print(f"aligned {lang.n_words} words x {a.dim} -> {a.out}")
    return 0


def cmd_parse_reference_log(argv):
    """Parse a reference training log (training_logs/*.log) into a
    structured baseline JSON for the golden-trajectory harness
    (eval/trajectory.py)."""
    import json
    from ha2g_tpu.eval.trajectory import parse_reference_log

    p = argparse.ArgumentParser()
    p.add_argument("log_path")
    p.add_argument("--out", default=None,
                   help="output JSON (default: ha2g_tpu/baselines/<stem>.json)")
    a = p.parse_args(argv)
    traj = parse_reference_log(a.log_path)
    out = Path(a.out) if a.out else (
        Path(__file__).resolve().parent / "baselines" / f"{traj.name}.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(traj.to_json(), indent=1))
    print(f"parsed {len(traj.val)} val epochs, {len(traj.train)} train lines"
          f" -> {out}")
    print("best:", {k: v for k, v in traj.best.items()})
    return 0


def cmd_compare_trajectory(argv):
    """Compare a run's history.jsonl against a reference trajectory —
    a committed baseline name (e.g. ted_gesture_new) or a raw reference
    log path.  The golden-trajectory regression harness (SURVEY.md §7
    step 9; reference anchor: training_logs/ted_gesture_new.log:859)."""
    import json
    from ha2g_tpu.eval import trajectory as tj

    p = argparse.ArgumentParser()
    p.add_argument("history", help="history.jsonl from a Trainer run "
                   "(written next to the checkpoints)")
    p.add_argument("--ref", default="ted_gesture_new",
                   help="baseline name or reference log path")
    p.add_argument("--keys", default="frechet,joint_mae,diversity,"
                   "feat_dist,loss")
    p.add_argument("--json", dest="json_out", default=None,
                   help="also write the report as JSON")
    a = p.parse_args(argv)

    ref = (tj.parse_reference_log(a.ref) if Path(a.ref).exists()
           else tj.load_baseline(a.ref))
    ours = tj.load_history_jsonl(a.history)
    report = tj.compare_trajectories(ref, ours,
                                     keys=tuple(a.keys.split(",")))
    print(tj.format_report(report))
    if a.json_out:
        Path(a.json_out).write_text(json.dumps(report, indent=1))
    bad = [k for k, e in report["metrics"].items()
           if e["verdict"] in ("BEHIND", "INSUFFICIENT_REF")]
    return 1 if bad else 0


def _fmt_floats(arr, per_line=6, indent="  "):
    """YAML flow-sequence rendering at the reference's 7-digit precision
    (calculate_motion_stats.py:57 np.set_printoptions(precision=7))."""
    vals = [f"{float(v):.7g}" for v in np.asarray(arr).reshape(-1)]
    lines = [", ".join(vals[i:i + per_line])
             for i in range(0, len(vals), per_line)]
    return "[\n" + indent + ("," + "\n" + indent).join(lines) + "]"


def cmd_motion_stats(argv):
    """mean_pose / mean_dir_vec / mean bone lengths over a clip store,
    emitted as a YAML-ready config block (reference
    calculate_motion_stats.py:12-51 prints the same constants)."""
    from ha2g_tpu.config import Config
    from ha2g_tpu.tools import motion_stats

    p = argparse.ArgumentParser()
    p.add_argument("clips", help="clip-storage directory (a train split)")
    p.add_argument("--dataset", default="ted_expressive",
                   choices=("ted_gesture", "ted_expressive"))
    p.add_argument("--fps", type=int, default=15)
    a = p.parse_args(argv)

    cfg = Config(model="hierarchy", dataset=a.dataset)
    from ha2g_tpu.data.storage import load_clips
    clips = load_clips(a.clips)
    stats = motion_stats(clips, cfg.skeleton, fps=a.fps)
    total_s = sum(c["end_time"] - c["start_time"] for c in clips)
    print(f"# {len(clips)} clips, {stats['n_frames']} frames, "
          f"{total_s / 3600.0:.1f} h of valid clips")
    print("mean_pose:", _fmt_floats(stats["mean_pose"]))
    print("mean_dir_vec:", _fmt_floats(stats["mean_dir_vec"]))
    print("# mean bone lengths (skeleton.py bone table):",
          [round(float(v), 4) for v in stats["mean_bone_lengths"]])
    return 0


def cmd_angle_stats(argv):
    """Per-angle-pair avg / var / mean |frame-to-frame change| over the
    windowed training targets — the AnglePrior constants
    (reference calculate_angle_stats.py:39-197)."""
    from ha2g_tpu.config import parse_cli
    from ha2g_tpu.tools import angle_stats

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True,
                   help="training config (provides data paths, windowing, "
                        "mean_dir_vec)")
    a, rest = p.parse_known_args(argv)
    cfg = parse_cli(["--config", a.config] + rest)
    cfg, lang, speaker, train_s, _ = _prepare(cfg)

    stats = angle_stats(np.asarray(train_s.target),
                        cfg.mean_dir_vec_array, cfg.skeleton)
    pairs = cfg.skeleton.angle_prior.pairs
    print(f"# {len(train_s)} windows x {cfg.n_poses} frames, "
          f"{len(pairs)} angle pairs")
    print("angle_pairs:", list(map(list, pairs)))
    print("avg_angle:", _fmt_floats(stats["avg_angle"]))
    print("var_angle:", _fmt_floats(stats["var_angle"]))
    print("change_angle:", _fmt_floats(stats["change_angle"]))
    return 0


def cmd_build_dataset(argv):
    """Dataset-construction orchestrator: download -> audio -> pose ->
    scenes -> word timings -> filter -> assembled clip-storage splits
    (the reference's hand-run per-step scripts, dataset_script/README.md:
    37-88, chained with artifact-level resume)."""
    from ha2g_tpu.dataset_pipeline.pipeline import build_dataset

    p = argparse.ArgumentParser()
    p.add_argument("ids", nargs="*", help="YouTube video ids")
    p.add_argument("--video-ids", default=None,
                   help="file with one video id per line "
                        "(reference video_ids.txt)")
    p.add_argument("--work", required=True, help="working directory "
                   "(videos/, audio/, keypoints/, scenes/, align/)")
    p.add_argument("--out", required=True, help="clip-storage output dir")
    p.add_argument("--fps", type=float, default=25.0)
    p.add_argument("--min-shoulder-px", type=float, default=100.0)
    p.add_argument("--qa-report", action="store_true",
                   help="write <out>/qa_report.html (the headless "
                        "review_filtered_clips replacement)")
    a = p.parse_args(argv)

    ids = list(a.ids)
    if a.video_ids:
        ids += [ln.strip() for ln in Path(a.video_ids).read_text().split()
                if ln.strip() and not ln.startswith("#")]
    if not ids:
        print("no video ids given")
        return 1
    logging.basicConfig(level=logging.INFO)
    result = build_dataset(ids, a.work, a.out, fps=a.fps,
                           min_shoulder_px=a.min_shoulder_px,
                           qa_report=a.qa_report)
    print(result)
    return 0 if result["videos"] else 1


def cmd_doctor(argv):
    """Install/device self-check: backend + device report, a tiny jitted
    hierarchy forward, and a mel-front-end check against the independent
    numpy oracle.  Exit 0 = this install can train and synthesize."""
    import time as _time

    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (skip TPU init)")
    a = p.parse_args(argv)

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    t0 = _time.perf_counter()
    try:
        devs = jax.devices()
    except Exception as e:  # noqa: BLE001
        print(f"FAIL: jax device init: {type(e).__name__}: {e}")
        return 1
    print(f"backend: {jax.default_backend()}  devices: {len(devs)} "
          f"({devs[0].device_kind if devs else '?'})  "
          f"init {_time.perf_counter() - t0:.1f}s")

    import jax.numpy as jnp
    from ha2g_tpu.ops.mel import log_mel_np, log_mel_spectrogram
    rng = np.random.default_rng(0)
    y = rng.normal(size=16000).astype(np.float32) * 0.1
    t0 = _time.perf_counter()
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(y)))
    err = float(np.abs(mel - log_mel_np(y)).max())
    print(f"mel front-end: {mel.shape}, max |dev - numpy oracle| = "
          f"{err:.2e} dB ({_time.perf_counter() - t0:.1f}s)")
    ok = err < 1e-2

    from ha2g_tpu.config import Config
    from ha2g_tpu.train.hierarchy import HierarchySystem
    from ha2g_tpu.data.synthetic import default_mean_dir_vec
    from ha2g_tpu.skeleton import TED_GESTURE
    cfg = Config(model="hierarchy", pose_dim=27, hidden_size=16, n_layers=1,
                 mean_dir_vec=list(map(float,
                                       default_mean_dir_vec(TED_GESTURE))))
    system = HierarchySystem(cfg, n_words=8, n_speakers=2)
    batch = _dummy_batch(cfg)
    t0 = _time.perf_counter()
    state = system.init(jax.random.PRNGKey(0), batch)
    new_state, metrics = system.make_train_step(gan_on=True)(
        state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    print(f"tiny hierarchy GAN step: loss {loss:.3f} "
          f"(compile+run {_time.perf_counter() - t0:.1f}s)")
    ok = ok and np.isfinite(loss)
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


def _enable_compilation_cache():
    """Persistent XLA compilation cache (machine-fingerprinted — see
    utils/jax_cache.py): the flagship train step takes minutes to compile
    on this host; caching makes repeat CLI invocations (smoke runs, eval,
    synthesis) start in seconds."""
    from ha2g_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()


def main():
    _enable_compilation_cache()
    cmds = {"train": cmd_train, "synthesize": cmd_synthesize,
            "from-text": cmd_from_text, "eval": cmd_eval,
            "import-lmdb": cmd_import_lmdb,
            "import-checkpoint": cmd_import_checkpoint,
            "import-evalnet": cmd_import_evalnet,
            "import-embeddings": cmd_import_embeddings,
            "make-librosa-goldens": cmd_make_librosa_goldens,
            "serve": cmd_serve,
            "parse-reference-log": cmd_parse_reference_log,
            "compare-trajectory": cmd_compare_trajectory,
            "export-checkpoint": cmd_export_checkpoint,
            "doctor": cmd_doctor,
            "motion-stats": cmd_motion_stats,
            "angle-stats": cmd_angle_stats,
            "build-dataset": cmd_build_dataset}
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        print(f"usage: python -m ha2g_tpu.cli {{{'|'.join(cmds)}}} ...")
        return 1
    return cmds[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    sys.exit(main())

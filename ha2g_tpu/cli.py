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


def _prepare(cfg):
    """Load clips, build vocabs, window into samples."""
    from ha2g_tpu.data.dataset import window_clips
    from ha2g_tpu.data.synthetic import default_mean_dir_vec
    from ha2g_tpu.data.vocab import Vocab, build_vocab

    train_clips = _load_split(cfg.train_data_path, cfg, 0)
    val_clips = _load_split(cfg.val_data_path, cfg, 1)

    lang = build_vocab("words", [train_clips, val_clips])
    if cfg.wordembed_path and Path(cfg.wordembed_path).exists():
        lang.load_word_vectors_npy(cfg.wordembed_path, cfg.wordembed_dim)
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
    if ev_cfg.pose_dim == 126:
        params, stats = state.params, state.batch_stats
    else:
        params, stats = state.params, state.batch_stats
    return EmbeddingSpaceEvaluator(ev_cfg.pose_dim, ev_cfg.n_poses, params,
                                   stats, latent_dim=ev_cfg.latent_dim)


def cmd_train(argv):
    from ha2g_tpu.config import parse_cli
    from ha2g_tpu.train.loop import Trainer
    from ha2g_tpu.utils import set_logger, set_random_seed

    cfg = parse_cli(argv)
    set_logger(cfg.model_save_path, cfg.name)
    if cfg.random_seed >= 0:
        set_random_seed(cfg.random_seed)
    logging.info(f"config: {cfg}")
    cfg, lang, speaker, train_s, val_s = _prepare(cfg)
    evaluator = _make_evaluator(cfg, lang)
    trainer = Trainer(cfg, train_s, val_s, lang, speaker, evaluator)
    state, history = trainer.fit()
    logging.info(f"best: {trainer.best_values}")
    return 0


def cmd_synthesize(argv):
    """from_db_clip / eval-style synthesis from a checkpoint."""
    import jax
    from ha2g_tpu import checkpoint as ckpt
    from ha2g_tpu.synthesis import HierarchySynthesizer
    from ha2g_tpu.train.loop import build_system

    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("--clips", default="synthetic")
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--out", default="synthesis_out.npz")
    a = p.parse_args(argv)

    cfg, _ = ckpt.load_config(a.checkpoint)
    lang, speaker = ckpt.load_vocabs(a.checkpoint)
    system = build_system(cfg, lang.n_words, max(speaker.n_words, 1),
                          lang.word_embedding_weights)
    clips = _load_split(a.clips, cfg, 2)[:a.n]

    import jax.numpy as jnp
    dummy = {"text": jnp.zeros((2, cfg.n_poses), jnp.int32),
             "spec": jnp.zeros((2, 128, 70)),
             "target": jnp.zeros((2, cfg.n_poses, cfg.pose_dim)),
             "vids": jnp.zeros((2,), jnp.int32)}
    template = system.init(jax.random.PRNGKey(0), dummy)
    state = ckpt.load_state(a.checkpoint, template)

    synth = HierarchySynthesizer(system, state)
    n_samples = min(len(c["audio_raw"]) for c in clips)
    audio = np.stack([np.asarray(c["audio_raw"][:n_samples], np.float32)
                      for c in clips])
    words = [c["words"] for c in clips]
    vids = np.asarray([speaker.get_word_index(c["vid"]) for c in clips],
                      np.int32)
    out = synth.generate(audio, words, lang, vids)
    np.savez(a.out, dir_vec=out, audio=audio)
    print(f"wrote {a.out}: {out.shape}")
    return 0


def cmd_import_lmdb(argv):
    from ha2g_tpu.data.lmdb_import import import_lmdb
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--limit", type=int, default=None)
    a = p.parse_args(argv)
    n = import_lmdb(a.src, a.dst, a.limit)
    print(f"imported {n} clips -> {a.dst}")
    return 0


def main():
    cmds = {"train": cmd_train, "synthesize": cmd_synthesize,
            "import-lmdb": cmd_import_lmdb}
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        print(f"usage: python -m ha2g_tpu.cli {{{'|'.join(cmds)}}} ...")
        return 1
    return cmds[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    sys.exit(main())

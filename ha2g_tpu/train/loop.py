"""Epoch-level training driver.

Rebuild of the reference drivers' train_epochs / evaluate_testset
(train.py:91-324, 326-508; train_expressive.py likewise), parameterized by
model family:

* eval-first each epoch, per-key best tracking with FGD as the
  model-selection metric when an evaluator is present (train.py:190-193)
* checkpoint best + every 10 epochs (train.py:227-243), including optimizer
  state (resume superset)
* GAN warm-up gating re-jits the step once when epoch crosses loss_warmup
* batches sharded over the data mesh; state replicated
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Optional

import numpy as np
import jax

from ha2g_tpu.checkpoint import save_checkpoint
from ha2g_tpu.config import Config
from ha2g_tpu.data.loader import BatchLoader
from ha2g_tpu.data.vocab import Vocab
from ha2g_tpu.eval.fgd import EmbeddingSpaceEvaluator
from ha2g_tpu.eval.metrics import beat_consistency, maje_and_accel
from ha2g_tpu.parallel.mesh import (batch_sharding, data_mesh, hybrid_mesh,
                                    replicate, shard_state_fsdp)
from ha2g_tpu.utils.average_meter import AverageMeter


def build_system(cfg: Config, n_words: int, n_speakers: int,
                 word_embeddings=None):
    """Dispatch like reference init_model (train.py:50-88)."""
    if cfg.model == "hierarchy":
        from ha2g_tpu.train.hierarchy import HierarchySystem
        return HierarchySystem(cfg, n_words, n_speakers, word_embeddings)
    if cfg.model == "multimodal_context":
        from ha2g_tpu.train.baselines import MultimodalGanSystem
        return MultimodalGanSystem(cfg, n_words, n_speakers, word_embeddings)
    if cfg.model in ("joint_embedding", "gesture_autoencoder"):
        from ha2g_tpu.train.baselines import EmbedSystem, MotionAESystem
        if cfg.model == "gesture_autoencoder" and cfg.pose_dim == 126:
            # TED Expressive FGD embedder (train_feature_extractor_expressive)
            return MotionAESystem(cfg)
        return EmbedSystem(cfg, n_words, word_embeddings)
    if cfg.model == "seq2seq":
        from ha2g_tpu.train.baselines import Seq2SeqSystem
        return Seq2SeqSystem(cfg, n_words, word_embeddings)
    if cfg.model == "speech2gesture":
        from ha2g_tpu.train.baselines import S2GSystem
        return S2GSystem(cfg)
    raise ValueError(f"unknown model {cfg.model}")


class Trainer:
    def __init__(self, cfg: Config, train_samples, val_samples, lang: Vocab,
                 speaker: Vocab, evaluator: Optional[EmbeddingSpaceEvaluator]
                 = None, use_mesh: bool = True,
                 beat_consistency_score: bool = False,
                 tensorboard: bool = False,
                 profile_dir: Optional[str] = None):
        self.cfg = cfg
        self.lang = lang
        self.speaker = speaker
        self.evaluator = evaluator
        self.bc_enabled = beat_consistency_score
        self.system = build_system(
            cfg, lang.n_words, max(speaker.n_words, 1),
            lang.word_embedding_weights)
        if not use_mesh:
            self.mesh = None
        elif cfg.fsdp_devices > 1:
            # hybrid DP x FSDP: batch shards over 'data', parameters +
            # optimizer state shard ZeRO-style over 'model' (gathered on
            # use / reduce-scattered on the gradient by GSPMD)
            n_data = cfg.dp_devices or \
                len(jax.devices()) // cfg.fsdp_devices
            self.mesh = hybrid_mesh(n_data, cfg.fsdp_devices)
        else:
            self.mesh = data_mesh(cfg.dp_devices)
        sharding = batch_sharding(self.mesh) if self.mesh else None
        # the train loader ships only the fields the system consumes —
        # the hierarchy model never reads the raw 16 kHz audio (~37 MB per
        # 256-batch) and shipping it dominated CLI step time over this
        # TPU's tunnel
        self.train_loader = BatchLoader(
            train_samples, cfg.batch_size, shuffle=True, sharding=sharding,
            keys=getattr(self.system, "batch_keys", None))
        # Drop the odd-sized remainder batch (as the reference's val loader
        # effectively does) so eval_step compiles exactly once per run; a
        # second batch shape costs a fresh XLA compile every epoch.  When the
        # val set is smaller than one batch there is only one shape anyway.
        self.val_loader = BatchLoader(
            val_samples, cfg.batch_size, shuffle=False,
            drop_last=len(val_samples) >= cfg.batch_size, sharding=None)
        self.rng = jax.random.PRNGKey(max(cfg.random_seed, 0))
        self.best_values: dict[str, tuple[float, int]] = {}
        self._steps: dict = {}
        self.profile_dir = profile_dir
        self.tb = None
        if tensorboard:
            # per-iteration train scalars + per-epoch val metrics, like the
            # reference SummaryWriter usage (train.py:98-99,181,301-303)
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(
                    log_dir=str(Path(cfg.model_save_path) / "tb"))
            except ImportError:
                logging.warning("tensorboard unavailable; scalars disabled")

    # ------------------------------------------------------------------
    def _train_step(self, epoch: int):
        cfg = self.cfg
        if cfg.model in ("hierarchy", "multimodal_context"):
            gan_on = epoch > cfg.loss_warmup
            key = ("gan", gan_on)
            if key not in self._steps:
                if cfg.model == "hierarchy":
                    # fit() rebinds state every iteration and eval/ckpt
                    # read it only between epochs, so the old state's
                    # buffers can be donated back to XLA (in-place param/
                    # opt updates instead of a second copy in HBM)
                    self._steps[key] = self.system.make_train_step(
                        gan_on=gan_on, donate=True)
                else:
                    self._steps[key] = self.system.make_train_step(
                        gan_on=gan_on)
            return self._steps[key]
        if "plain" not in self._steps:
            self._steps["plain"] = self.system.make_train_step()
        return self._steps["plain"]

    def _eval_step(self):
        if "eval" not in self._steps:
            self._steps["eval"] = self.system.make_eval_step()
        return self._steps["eval"]

    # ------------------------------------------------------------------
    def init_state(self):
        try:
            batch = next(iter(self.train_loader))
        except StopIteration:
            raise ValueError(
                f"training set ({len(self.train_loader.s)} windows) "
                f"is smaller than batch_size {self.cfg.batch_size}; reduce "
                "--batch_size or provide more data") from None
        state = self.system.init(self.rng, batch)
        return self._place_state(state)

    def _place_state(self, state):
        """Put the train state on the mesh: replicated under pure DP,
        FSDP-sharded over 'model' on a hybrid mesh."""
        if self.mesh is None:
            return state
        if "model" in self.mesh.axis_names:
            return shard_state_fsdp(state, self.mesh)
        return jax.device_put(state, replicate(self.mesh))

    # ------------------------------------------------------------------
    def evaluate(self, state, epoch: int = 0) -> dict:
        """evaluate_testset equivalent (train.py:326-508)."""
        cfg = self.cfg
        meters = {k: AverageMeter(k) for k in ("loss", "joint_mae", "accel",
                                               "bc")}
        if self.evaluator:
            self.evaluator.reset()
        eval_step = self._eval_step()
        mean_vec = cfg.mean_dir_vec_array
        rng = np.random.default_rng(epoch)
        t0 = time.time()
        for i, batch in enumerate(self.val_loader):
            b = dict(batch)
            if cfg.z_type == "speaker" and self.speaker.n_words > 0:
                # random speaker ids at eval (train.py:366)
                b["vids"] = rng.integers(0, self.speaker.n_words,
                                         b["vids"].shape).astype(np.int32)
            out, loss = eval_step(state, b,
                                  jax.random.fold_in(self.rng, 10_000 + i))
            B = b["target"].shape[0]
            meters["loss"].update(float(loss), B)
            if cfg.model != "gesture_autoencoder":
                out_np = np.asarray(out)
                tgt_np = np.asarray(b["target"])
                if self.evaluator:
                    self.evaluator.push_samples(out_np, tgt_np)
                mae, acc = maje_and_accel(out_np, tgt_np, mean_vec,
                                          cfg.skeleton, cfg.n_pre_poses)
                meters["joint_mae"].update(mae, B)
                meters["accel"].update(acc, B)
                if self.bc_enabled:
                    bc, n = beat_consistency(
                        out_np, np.asarray(b["audio"]), mean_vec,
                        cfg.skeleton, cfg.motion_resampling_framerate)
                    if n:
                        meters["bc"].update(bc, n)

        ret = {"loss": meters["loss"].avg, "joint_mae": meters["joint_mae"].avg,
               "accel": meters["accel"].avg}
        if self.bc_enabled:
            ret["BC"] = meters["bc"].avg
        if self.evaluator and self.evaluator.get_no_of_samples() > 0:
            frechet, feat_dist = self.evaluator.get_scores()
            ret["frechet"] = frechet
            ret["feat_dist"] = feat_dist
            ret["diversity"] = self.evaluator.get_diversity_scores()
        logging.info("[VAL] " + ", ".join(f"{k}: {v:.4f}"
                                          for k, v in ret.items()) +
                     f" / {time.time() - t0:.1f}s")
        return ret

    # ------------------------------------------------------------------
    def render_sample(self, state, epoch: int, save_path: Path,
                      n_samples: int = 1):
        """Render a val sample vs ground truth every N epochs
        (reference evaluate_sample_and_save_video, train.py:246-250,
        510-649)."""
        from ha2g_tpu.render import create_video_and_save
        batch = next(iter(self.val_loader))
        out, _ = self._eval_step()(state, batch,
                                   jax.random.fold_in(self.rng, 99_000))
        out = np.asarray(out)
        tgt = np.asarray(batch["target"])
        audio = np.asarray(batch["audio"])
        for i in range(min(n_samples, out.shape[0])):
            create_video_and_save(
                str(save_path / "videos"), epoch, "val", i, tgt[i], out[i],
                self.cfg.mean_dir_vec_array, f"epoch {epoch}",
                self.cfg.skeleton, audio=audio[i])

    def fit(self, epochs: Optional[int] = None, save_path: Optional[str]
            = None, eval_every: int = 1, log_every: int = 0,
            resume_from: Optional[str] = None, render_every: int = 0):
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        save_path = Path(save_path or cfg.model_save_path)
        state = self.init_state()
        start_epoch = 0
        if resume_from:
            # full-state resume incl. optimizer moments (capability the
            # reference lacks, SURVEY.md section 5.4)
            from ha2g_tpu.checkpoint import load_config, load_state
            state = load_state(resume_from, state)
            state = self._place_state(state)
            _, extra = load_config(resume_from)
            start_epoch = int(extra.get("epoch", -1)) + 1
            logging.info(f"resumed from {resume_from} at epoch {start_epoch}")
        history = []
        # persisted val-metric trajectory, consumed by
        # `cli compare-trajectory` (golden-trajectory harness vs the
        # reference training logs, eval/trajectory.py)
        history_path = save_path / "history.jsonl"
        save_path.mkdir(parents=True, exist_ok=True)
        if not resume_from and history_path.exists():
            # fresh run: a stale trajectory appended to would poison
            # compare-trajectory's best_of; resumed runs keep appending
            history_path.unlink()

        def _record(val_row: dict, epoch_no: int):
            row = {"epoch": epoch_no, **{k: float(v)
                                         for k, v in val_row.items()}}
            history.append(row)
            with open(history_path, "a") as f:
                import json
                f.write(json.dumps(row) + "\n")

        global_iter = 0
        for epoch in range(start_epoch, epochs):
            # eval first (train.py:190)
            if epoch % eval_every == 0:
                val = self.evaluate(state, epoch)
                _record(val, epoch)
                if self.tb is not None:
                    for k, v in val.items():
                        self.tb.add_scalar(f"val/{k}", v, epoch)
                self._track_best(val, epoch, state, save_path)
            if epoch % 10 == 0 and epoch > 0:
                save_checkpoint(save_path / f"checkpoint_{epoch:03d}", state,
                                cfg, self.lang, self.speaker,
                                extra={"epoch": epoch - 1})
            if render_every and epoch % render_every == 0 and \
                    cfg.model != "gesture_autoencoder" and \
                    cfg.save_result_video:
                try:
                    self.render_sample(state, epoch, save_path)
                except Exception as e:  # rendering must never kill training
                    logging.warning("sample render failed: %s", e)

            step_fn = self._train_step(epoch)
            meters: dict[str, AverageMeter] = {}
            t0, n_samples = time.time(), 0
            # metric scalars stay ON DEVICE between log points: every
            # synchronous host pull costs a host<->device round trip (~34 ms
            # over this TPU's tunnel), which would dominate the 100-300 ms
            # steps.  Accumulate a lazy device-side sum, materialize at log
            # points / epoch end.
            pending = {"sum": None, "n": 0}

            def _drain():
                if pending["sum"] is None:
                    return
                host = jax.device_get(pending["sum"])
                for k, v in host.items():
                    meters.setdefault(k, AverageMeter(k)).update(
                        float(v) / pending["n"], pending["n"])
                    if self.tb is not None:
                        self.tb.add_scalar(f"train/{k}",
                                           float(v) / pending["n"],
                                           global_iter)
                pending["sum"], pending["n"] = None, 0

            for batch in self.train_loader:
                if self.profile_dir is not None and global_iter == 3:
                    # trace a few warm steps (JAX profiler -> tensorboard/
                    # xprof); replaces the reference's wall-clock-only
                    # observability (SURVEY.md section 5.1)
                    jax.profiler.start_trace(self.profile_dir)
                rng = jax.random.fold_in(self.rng, global_iter)
                if cfg.model == "gesture_autoencoder" and \
                        cfg.pose_dim == 126:
                    state, metrics = step_fn(state, batch, rng,
                                             self.system.lr_for_epoch(epoch))
                else:
                    state, metrics = step_fn(state, batch, rng)
                global_iter += 1
                if self.profile_dir is not None and global_iter == 6:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), metrics)
                    jax.profiler.stop_trace()
                n_samples += cfg.batch_size
                if pending["sum"] is None:
                    pending["sum"] = metrics
                else:
                    pending["sum"] = jax.tree_util.tree_map(
                        lambda a, b: a + b, pending["sum"], metrics)
                pending["n"] += 1
                if log_every and global_iter % log_every == 0:
                    _drain()
                    sps = n_samples / max(time.time() - t0, 1e-6)
                    logging.info(
                        f"ep {epoch} it {global_iter}: " +
                        ", ".join(f"{k}: {m.avg:.4f}"
                                  for k, m in meters.items()) +
                        f", {sps:.1f} samples/s")
            _drain()
            logging.info(
                f"[TRAIN] epoch {epoch}: " +
                ", ".join(f"{k}: {m.avg:.4f}" for k, m in meters.items()) +
                f" ({n_samples / max(time.time() - t0, 1e-6):.1f} samples/s)")

        val = self.evaluate(state, epochs)
        _record(val, epochs)
        self._track_best(val, epochs, state, save_path)
        save_checkpoint(save_path / "checkpoint_final", state, cfg,
                        self.lang, self.speaker,
                        extra={"epoch": epochs - 1})
        return state, history

    # ------------------------------------------------------------------
    def _track_best(self, val: dict, epoch: int, state, save_path: Path):
        """Per-key best tracking; FGD (or loss) selects the best checkpoint
        (train.py:174-243)."""
        select_key = "frechet" if "frechet" in val else "loss"
        for k, v in val.items():
            if k not in self.best_values:
                better = True
            else:
                prev = self.best_values[k][0]
                better = v > prev if k == "diversity" else v < prev
            if better:
                self.best_values[k] = (v, epoch)
                if k == select_key:
                    save_checkpoint(save_path / "checkpoint_best", state,
                                    self.cfg, self.lang, self.speaker,
                                    extra={"epoch": epoch, "val": val})
                    logging.info(f"  [BEST] {k} = {v:.4f} @ epoch {epoch}")

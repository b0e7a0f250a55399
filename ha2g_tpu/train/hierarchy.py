"""HA2G hierarchy training system (the flagship trainer).

Rebuild of the reference iteration train_iter_hierarchy
(scripts/train_eval/train_hierarchy.py:71-293) and its 6-level expressive
twin (train_hierarchy_expressive.py:124-484), parameterized by SkeletonSpec.

Structure of one training step (one jitted function; pass donate=True to
make_train_step for buffer donation in long runs):

  1. D phase (epochs past loss_warmup, a STATIC flag -> two compiled
     variants, mirroring the reference's python gate at :93):
     run the frozen cascade, ns-GAN discriminator update with Adam(lr*0.2).
  2. G phase against the *updated* discriminator (reference order):
     audio encoder + standalone text encoder -> contrastive +/- losses;
     cascade over all levels -> per-level Huber; ns-GAN generator term;
     speaker KLD; diversity regularizer via a second cascade with permuted
     speaker ids; physical angle prior.  One Adam over the combined
     G-side tree == the reference's five per-module Adams (Adam is
     per-parameter, so the partition is immaterial).

The reference's optimizer layout, detach boundaries (train_hierarchy.py:126,
214-218), and BatchNorm update cadence (audio encoder once per iteration,
discriminator three times) are preserved; BN statistics are computed over the
global sharded batch (sync-BN) rather than DataParallel's per-replica stats.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax
import flax.linen as nn
import optax

from ha2g_tpu.config import Config
from ha2g_tpu.models.hierarchy import (ConvDiscriminator,
                                       HierarchicalPoseGenerator,
                                       HierarchicalWavEncoder)
from ha2g_tpu.models.tcn import TextEncoderTCN
from ha2g_tpu.ops.precision import precision, to_float32
from ha2g_tpu.skeleton import SkeletonSpec
from ha2g_tpu.train import losses
from ha2g_tpu.train.cascade import run_cascade


@flax.struct.dataclass
class HierarchyState:
    params: Any        # {'audio', 'text', 'gens': tuple, 'dis'}
    batch_stats: Any   # {'audio', 'dis'}
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


class HierarchySystem:
    """Owns module definitions + pure train/eval functions."""

    # fields the train step consumes (loader ships only these)
    batch_keys = ("text", "spec", "target", "vids")

    def __init__(self, cfg: Config, n_words: int, n_speakers: int,
                 word_embeddings=None):
        self.cfg = cfg
        self.spec: SkeletonSpec = cfg.skeleton
        L = self.spec.n_levels
        self.audio = HierarchicalWavEncoder(pose_level=L,
                                            n_speakers=n_speakers)
        self.text = TextEncoderTCN(
            n_words=n_words, embed_dim=cfg.wordembed_dim,
            hidden_size=cfg.hidden_size, n_layers=cfg.n_layers,
            dropout=cfg.dropout_prob, freeze=cfg.freeze_wordembed,
            embeddings=word_embeddings)
        self.gens = tuple(
            HierarchicalPoseGenerator(
                pose_dim=self.spec.level_dim(l), n_words=n_words,
                n_speakers=n_speakers, word_embed_dim=cfg.wordembed_dim,
                hidden_size=cfg.hidden_size, n_layers=cfg.n_layers,
                dropout=cfg.dropout_prob, z_type=cfg.z_type,
                input_context=cfg.input_context,
                freeze_wordembed=cfg.freeze_wordembed,
                word_embeddings=word_embeddings)
            for l in range(L))
        self.dis = ConvDiscriminator(slope=0.01)
        self.mean_dir_vec = jnp.asarray(cfg.mean_dir_vec_array)

        self.g_tx = optax.adam(cfg.learning_rate, b1=0.5, b2=0.999)
        self.d_tx = optax.adam(cfg.learning_rate *
                               cfg.discriminator_lr_weight, b1=0.5, b2=0.999)

    # ------------------------------------------------------------------
    def init(self, rng, batch) -> HierarchyState:
        """Jitted so module initialization compiles into one XLA program
        instead of dispatching thousands of eager init ops."""
        return jax.jit(self._init)(rng, batch)

    def _init(self, rng, batch) -> HierarchyState:
        spec = self.spec
        cfg = self.cfg
        ks = jax.random.split(rng, 8)
        rngs = lambda k: {"params": k, "dropout": jax.random.fold_in(k, 1),
                          "noise": jax.random.fold_in(k, 2)}
        av = self.audio.init(rngs(ks[0]), batch["spec"], batch["vids"])
        tv = self.text.init(rngs(ks[1]), batch["text"])
        gvs = []
        B, T = batch["text"].shape
        for l, g in enumerate(self.gens):
            dim = spec.level_dim(l)
            pre = jnp.zeros((B, T, dim + 1))
            gvs.append(g.init(rngs(ks[2 + l % 4]), pre, batch["text"],
                              jnp.zeros((B, T, 32)), batch["vids"]))
        dv = self.dis.init(rngs(ks[7]), batch["target"])

        params = {"audio": av["params"], "text": tv["params"],
                  "gens": tuple(v["params"] for v in gvs),
                  "dis": dv["params"]}
        batch_stats = {"audio": av["batch_stats"], "dis": dv["batch_stats"]}
        g_params = {k: params[k] for k in ("audio", "text", "gens")}
        return HierarchyState(
            params=params, batch_stats=batch_stats,
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(params["dis"]),
            step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def _gen_apply(self, gen_params, rng, train: bool):
        """Bound per-level generator closures for run_cascade."""
        def make(l):
            def apply(pre, text, audio_feat, vids):
                r = jax.random.fold_in(rng, l)
                return self.gens[l].apply(
                    {"params": gen_params[l]}, pre, text, audio_feat, vids,
                    train=train,
                    rngs={"dropout": r, "noise": jax.random.fold_in(r, 1)})
            return apply
        return [make(l) for l in range(self.spec.n_levels)]

    def _cascade(self, gen_params, blend, batch, rng, train, vids=None):
        """Level cascade on precomputed audio blend features; returns
        float32 (outs, targets, z, mu, logvar)."""
        vids = batch["vids"] if vids is None else vids
        gen_apply = self._gen_apply(gen_params, rng, train)
        outs, targets, z, mu, logvar = run_cascade(
            gen_apply, self.spec, batch["target"], batch["text"], blend,
            vids, self.cfg.n_pre_poses)
        # loss boundary: everything leaving the model is float32 even when
        # the compute dtype is bf16
        return to_float32((outs, targets, z, mu, logvar))

    def _forward_cascade(self, params, batch_stats, batch, rng, train,
                         vids=None, mutable_audio=False):
        """audio encoder + cascade (eval/synthesis path); returns (outs,
        targets, z, mu, logvar, (lo, mid, hi), new audio batch_stats)."""
        audio_vars = {"params": params["audio"],
                      "batch_stats": batch_stats["audio"]}
        if train:
            (res, new_av) = self.audio.apply(
                audio_vars, batch["spec"], batch["vids"], train=True,
                mutable=["batch_stats"])
            new_abs = new_av["batch_stats"] if mutable_audio \
                else batch_stats["audio"]
        else:
            res = self.audio.apply(audio_vars, batch["spec"], batch["vids"],
                                   train=False)
            new_abs = batch_stats["audio"]
        weight, lo, mid, hi, blend = res
        outs, targets, z, mu, logvar = self._cascade(
            params["gens"], blend, batch, rng, train, vids)
        return (outs, targets, z, mu, logvar,
                to_float32((lo, mid, hi)), new_abs)

    # ------------------------------------------------------------------
    def make_train_step(self, gan_on: bool, donate: bool = False):
        cfg = self.cfg
        spec = self.spec

        def train_step(state: HierarchyState, batch, rng):
            with precision(cfg.compute_dtype):
                # float32 on the way out keeps state/metrics dtype-stable
                return to_float32(
                    self._train_step_body(state, batch, rng, gan_on))

        return jax.jit(train_step,
                       donate_argnums=(0,) if donate else ())

    def _train_step_body(self, state: HierarchyState, batch, rng,
                         gan_on: bool):
            cfg = self.cfg
            spec = self.spec
            metrics = {}
            k_d, k_g, k_rand, k_perm, k_text = jax.random.split(rng, 5)

            # ONE audio-encoder forward per iteration, shared by the D
            # phase, the G cascade, the diversity cascade, and the
            # contrastive features — exactly the reference's dataflow
            # (train_hierarchy.py:78; its per-phase re-computations are
            # commented out at :96, :141, :191).  jax.vjp keeps the
            # backward available so the G update still trains the audio
            # encoder with one forward + one backward instead of the
            # 3 fwd + 2 bwd a naive per-phase re-run costs (~40% of the
            # round-1 step time).
            def audio_fwd(ap):
                res, new_av = self.audio.apply(
                    {"params": ap, "batch_stats": state.batch_stats["audio"]},
                    batch["spec"], batch["vids"], train=True,
                    mutable=["batch_stats"])
                _weight, lo, _mid, hi, blend = res
                return (lo, hi, blend), new_av["batch_stats"]

            audio_feats, audio_vjp, new_abs = jax.vjp(
                audio_fwd, state.params["audio"], has_aux=True)
            lo, hi, blend = audio_feats

            # ---------------- D phase ----------------
            d_params, d_opt, dis_bs = state.params["dis"], state.d_opt, \
                state.batch_stats["dis"]
            if gan_on and cfg.loss_gan_weight > 0.0:
                outs, _, _, _, _ = self._cascade(
                    state.params["gens"], jax.lax.stop_gradient(blend),
                    batch, k_d, train=True)
                fake = jax.lax.stop_gradient(outs[-1])

                def d_loss_fn(dp, bs):
                    dv = {"params": dp, "batch_stats": bs}
                    d_real, m1 = self.dis.apply(
                        dv, batch["target"], train=True,
                        mutable=["batch_stats"],
                        rngs={"dropout": jax.random.fold_in(k_d, 100)})
                    dv = {"params": dp, "batch_stats": m1["batch_stats"]}
                    d_fake, m2 = self.dis.apply(
                        dv, fake, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.fold_in(k_d, 101)})
                    return losses.nsgan_d_loss(to_float32(d_real),
                                               to_float32(d_fake)), \
                        m2["batch_stats"]

                (d_loss, dis_bs), d_grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True)(d_params, dis_bs)
                d_updates, d_opt = self.d_tx.update(d_grads, d_opt, d_params)
                d_params = optax.apply_updates(d_params, d_updates)
                metrics["dis"] = d_loss

            # ---------------- G phase (vs updated D) ----------------
            gt_params = {k: state.params[k] for k in ("text", "gens")}

            def g_loss_fn(gp, feats, dis_bs_in):
                lo, hi, blend = feats
                lo, hi = to_float32((lo, hi))
                outs, targets, z, mu, logvar = self._cascade(
                    gp["gens"], blend, batch, k_g, train=True)
                out = outs[-1]
                m = {}

                huber = sum(losses.scaled_huber(o, t)
                            for o, t in zip(outs, targets))
                # reference reports the summed multi-level huber
                # (train_hierarchy.py:276); its final-level `final_loss`
                # (:178) is computed but never logged
                m["loss"] = cfg.loss_regression_weight * huber

                # discriminator on generated output (stats update mirrors the
                # reference, which calls D in train mode during the G step)
                dv = {"params": d_params, "batch_stats": dis_bs_in}
                d_out, md = self.dis.apply(
                    dv, out, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.fold_in(k_g, 100)})
                gen_error = losses.nsgan_g_loss(to_float32(d_out))

                loss = cfg.loss_regression_weight * huber

                # contrastive: text vs high-level (+) and low-level (-)
                # (train_hierarchy.py:145-150)
                text_feat = to_float32(self.text.apply(
                    {"params": gp["text"]}, batch["text"],
                    deterministic=False, rngs={"dropout": k_text}))
                tf = text_feat.reshape(-1, text_feat.shape[-1])
                if cfg.loss_contrastive_pos_weight > 0.0:
                    c_pos = losses.softmax_contrastive(
                        tf, hi.reshape(-1, hi.shape[-1]))
                    loss += cfg.loss_contrastive_pos_weight * c_pos
                    m["c_pos"] = cfg.loss_contrastive_pos_weight * c_pos
                if cfg.loss_contrastive_neg_weight > 0.0:
                    c_neg = -losses.softmax_contrastive(
                        tf, lo.reshape(-1, lo.shape[-1]))
                    loss += cfg.loss_contrastive_neg_weight * c_neg
                    m["c_neg"] = cfg.loss_contrastive_neg_weight * c_neg

                # diversity regularizer + KLD (train_hierarchy.py:183-229)
                if cfg.z_type in ("speaker", "random") and \
                        cfg.loss_reg_weight > 0.0:
                    rand_vids = jax.random.permutation(k_perm, batch["vids"]) \
                        if cfg.z_type == "speaker" else batch["vids"]
                    # same shared blend, permuted speaker ids
                    # (train_hierarchy.py:185-199)
                    outs_r, _, z_rand, _, _ = self._cascade(
                        gp["gens"], blend, batch, k_rand, train=True,
                        vids=rand_vids)
                    div = losses.diversity_regularizer(
                        out, outs_r[-1], z, z_rand)
                    loss += cfg.loss_reg_weight * div
                    m["DIV_REG"] = cfg.loss_reg_weight * div
                    if cfg.z_type == "speaker":
                        kld = losses.speaker_kld(mu, logvar)
                        loss += cfg.loss_kld_weight * kld
                        m["KLD"] = cfg.loss_kld_weight * kld

                if gan_on:
                    loss += cfg.loss_gan_weight * gen_error
                    m["gen"] = cfg.loss_gan_weight * gen_error

                if cfg.loss_physical_weight > 0.0 and \
                        spec.angle_prior is not None:
                    phy = losses.physical_angle_prior(out, self.mean_dir_vec,
                                                      spec)
                    loss += cfg.loss_physical_weight * phy
                    m["phy"] = cfg.loss_physical_weight * phy

                return loss, (m, md["batch_stats"])

            (g_loss, (m, new_dbs)), (gt_grads, feat_cts) = \
                jax.value_and_grad(g_loss_fn, argnums=(0, 1), has_aux=True)(
                    gt_params, audio_feats, dis_bs)
            # pull the audio-encoder gradient through the shared forward
            (audio_grads,) = audio_vjp(feat_cts)
            g_grads = {"audio": audio_grads, **gt_grads}
            g_params = {"audio": state.params["audio"], **gt_params}
            g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt, g_params)
            g_params = optax.apply_updates(g_params, g_updates)
            metrics.update(m)

            new_state = HierarchyState(
                params={**g_params, "dis": d_params},
                batch_stats={"audio": new_abs, "dis": new_dbs},
                g_opt=g_opt, d_opt=d_opt, step=state.step + 1)
            return new_state, metrics

    # ------------------------------------------------------------------
    def make_eval_step(self):
        """Validation cascade (train.py:376-417): seeds pre-seq from target's
        first n_pre frames, eval-mode BN, no dropout/noise randomness in z?
        The reference keeps reparameterized z at eval (model.train(False)
        does not disable the explicit randn) — we keep an explicit rng."""

        def eval_step(state: HierarchyState, batch, rng):
            with precision(self.cfg.compute_dtype):
                outs, targets, z, mu, logvar, _, _ = self._forward_cascade(
                    state.params, state.batch_stats, batch, rng, train=False)
            out = outs[-1]
            l1 = jnp.mean(jnp.abs(out - batch["target"]))
            return out, l1

        return jax.jit(eval_step)

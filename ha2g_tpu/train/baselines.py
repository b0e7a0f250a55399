"""Training systems for the non-hierarchy model families.

Rebuilds of the reference per-iteration strategies:
* EmbedSystem      — gesture_autoencoder / joint_embedding
                     (train_joint_embed.py:5-62)
* MultimodalGanSystem — multimodal_context trimodal GAN (train_gan.py:13-103)
* Seq2SeqSystem    — seq2seq with the MSE+continuity+variance custom loss
                     (train_seq2seq.py:6-51, grad clip 5)
* S2GSystem        — speech2gesture LS-GAN on motion diffs
                     (train_speech2gesture.py:5-37)
* MotionAESystem   — TED Expressive FGD feature extractor
                     (train_feature_extractor_expressive.py:113-148,
                      StepLR 30/0.1)

Each system owns its modules and exposes jitted init / train_step / eval_step
functions with the same state-pytree pattern as HierarchySystem.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax
import optax

from ha2g_tpu.config import Config
from ha2g_tpu.models.embedding_net import EmbeddingNet
from ha2g_tpu.models.hierarchy import ConvDiscriminator
from ha2g_tpu.models.motion_ae import MotionAE
from ha2g_tpu.models.multimodal_context import PoseGenerator
from ha2g_tpu.models.seq2seq import Seq2SeqNet
from ha2g_tpu.models import speech2gesture as s2g
from ha2g_tpu.ops.precision import precision, to_float32
from ha2g_tpu.train import losses



def _in_precision(cfg, fn):
    """Trace `fn` under the config's compute dtype (ops/precision.py);
    model outputs are cast back to float32 at the loss/metric boundary
    by the leaf blocks' float32 params + the systems' loss math."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with precision(getattr(cfg, "compute_dtype", None)):
            # float32 on the way out keeps state/metrics dtype-stable
            # across steps regardless of the compute dtype
            return to_float32(fn(*args, **kwargs))
    return wrapped

@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt: Any
    step: jnp.ndarray


@flax.struct.dataclass
class GanState:
    params: Any       # {'gen', 'dis'}
    batch_stats: Any  # {'gen', 'dis'}
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


def _rngs(k):
    return {"params": k, "dropout": jax.random.fold_in(k, 1),
            "noise": jax.random.fold_in(k, 2)}


# ---------------------------------------------------------------------------
class EmbedSystem:
    """gesture_autoencoder (mode='pose') and joint_embedding (mode='random')."""

    def __init__(self, cfg: Config, n_words: int = 0, word_embeddings=None):
        self.cfg = cfg
        self.mode = "pose" if cfg.model == "gesture_autoencoder" else "random"
        # pose mode (_net_args) never touches text/audio — don't ship the
        # ~37 MB/256-batch raw audio to a model that ignores it
        self.batch_keys = ("target", "vids") if self.mode == "pose" \
            else ("text", "audio", "target", "vids")
        self.net = EmbeddingNet(pose_dim=cfg.pose_dim, n_frames=cfg.n_poses,
                                mode=self.mode, n_words=n_words,
                                word_embed_dim=cfg.wordembed_dim,
                                word_embeddings=word_embeddings)
        self.tx = optax.adam(cfg.learning_rate, b1=0.5, b2=0.999)

    def init(self, rng, batch) -> TrainState:
        def go(rng):
            args = self._net_args(batch)
            v = self.net.init(_rngs(rng), *args)
            return TrainState(params=v["params"],
                              batch_stats=v.get("batch_stats", {}),
                              opt=self.tx.init(v["params"]),
                              step=jnp.zeros((), jnp.int32))
        return jax.jit(go)(rng)

    def _net_args(self, batch):
        pre = batch["target"][:, :self.cfg.n_pre_poses]
        if self.mode == "pose":
            return (None, None, pre, batch["target"])
        return (batch["text"], batch["audio"], pre, batch["target"])

    def make_train_step(self):
        def step(state: TrainState, batch, rng):
            def loss_fn(params):
                args = self._net_args(batch)
                (out, updates) = self.net.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    *args, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng,
                          "noise": jax.random.fold_in(rng, 1)})
                *_, recon = out
                # per-sample mean, then SUM over batch (train_joint_embed.py:27)
                target = batch["target"]
                per = jnp.mean(jnp.abs(recon - target), axis=(1, 2))
                if self.cfg.embed_pose_diff_loss:
                    # the H36M feature-extractor trainer's extra term
                    # (train_feature_extractor.py:68-71)
                    per += jnp.mean(jnp.abs(
                        (recon[:, 1:] - recon[:, :-1]) -
                        (target[:, 1:] - target[:, :-1])), axis=(1, 2))
                recon_loss = jnp.sum(per)
                return recon_loss, updates["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt = self.tx.update(grads, state.opt, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, new_bs, opt, state.step + 1), \
                {"loss": loss}
        return jax.jit(_in_precision(self.cfg, step))

    def make_eval_step(self):
        def step(state: TrainState, batch, rng):
            args = self._net_args(batch)
            out = self.net.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                *args, train=False,
                rngs={"dropout": rng, "noise": jax.random.fold_in(rng, 1)})
            *_, recon = out
            loss = jnp.mean(jnp.abs(recon - batch["target"]))
            return recon, loss
        return jax.jit(_in_precision(self.cfg, step))


# ---------------------------------------------------------------------------
class MultimodalGanSystem:
    """multimodal_context GAN (train_gan.py)."""

    batch_keys = ('text', 'audio', 'target', 'vids')

    def __init__(self, cfg: Config, n_words: int, n_speakers: int,
                 word_embeddings=None):
        self.cfg = cfg
        self.gen = PoseGenerator(
            pose_dim=cfg.pose_dim, n_words=n_words, n_speakers=n_speakers,
            word_embed_dim=cfg.wordembed_dim, hidden_size=cfg.hidden_size,
            n_layers=cfg.n_layers, dropout=cfg.dropout_prob,
            z_type=cfg.z_type, input_context=cfg.input_context,
            freeze_wordembed=cfg.freeze_wordembed,
            word_embeddings=word_embeddings)
        # multimodal variant uses the identity-slope conv discriminator
        # (multimodal_context_net.py:213-221 LeakyReLU(True))
        self.dis = ConvDiscriminator(slope=1.0)
        self.g_tx = optax.adam(cfg.learning_rate, b1=0.5, b2=0.999)
        self.d_tx = optax.adam(cfg.learning_rate *
                               cfg.discriminator_lr_weight, b1=0.5, b2=0.999)

    def _pre_seq(self, target):
        n_pre = self.cfg.n_pre_poses
        B, T, D = target.shape
        ps = jnp.zeros((B, T, D + 1), target.dtype)
        ps = ps.at[:, :n_pre, :D].set(target[:, :n_pre])
        ps = ps.at[:, :n_pre, D].set(1.0)
        return ps

    def init(self, rng, batch) -> GanState:
        def go(rng):
            k1, k2 = jax.random.split(rng)
            pre = self._pre_seq(batch["target"])
            gv = self.gen.init(_rngs(k1), pre, batch["text"], batch["audio"],
                               batch["vids"])
            dv = self.dis.init(_rngs(k2), batch["target"])
            return GanState(
                params={"gen": gv["params"], "dis": dv["params"]},
                batch_stats={"gen": gv["batch_stats"],
                             "dis": dv["batch_stats"]},
                g_opt=self.g_tx.init(gv["params"]),
                d_opt=self.d_tx.init(dv["params"]),
                step=jnp.zeros((), jnp.int32))
        return jax.jit(go)(rng)

    def _gen_fwd(self, params, bs, batch, rng, vids, mutable):
        """Train-mode generator forward; BN stat updates are discarded for
        auxiliary forwards (mutable=False) so running stats advance once per
        iteration like the reference."""
        pre = self._pre_seq(batch["target"])
        variables = {"params": params, "batch_stats": bs}
        rngs = {"dropout": rng, "noise": jax.random.fold_in(rng, 1)}
        (res, upd) = self.gen.apply(variables, pre, batch["text"],
                                    batch["audio"], vids, train=True,
                                    mutable=["batch_stats"], rngs=rngs)
        return res, (upd["batch_stats"] if mutable else bs)

    def make_train_step(self, gan_on: bool):
        cfg = self.cfg

        def step(state: GanState, batch, rng):
            k_d, k_g, k_rand, k_perm = jax.random.split(rng, 4)
            metrics = {}
            d_params, d_opt = state.params["dis"], state.d_opt
            dis_bs = state.batch_stats["dis"]

            if gan_on and cfg.loss_gan_weight > 0.0:
                res, _ = self._gen_fwd(state.params["gen"],
                                       state.batch_stats["gen"], batch,
                                       k_d, batch["vids"], False)
                fake = jax.lax.stop_gradient(res[0])

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
                    return losses.nsgan_d_loss(d_real, d_fake), \
                        m2["batch_stats"]

                (d_loss, dis_bs), d_grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True)(d_params, dis_bs)
                d_up, d_opt = self.d_tx.update(d_grads, d_opt, d_params)
                d_params = optax.apply_updates(d_params, d_up)
                metrics["dis"] = d_loss

            def g_loss_fn(gp, dis_bs_in):
                (out, z, mu, logvar), new_gbs = self._gen_fwd(
                    gp, state.batch_stats["gen"], batch, k_g,
                    batch["vids"], True)
                m = {}
                huber = losses.scaled_huber(out, batch["target"])
                loss = cfg.loss_regression_weight * huber
                m["loss"] = cfg.loss_regression_weight * huber

                dv = {"params": d_params, "batch_stats": dis_bs_in}
                d_out, md = self.dis.apply(
                    dv, out, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.fold_in(k_g, 100)})
                gen_error = losses.nsgan_g_loss(d_out)

                if cfg.z_type in ("speaker", "random") and \
                        cfg.loss_reg_weight > 0.0:
                    rand_vids = jax.random.permutation(
                        k_perm, batch["vids"]) if cfg.z_type == "speaker" \
                        else batch["vids"]
                    (out_r, z_r, _, _), _ = self._gen_fwd(
                        gp, state.batch_stats["gen"], batch, k_rand,
                        rand_vids, False)
                    div = losses.diversity_regularizer(out, out_r, z, z_r)
                    loss += cfg.loss_reg_weight * div
                    m["DIV_REG"] = cfg.loss_reg_weight * div
                    if cfg.z_type == "speaker":
                        kld = losses.speaker_kld(mu, logvar)
                        loss += cfg.loss_kld_weight * kld
                        m["KLD"] = cfg.loss_kld_weight * kld
                if gan_on:
                    loss += cfg.loss_gan_weight * gen_error
                    m["gen"] = cfg.loss_gan_weight * gen_error
                return loss, (m, new_gbs, md["batch_stats"])

            (_, (m, new_gbs, new_dbs)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.params["gen"], dis_bs)
            g_up, g_opt = self.g_tx.update(g_grads, state.g_opt,
                                           state.params["gen"])
            g_params = optax.apply_updates(state.params["gen"], g_up)
            metrics.update(m)
            return GanState(params={"gen": g_params, "dis": d_params},
                            batch_stats={"gen": new_gbs, "dis": new_dbs},
                            g_opt=g_opt, d_opt=d_opt,
                            step=state.step + 1), metrics
        return jax.jit(_in_precision(self.cfg, step))

    def make_eval_step(self):
        def step(state: GanState, batch, rng):
            pre = self._pre_seq(batch["target"])
            out, *_ = self.gen.apply(
                {"params": state.params["gen"],
                 "batch_stats": state.batch_stats["gen"]},
                pre, batch["text"], batch["audio"], batch["vids"],
                train=False,
                rngs={"dropout": rng, "noise": jax.random.fold_in(rng, 1)})
            return out, jnp.mean(jnp.abs(out - batch["target"]))
        return jax.jit(_in_precision(self.cfg, step))


# ---------------------------------------------------------------------------
class Seq2SeqSystem:
    batch_keys = ("word_seq", "word_lengths", "target", "vids")

    def __init__(self, cfg: Config, n_words: int, word_embeddings=None):
        self.cfg = cfg
        self.net = Seq2SeqNet(pose_dim=cfg.pose_dim, n_frames=cfg.n_poses,
                              n_words=n_words,
                              word_embed_dim=cfg.wordembed_dim,
                              hidden_size=cfg.hidden_size,
                              n_layers=cfg.n_layers,
                              dropout=cfg.dropout_prob,
                              n_pre_poses=cfg.n_pre_poses,
                              word_embeddings=word_embeddings)
        self.tx = optax.chain(optax.clip_by_global_norm(5.0),
                              optax.adam(cfg.learning_rate))

    def init(self, rng, batch) -> TrainState:
        def go(rng):
            v = self.net.init(_rngs(rng), batch["word_seq"],
                              batch["word_lengths"], batch["target"],
                              batch["vids"])
            return TrainState(params=v["params"],
                              batch_stats=v.get("batch_stats", {}),
                              opt=self.tx.init(v["params"]),
                              step=jnp.zeros((), jnp.int32))
        return jax.jit(go)(rng)

    def _custom_loss(self, output, target):
        """MSE + continuity + variance bonus (train_seq2seq.py:6-33)."""
        cfg = self.cfg
        n_el = output.size
        mse = jnp.mean((output - target) ** 2) * cfg.loss_regression_weight
        cont = jnp.sum(jnp.abs(output[:, 1:] - output[:, :-1])) / n_el * \
            cfg.loss_kld_weight
        var = -jnp.sum(jnp.linalg.norm(output, axis=1)) / n_el * \
            cfg.loss_reg_weight
        return mse + cont + var

    def make_train_step(self):
        def step(state: TrainState, batch, rng):
            def loss_fn(params):
                out, upd = self.net.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["word_seq"], batch["word_lengths"],
                    batch["target"], batch["vids"], train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": rng})
                return self._custom_loss(out, batch["target"]), \
                    upd["batch_stats"]
            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            up, opt = self.tx.update(grads, state.opt, state.params)
            params = optax.apply_updates(state.params, up)
            return TrainState(params, new_bs, opt, state.step + 1), \
                {"loss": loss}
        return jax.jit(_in_precision(self.cfg, step))

    def make_eval_step(self):
        def step(state: TrainState, batch, rng):
            out = self.net.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["word_seq"], batch["word_lengths"], batch["target"],
                batch["vids"], train=False, rngs={"dropout": rng})
            return out, jnp.mean(jnp.abs(out - batch["target"]))
        return jax.jit(_in_precision(self.cfg, step))


# ---------------------------------------------------------------------------
class S2GSystem:
    """speech2gesture LS-GAN (train_speech2gesture.py)."""

    batch_keys = ('spec', 'target', 'vids')

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.gen = s2g.Generator(n_poses=cfg.n_poses, pose_dim=cfg.pose_dim,
                                 n_pre_poses=cfg.n_pre_poses)
        self.dis = s2g.Discriminator()
        self.g_tx = optax.adam(cfg.learning_rate, b1=0.5, b2=0.999)
        self.d_tx = optax.adam(cfg.learning_rate *
                               cfg.discriminator_lr_weight, b1=0.5, b2=0.999)

    def init(self, rng, batch) -> GanState:
        def go(rng):
            k1, k2 = jax.random.split(rng)
            pre = batch["target"][:, :self.cfg.n_pre_poses]
            gv = self.gen.init(_rngs(k1), batch["spec"], pre)
            motion = batch["target"][:, 1:] - batch["target"][:, :-1]
            dv = self.dis.init(_rngs(k2), motion)
            return GanState(
                params={"gen": gv["params"], "dis": dv["params"]},
                batch_stats={"gen": gv["batch_stats"],
                             "dis": dv["batch_stats"]},
                g_opt=self.g_tx.init(gv["params"]),
                d_opt=self.d_tx.init(dv["params"]),
                step=jnp.zeros((), jnp.int32))
        return jax.jit(go)(rng)

    def make_train_step(self):
        cfg = self.cfg

        def step(state: GanState, batch, rng):
            pre = batch["target"][:, :cfg.n_pre_poses]
            target_motion = batch["target"][:, 1:] - batch["target"][:, :-1]

            # D phase (every iteration; no warmup in the reference)
            def fwd(gp, gbs, mutable):
                variables = {"params": gp, "batch_stats": gbs}
                out, upd = self.gen.apply(variables, batch["spec"], pre,
                                          train=True,
                                          mutable=["batch_stats"])
                return out, (upd["batch_stats"] if mutable else gbs)

            fake_poses, _ = fwd(state.params["gen"],
                                state.batch_stats["gen"], False)
            fake_motion = jax.lax.stop_gradient(
                fake_poses[:, 1:] - fake_poses[:, :-1])

            def d_loss_fn(dp, bs):
                dv = {"params": dp, "batch_stats": bs}
                d_real, m1 = self.dis.apply(dv, target_motion, train=True,
                                            mutable=["batch_stats"])
                dv = {"params": dp, "batch_stats": m1["batch_stats"]}
                d_fake, m2 = self.dis.apply(dv, fake_motion, train=True,
                                            mutable=["batch_stats"])
                loss = jnp.mean((1.0 - d_real) ** 2) + jnp.mean(d_fake ** 2)
                return loss, m2["batch_stats"]

            (d_loss, dis_bs), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.params["dis"],
                                         state.batch_stats["dis"])
            d_up, d_opt = self.d_tx.update(d_grads, state.d_opt,
                                           state.params["dis"])
            d_params = optax.apply_updates(state.params["dis"], d_up)

            def g_loss_fn(gp, dbs):
                out, new_gbs = fwd(gp, state.batch_stats["gen"], True)
                out_motion = out[:, 1:] - out[:, :-1]
                l1 = jnp.mean(jnp.abs(out - batch["target"]))
                dv = {"params": d_params, "batch_stats": dbs}
                d_out, md = self.dis.apply(dv, out_motion, train=True,
                                           mutable=["batch_stats"])
                gen_error = jnp.mean((1.0 - d_out) ** 2)
                loss = cfg.loss_regression_weight * l1 + \
                    cfg.loss_gan_weight * gen_error
                return loss, (l1, gen_error, new_gbs, md["batch_stats"])

            (_, (l1, gen_error, new_gbs, new_dbs)), g_grads = \
                jax.value_and_grad(g_loss_fn, has_aux=True)(
                    state.params["gen"], dis_bs)
            g_up, g_opt = self.g_tx.update(g_grads, state.g_opt,
                                           state.params["gen"])
            g_params = optax.apply_updates(state.params["gen"], g_up)

            metrics = {"loss": cfg.loss_regression_weight * l1,
                       "gen": cfg.loss_gan_weight * gen_error,
                       "dis": d_loss}
            return GanState(params={"gen": g_params, "dis": d_params},
                            batch_stats={"gen": new_gbs, "dis": new_dbs},
                            g_opt=g_opt, d_opt=d_opt,
                            step=state.step + 1), metrics
        return jax.jit(_in_precision(self.cfg, step))

    def make_eval_step(self):
        def step(state: GanState, batch, rng):
            pre = batch["target"][:, :self.cfg.n_pre_poses]
            out = self.gen.apply(
                {"params": state.params["gen"],
                 "batch_stats": state.batch_stats["gen"]},
                batch["spec"], pre, train=False)
            return out, jnp.mean(jnp.abs(out - batch["target"]))
        return jax.jit(_in_precision(self.cfg, step))


# ---------------------------------------------------------------------------
class MotionAESystem:
    """TED Expressive FGD embedder trainer
    (train_feature_extractor_expressive.py)."""

    batch_keys = ('target', 'vids')

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.net = MotionAE(pose_dim=cfg.pose_dim, latent_dim=cfg.latent_dim)
        # StepLR(step_size=30, gamma=0.1) on Adam (:103); the lr for the
        # current epoch is passed into the jitted step via hyperparams
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.learning_rate)

    def lr_for_epoch(self, epoch: int) -> float:
        return self.cfg.learning_rate * (0.1 ** (epoch // 30))

    def init(self, rng, batch) -> TrainState:
        def go(rng):
            v = self.net.init(_rngs(rng), batch["target"])
            return TrainState(params=v["params"],
                              batch_stats=v.get("batch_stats", {}),
                              opt=self.tx.init(v["params"]),
                              step=jnp.zeros((), jnp.int32))
        return jax.jit(go)(rng)

    def make_train_step(self):
        cfg = self.cfg

        def step(state: TrainState, batch, rng, lr):
            target = batch["target"]

            def loss_fn(params):
                (recon, z), upd = self.net.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    target, train=True, mutable=["batch_stats"])
                l1 = jnp.sum(jnp.mean(jnp.abs(recon - target), axis=(1, 2)))
                t_diff = target[:, 1:] - target[:, :-1]
                r_diff = recon[:, 1:] - recon[:, :-1]
                l1 += jnp.sum(jnp.mean(jnp.abs(r_diff - t_diff), axis=(1, 2)))
                rr = recon.reshape(recon.shape[0], recon.shape[1], -1, 3)
                tt = target.reshape(target.shape[0], target.shape[1], -1, 3)
                # torch.cosine_similarity semantics: dot / max(|a||b|, eps)
                cos = 1.0 - (jnp.sum(rr * tt, -1) /
                             jnp.maximum(jnp.linalg.norm(rr, axis=-1) *
                                         jnp.linalg.norm(tt, axis=-1), 1e-8))
                # plain SUM over (B, T, bones) like the reference
                # (train_feature_extractor_expressive.py:141-143) — no
                # normalization; cos_loss_weight (0.001) is tuned for this
                # scale
                cos_loss = jnp.sum(cos) * cfg.cos_loss_weight
                return l1 + cos_loss, (l1, upd["batch_stats"])

            (loss, (l1, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            opt_state = state.opt
            opt_state.hyperparams["learning_rate"] = lr
            up, opt = self.tx.update(grads, opt_state, state.params)
            params = optax.apply_updates(state.params, up)
            return TrainState(params, new_bs, opt, state.step + 1), \
                {"loss": loss, "l1": l1}
        return jax.jit(_in_precision(self.cfg, step))

    def make_eval_step(self):
        def step(state: TrainState, batch, rng):
            recon, z = self.net.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["target"], train=False)
            return recon, jnp.mean(jnp.abs(recon - batch["target"]))
        return jax.jit(_in_precision(self.cfg, step))

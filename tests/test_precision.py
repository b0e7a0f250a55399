"""compute_dtype threading (ops/precision.py): leaf blocks follow the
context, params stay float32, systems stay dtype-stable, bf16 training
tracks fp32."""

import jax
import jax.numpy as jnp
import numpy as np

from ha2g_tpu.config import Config
from ha2g_tpu.models.common import BatchNorm, Conv1d, Dense
from ha2g_tpu.ops.gru import GRU
from ha2g_tpu.ops.precision import compute_dtype, precision, to_float32


def test_context_default_and_reset():
    assert compute_dtype() == jnp.float32
    with precision("bfloat16"):
        assert compute_dtype() == jnp.dtype(jnp.bfloat16)
        with precision(None):  # None = float32
            assert compute_dtype() == jnp.float32
        assert compute_dtype() == jnp.dtype(jnp.bfloat16)
    assert compute_dtype() == jnp.float32


def test_leaf_blocks_follow_context_params_stay_fp32():
    x = jnp.ones((2, 6, 8))
    for mod, args in ((Dense(4), (x,)), (Conv1d(4, 3), (x,)),
                      (GRU(hidden_size=4), (x,))):
        with precision("bfloat16"):
            v = mod.init(jax.random.PRNGKey(0), *args)
            out = mod.apply(v, *args)
        out0 = out[0] if isinstance(out, tuple) else out
        assert out0.dtype == jnp.bfloat16, type(mod)
        assert all(p.dtype == jnp.float32
                   for p in jax.tree_util.tree_leaves(v["params"])), type(mod)
        # explicit dtype field still wins over the context
        out_fp = mod.apply(v, *args)
        out_fp0 = out_fp[0] if isinstance(out_fp, tuple) else out_fp
        assert out_fp0.dtype == jnp.float32


def test_batchnorm_normalizes_in_fp32():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)),
                    jnp.float32)
    m = BatchNorm(use_running_average=False)
    v = m.init(jax.random.PRNGKey(0), x)
    with precision("bfloat16"):
        out, mut = m.apply(v, x, mutable=["batch_stats"])
    assert out.dtype == jnp.bfloat16
    # running stats stay fp32
    assert all(s.dtype == jnp.float32
               for s in jax.tree_util.tree_leaves(mut["batch_stats"]))


def test_to_float32_casts_inexact_only():
    tree = {"a": jnp.ones((2,), jnp.bfloat16), "i": jnp.ones((2,), jnp.int32)}
    out = to_float32(tree)
    assert out["a"].dtype == jnp.float32 and out["i"].dtype == jnp.int32


def test_bf16_hierarchy_step_tracks_fp32():
    """One train step in each dtype from identical init: finite metrics,
    close losses, float32 state both ways."""
    rng = np.random.default_rng(0)
    B, T = 4, 34
    batch = {"text": jnp.asarray(rng.integers(0, 10, (B, T)), jnp.int32),
             "spec": jnp.asarray(rng.normal(size=(B, 128, 70)), jnp.float32),
             "audio": jnp.zeros((B, 36267), jnp.float32),
             "target": jnp.asarray(rng.normal(size=(B, T, 27)) * 0.1,
                                   jnp.float32),
             "vids": jnp.zeros((B,), jnp.int32)}
    results = {}
    states = {}
    from ha2g_tpu.train.hierarchy import HierarchySystem
    for dt in ("float32", "bfloat16"):
        cfg = Config(model="hierarchy", hidden_size=16, n_layers=2,
                     batch_size=B, compute_dtype=dt)
        s = HierarchySystem(cfg, n_words=12, n_speakers=3)
        st = s.init(jax.random.PRNGKey(0), batch)
        step = s.make_train_step(gan_on=True)
        st, m = step(st, batch, jax.random.PRNGKey(1))
        results[dt] = {k: float(v) for k, v in m.items()}
        states[dt] = st
        assert all(np.isfinite(v) for v in results[dt].values()), dt
        assert all(p.dtype == jnp.float32 for p in
                   jax.tree_util.tree_leaves((st.params, st.batch_stats))), dt
    for k in results["float32"]:
        a, b = results["float32"][k], results["bfloat16"][k]
        assert abs(a - b) <= 0.05 * max(abs(a), abs(b), 1.0), (k, a, b)


def test_bf16_trajectory_tracks_fp32():
    """bf16 trajectory-drift guard (VERDICT r4 item 3): TWELVE consecutive
    flagship-shaped iterations spanning the GAN warm-up boundary (steps
    0-5 warm-up, 6-11 adversarial) in bfloat16 vs float32 from IDENTICAL
    init, driven by the same batch stream and PRNG keys.  The flagship
    config trains in bf16 (configs/hierarchy.yaml); this bounds how far a
    bf16 run may drift from the fp32 reference dynamics over a real
    multi-step trajectory, and fails on regression.

    Per-step drift budget: relative metric error at step i must stay
    within min(base * (i + 1), cap), with budgets set at ~3-4x the drift
    measured on this seed (printed at the end of the run):
    * core terms (loss, KLD, c_pos, c_neg, dis, gen): base 2e-2, cap 0.35;
    * phy (FK angle prior; acos near clamp edges amplifies drift) and
      DIV_REG (ratio of near-cancelling L1 differences): base 8e-2,
      cap 0.8.
    bf16 keeps ~3 significant decimal digits per op, so per-step rounding
    is O(4e-3) and compounds through the parameters; these budgets catch a
    broken cast (wrong accumulation dtype, double-rounded loss, f16-range
    overflow) while tolerating honest bf16 noise.

    End of run: FGD + mean feature distance through ONE shared frozen
    fp32 EmbeddingNet embedder over a held-out stream must agree between
    the bf16-trained and fp32-trained populations."""
    import jax
    from ha2g_tpu.train.hierarchy import HierarchySystem

    B, T, N_WORDS, N_SPK = 8, 34, 12, 3
    N_STEPS, WARMUP = 12, 6

    def stream_batch(seed):
        rng = np.random.default_rng(seed)
        return {"text": jnp.asarray(rng.integers(0, N_WORDS, (B, T)),
                                    jnp.int32),
                "spec": jnp.asarray(rng.normal(size=(B, 128, 70)),
                                    jnp.float32),
                "target": jnp.asarray(
                    rng.normal(size=(B, T, 27)).astype(np.float32) * 0.2),
                "vids": jnp.asarray(rng.integers(0, N_SPK, (B,)),
                                    jnp.int32)}

    systems, states, steps = {}, {}, {}
    for dt in ("float32", "bfloat16"):
        cfg = Config(model="hierarchy", hidden_size=16, n_layers=2,
                     batch_size=B, z_type="speaker", compute_dtype=dt,
                     loss_gan_weight=5.0, loss_kld_weight=0.1,
                     loss_reg_weight=0.05, loss_physical_weight=0.01)
        s = HierarchySystem(cfg, n_words=N_WORDS, n_speakers=N_SPK)
        systems[dt] = s
        states[dt] = s.init(jax.random.PRNGKey(0), stream_batch(0))
        steps[dt] = {g: s.make_train_step(gan_on=g) for g in (False, True)}
    # identical starting point: params are float32 under both policies
    states["bfloat16"] = states["bfloat16"].replace(
        params=states["float32"].params,
        batch_stats=states["float32"].batch_stats)

    BUDGET = {"phy": (8e-2, 0.8), "DIV_REG": (8e-2, 0.8)}
    CORE = (2e-2, 0.35)
    worst = {}
    for i in range(N_STEPS):
        gan_on = i >= WARMUP
        batch = stream_batch(100 + i)
        rng = jax.random.PRNGKey(42 + i)
        out = {}
        for dt in ("float32", "bfloat16"):
            states[dt], m = steps[dt][gan_on](states[dt], batch, rng)
            out[dt] = {k: float(v) for k, v in m.items()}
        for k, want in out["float32"].items():
            got = out["bfloat16"][k]
            assert np.isfinite(got), (i, k, got)
            err = abs(got - want) / max(abs(want), 1e-3)
            base, cap = BUDGET.get(k, CORE)
            budget = min(base * (i + 1), cap)
            worst[k] = max(worst.get(k, 0.0), err)
            assert err <= budget, \
                f"step {i} ({'gan' if gan_on else 'warmup'}): {k} bf16 " \
                f"drift {err:.2e} > budget {budget:.2e} " \
                f"(bf16 {got}, f32 {want})"

    # params stay fp32 in both trajectories
    for dt in ("float32", "bfloat16"):
        assert all(p.dtype == jnp.float32 for p in
                   jax.tree_util.tree_leaves(states[dt].params)), dt

    # end-of-trajectory FGD through one shared frozen fp32 embedder
    from ha2g_tpu.eval.fgd import EmbeddingSpaceEvaluator
    from ha2g_tpu.models.embedding_net import EmbeddingNet
    emb = EmbeddingNet(pose_dim=27, n_frames=T, mode="pose")
    ev_vars = emb.init(
        {"params": jax.random.PRNGKey(77), "noise": jax.random.PRNGKey(78)},
        None, None, None, np.zeros((2, T, 27), np.float32))
    evaluator = EmbeddingSpaceEvaluator(27, T, ev_vars["params"],
                                        ev_vars["batch_stats"])
    eval_batches = [stream_batch(900 + j) for j in range(4)]
    scores = {}
    for dt in ("float32", "bfloat16"):
        ev_step = systems[dt].make_eval_step()
        evaluator.reset()
        for j, b in enumerate(eval_batches):
            o, _ = ev_step(states[dt], b, jax.random.PRNGKey(500 + j))
            evaluator.push_samples(np.asarray(o, np.float32),
                                   np.asarray(b["target"]))
        scores[dt] = evaluator.get_scores()
    fd_f, feat_f = scores["float32"]
    fd_b, feat_b = scores["bfloat16"]
    # both populations went through 12 updates of the same dynamics; the
    # absolute floors cover the random-embedder regime where both scores
    # sit near zero
    assert abs(fd_b - fd_f) <= max(0.25 * abs(fd_f), 5e-2), (fd_f, fd_b)
    assert abs(feat_b - feat_f) <= max(0.25 * abs(feat_f), 5e-2), \
        (feat_f, feat_b)
    print("[bf16-trajectory] worst per-key drift: "
          + ", ".join(f"{k}={v:.2e}" for k, v in sorted(worst.items()))
          + f"; FGD f32 {fd_f:.4f} vs bf16 {fd_b:.4f}, "
            f"feat {feat_f:.4f} vs {feat_b:.4f}")

"""Sliding-window gesture synthesis engine.

Rebuild of the reference generators (synthesize.py:36-209 for the baseline
models, synthesize_hierarchy.py:36-215 and the 6-level expressive variant
for HA2G): long audio is processed in n_poses-frame windows with stride
n_poses - n_pre_poses; each window is seeded with the last n_pre predicted
frames of the previous window, and overlapping frames are linearly
cross-faded on the host.  Post-processing ports: cubic polyfit smoothing
for seq2seq and the quadratic fade-to-mean tail.

TPU-first design:
* The per-window step is ONE jitted function; windows within a clip are
  sequentially dependent (the pre-seq carry), but the engine synthesizes a
  BATCH of independent clips simultaneously — the throughput axis the
  per-clip reference loop never exploits.
* The mel front-end runs once per clip on-device (ops/mel.py) instead of
  librosa on host.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ha2g_tpu.config import Config
from ha2g_tpu.data.dataset import spectrogram_length_for
from ha2g_tpu.data.vocab import EOS_TOKEN, SOS_TOKEN, Vocab
from ha2g_tpu.ops.mel import (batched_log_mel, batched_log_mel_i16,
                              batched_log_mel_mulaw, log_mel_spectrogram)
from ha2g_tpu.skeleton import SkeletonSpec
from ha2g_tpu.train.cascade import run_cascade

SR = 16000


def _mel_any(audio: np.ndarray):
    """Batched device mel for float32 audio, int16 PCM, or uint8 mu-law.
    The compact formats shrink the host->device upload (the dominant cost
    of batch synthesis over this TPU's tunnel: int16 halves it, mu-law
    quarters it); dequantization happens on device.

    Read .dtype directly — np.asarray on an already-on-device (possibly
    sharded) array would pull the whole batch back to host just to probe
    its dtype."""
    dt = audio.dtype if hasattr(audio, "dtype") else np.asarray(audio).dtype
    if dt == np.int16:
        return batched_log_mel_i16(jnp.asarray(audio))
    if dt == np.uint8:
        return batched_log_mel_mulaw(jnp.asarray(audio))
    return batched_log_mel(jnp.asarray(audio))


def _window_layout(cfg: Config, clip_seconds: float):
    unit_time = cfg.n_poses / cfg.motion_resampling_framerate
    stride_time = (cfg.n_poses - cfg.n_pre_poses) / \
        cfg.motion_resampling_framerate
    if clip_seconds < unit_time:
        num = 1
    else:
        num = math.ceil((clip_seconds - unit_time) / stride_time) + 1
    return unit_time, stride_time, num


def frame_aligned_word_indices(words, start_time, end_time, n_frames,
                               lang: Vocab) -> np.ndarray:
    """synthesize_hierarchy.py:100-113."""
    ext = np.zeros(n_frames, dtype=np.int32)
    frame_duration = (end_time - start_time) / n_frames
    for w in words:
        if w[1] < start_time or w[1] > end_time:
            continue
        idx = max(0, int(np.floor((w[1] - start_time) / frame_duration)))
        if idx < n_frames:
            ext[idx] = lang.get_word_index(w[0])
    return ext


def word_seq_indices(words, start_time, end_time, lang: Vocab,
                     max_words: int = 32) -> np.ndarray:
    """SOS..EOS token sequence for one window (synthesize_hierarchy.py:
    102-111)."""
    seq = [SOS_TOKEN]
    for w in words:
        if start_time <= w[1] <= end_time:
            seq.append(lang.get_word_index(w[0]))
    seq.append(EOS_TOKEN)
    return np.asarray(seq[:max_words], np.int32)


class SlidingWindowSynthesizer:
    """Shared window loop: subclasses implement `window_step`."""

    uses_spec = True
    uses_audio = False
    uses_word_seq = False

    def __init__(self, system, state):
        self.system = system
        self.cfg: Config = system.cfg
        self.spec: SkeletonSpec = self.cfg.skeleton
        self.state = state

        def step(state, inputs, rng):
            # synthesis honors the config's compute dtype (ops/precision.py);
            # outputs leave as float32
            from ha2g_tpu.ops.precision import precision, to_float32
            with precision(self.cfg.compute_dtype):
                return to_float32(self.window_step(state, inputs, rng))

        self._step = jax.jit(step)

    # subclass API ---------------------------------------------------------
    def window_step(self, state, inputs: dict, rng) -> jnp.ndarray:
        """inputs: spec_w (B, 128, S), audio_w (B, n), text_w (B, T),
        word_seq (B, W) + lengths, carry (B, n_pre, pose_dim), vids (B,)
        -> (B, T, pose_dim)."""
        raise NotImplementedError

    # ----------------------------------------------------------------------
    def generate(self, audio: np.ndarray, words_per_clip: Sequence,
                 lang: Vocab, vids: np.ndarray,
                 rng: Optional[jax.Array] = None,
                 fade_out: bool = False) -> np.ndarray:
        """audio (B, n_samples); words_per_clip: list of B word lists;
        vids (B,) -> (B, total_frames, pose_dim)."""
        cfg = self.cfg
        audio = np.asarray(audio)
        if self.uses_audio and audio.dtype in (np.int16, np.uint8):
            # raw-waveform models consume float audio; the compact-PCM
            # fast paths only help spectrogram models (decoded on device)
            from ha2g_tpu.ops.mel import pcm_to_float_np
            audio = pcm_to_float_np(audio)
        B, n_samples = audio.shape
        clip_seconds = n_samples / SR
        unit_time, stride_time, num_sub = _window_layout(cfg, clip_seconds)
        spec_len = spectrogram_length_for(cfg.n_poses,
                                          cfg.motion_resampling_framerate)
        audio_len = int(unit_time * SR)
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        full_spec = None
        if self.uses_spec:
            full_spec = np.asarray(_mel_any(audio))
        end_padding = 0.0

        out_list: list[np.ndarray] = []
        carry = np.zeros((B, cfg.n_pre_poses, self.spec.pose_dim), np.float32)
        vids_j = jnp.asarray(vids)
        for i in range(num_sub):
            start_time = i * stride_time
            end_time = start_time + unit_time
            inputs = {"carry": jnp.asarray(carry), "vids": vids_j}

            if self.uses_spec:
                S_total = full_spec.shape[2]
                s0 = math.floor(start_time / clip_seconds * S_total)
                s1 = s0 + spec_len
                if s1 > S_total:
                    spec_w = np.pad(full_spec,
                                    ((0, 0), (0, 0), (0, s1 - S_total)),
                                    mode="edge")[:, :, s0:s1]
                else:
                    spec_w = full_spec[:, :, s0:s1]
                inputs["spec_w"] = jnp.asarray(spec_w)

            if self.uses_audio:
                a0 = math.floor(start_time / clip_seconds * n_samples)
                a1 = a0 + audio_len
                aw = audio[:, a0:a1]
                if aw.shape[1] < audio_len:
                    if i == num_sub - 1:
                        end_padding = (audio_len - aw.shape[1]) / SR
                    aw = np.pad(aw, ((0, 0), (0, audio_len - aw.shape[1])))
                inputs["audio_w"] = jnp.asarray(aw)

            inputs["text_w"] = jnp.asarray(np.stack([
                frame_aligned_word_indices(w, start_time, end_time,
                                           cfg.n_poses, lang)
                for w in words_per_clip]))

            if self.uses_word_seq:
                seqs = [word_seq_indices(w, start_time, end_time, lang)
                        for w in words_per_clip]
                mw = 32  # fixed width keeps the jitted step's shapes static
                padded = np.zeros((B, mw), np.int32)
                for bi, s in enumerate(seqs):
                    padded[bi, :len(s)] = s
                inputs["word_seq"] = jnp.asarray(padded)
                inputs["word_lengths"] = jnp.asarray(
                    [len(s) for s in seqs], np.int32)

            out = np.asarray(self._step(self.state, inputs,
                                        jax.random.fold_in(rng, i)))
            carry = out[:, -cfg.n_pre_poses:]

            if out_list:
                # linear cross-fade over the n_pre overlap
                # (synthesize_hierarchy.py:153-162)
                last = out_list[-1][:, -cfg.n_pre_poses:]
                out_list[-1] = out_list[-1][:, :-cfg.n_pre_poses]
                n = cfg.n_pre_poses
                j = np.arange(n).reshape(1, n, 1)
                blend = last * (n - j) / (n + 1) + \
                    out[:, :n] * (j + 1) / (n + 1)
                out = np.concatenate([blend, out[:, n:]], axis=1)
            out_list.append(out)

        result = np.concatenate(out_list, axis=1)
        if self.cfg.model == "seq2seq":
            result = np.stack([polyfit_smooth(r, cfg) for r in result])
        if fade_out:
            result = np.stack([fade_out_to_mean(r, cfg, end_padding)
                               for r in result])
        return result

    def stream(self, lang: Vocab, vid: int,
               total_seconds: Optional[float] = None,
               rng: Optional[jax.Array] = None,
               db_ref: Optional[float] = None,
               executor=None) -> "GestureStream":
        """Open an incremental (live) synthesis stream — see GestureStream.
        Spectrogram-windowed models only (hierarchy, speech2gesture)."""
        return GestureStream(self, lang, vid, total_seconds=total_seconds,
                             rng=rng, db_ref=db_ref, executor=executor)


class HierarchySynthesizer(SlidingWindowSynthesizer):
    """Per-window audio encoder + full level cascade
    (synthesize_hierarchy.py:127-146).

    Besides the generic host window loop, this synthesizer has a FUSED path
    (`generate_fused`): the whole sliding-window loop — per-window
    spectrogram slicing, cascade, pre-seq carry, and overlap cross-fade —
    runs as ONE jitted `lax.scan` on device.  On this TPU every
    device->host pull costs a ~34 ms tunnel round trip, so the host loop
    pays that per window; the fused path pays it once per clip batch.
    Inside the fused graph only the level cascade (which consumes the
    pre-seq carry) stays in the sequential scan; the SE-ResNet audio
    encoder is carry-independent and runs once, batched over all windows.
    """

    uses_spec = True

    def __init__(self, system, state):
        super().__init__(system, state)

        def fused(*args, num_sub, spec_len):
            from ha2g_tpu.ops.precision import precision, to_float32
            with precision(self.cfg.compute_dtype):
                return to_float32(self._fused_scan(
                    *args, num_sub=num_sub, spec_len=spec_len))

        self._fused_step = jax.jit(fused,
                                   static_argnames=("num_sub", "spec_len"))

    def window_step(self, state, inputs, rng):
        audio_vars = {"params": state.params["audio"],
                      "batch_stats": state.batch_stats["audio"]}
        _, _, _, _, blend = self.system.audio.apply(
            audio_vars, inputs["spec_w"], inputs["vids"], train=False)
        return self._cascade_step(state, inputs["text_w"], blend,
                                  inputs["carry"], inputs["vids"], rng)

    def _cascade_step(self, state, text_w, blend_w, carry, vids, rng):
        """Level cascade on precomputed blend features for one window."""
        cfg = self.cfg
        B = text_w.shape[0]
        target = jnp.zeros((B, cfg.n_poses, self.spec.pose_dim))
        target = target.at[:, :cfg.n_pre_poses].set(carry)
        gen_apply = self.system._gen_apply(state.params["gens"], rng,
                                           train=False)
        outs, _, _, _, _ = run_cascade(gen_apply, self.spec, target,
                                       text_w, blend_w, vids,
                                       cfg.n_pre_poses)
        return outs[-1]

    # ---- fused on-device loop --------------------------------------------
    def _fused_scan(self, state, full_spec, text_all, s0_all, vids, rng,
                    num_sub: int, spec_len: int):
        """full_spec (B, 128, S_padded); text_all (W, B, T); s0_all (W,)
        -> (B, total_frames, pose_dim) with cross-fade applied."""
        cfg = self.cfg
        B = full_spec.shape[0]
        n = cfg.n_pre_poses
        T = cfg.n_poses

        # The SE-ResNet audio encoder does not depend on the pre-seq carry,
        # so it is hoisted OUT of the sequential window scan: every window's
        # spectrogram is sliced up front, windows fold into the batch axis,
        # and the encoder runs once at W-fold batch.  This removes the
        # deepest conv stack from the scan's sequential critical path and
        # lets the MXU see one large conv batch instead of W small ones.
        def slice_w(s0):
            return jax.lax.dynamic_slice(
                full_spec, (0, 0, s0), (B, full_spec.shape[1], spec_len))

        spec_all = jax.vmap(slice_w)(s0_all)        # (W, B, 128, spec_len)
        audio_vars = {"params": state.params["audio"],
                      "batch_stats": state.batch_stats["audio"]}
        vids_rep = jnp.broadcast_to(vids[None], (num_sub, B)).reshape(-1)
        _, _, _, _, blend = self.system.audio.apply(
            audio_vars, spec_all.reshape(num_sub * B, *spec_all.shape[2:]),
            vids_rep, train=False)                  # (L, W*B, T, 32)
        L, C = blend.shape[0], blend.shape[-1]
        blend_all = jnp.moveaxis(
            blend.reshape(L, num_sub, B, T, C), 0, 1)  # (W, L, B, T, C)

        def step(carry, xs):
            tail, w = carry
            text_w, blend_w = xs
            out = self._cascade_step(state, text_w, blend_w, tail, vids,
                                     jax.random.fold_in(rng, w))
            new_tail = out[:, -n:]
            # overlap cross-fade (synthesize_hierarchy.py:153-162); the
            # first window keeps its head (tail starts as zeros but w==0
            # selects the unblended head)
            j = jnp.arange(n).reshape(1, n, 1)
            blend = tail * (n - j) / (n + 1) + out[:, :n] * (j + 1) / (n + 1)
            head = jnp.where(w > 0, blend, out[:, :n])
            out = jnp.concatenate([head, out[:, n:]], axis=1)
            return (new_tail, w + 1), out

        from ha2g_tpu.ops.precision import resolve
        init_tail = jnp.zeros((B, n, self.spec.pose_dim),
                              dtype=resolve(None))
        (_, _), ys = jax.lax.scan(step, (init_tail, jnp.int32(0)),
                                  (text_all, blend_all), length=num_sub)
        # windows 0..W-2 contribute their first T-n frames; the last all T
        body = ys[:-1, :, :T - n]                       # (W-1, B, T-n, D)
        body = jnp.moveaxis(body, 0, 1).reshape(B, -1, ys.shape[-1])
        return jnp.concatenate([body, ys[-1]], axis=1)

    def prepare_fused(self, words_per_clip, lang: Vocab, vids: np.ndarray,
                      n_samples: int,
                      rng: Optional[jax.Array] = None) -> dict:
        """Host-side preparation for the fused loop: window layout, the
        per-window frame-aligned word-index tensor, and spectrogram slice
        offsets.  Depends only on transcripts + clip length — NOT the audio
        samples — so callers synthesizing many audio takes of one script
        (and benchmarks) do it once and reuse the plan."""
        cfg = self.cfg
        clip_seconds = n_samples / SR
        unit_time, stride_time, num_sub = _window_layout(cfg, clip_seconds)
        spec_len = spectrogram_length_for(cfg.n_poses,
                                          cfg.motion_resampling_framerate)
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        # spectrogram frame count the mel front-end will produce (ops/mel.py:
        # hop 512, center-padded): needed for slice offsets before the audio
        # is seen
        S_total = n_samples // 512 + 1
        s0_all = np.asarray(
            [math.floor(i * stride_time / clip_seconds * S_total)
             for i in range(num_sub)], np.int32)
        text_all = np.stack([
            np.stack([frame_aligned_word_indices(
                w, i * stride_time, i * stride_time + unit_time,
                cfg.n_poses, lang) for w in words_per_clip])
            for i in range(num_sub)])  # (W, B, T)
        return {"text_all": jnp.asarray(text_all),
                "s0_all": jnp.asarray(s0_all),
                "vids": jnp.asarray(vids), "rng": rng,
                "num_sub": num_sub, "spec_len": spec_len,
                "S_total": S_total,
                "pad_to": int(s0_all.max()) + spec_len}

    def run_fused(self, audio: np.ndarray, plan: dict,
                  chunk: int = 0, out_dtype=None, mesh=None) -> np.ndarray:
        """Device portion of the fused loop: mel front-end, window scan,
        cross-fade, and the device->host pull.  `plan` from prepare_fused.

        The whole path is tunnel-bandwidth-bound on this TPU (~40 MB/s
        measured on incompressible data, vs 0.24 s of device compute for
        256 x 20 s clips), so the knobs below all shrink or overlap
        transfers:

        * compact input: pass int16 PCM (half of float32) or uint8 mu-law
          (a quarter) — decoded on device by the mel front-end.
        * chunk > 0 splits the clip batch into chunks and dispatches them
          asynchronously: jax queues each chunk's upload + compute without
          blocking, so chunk i+1's host->device transfer overlaps chunk
          i's compute and chunk i's device->host pull.
        * out_dtype=np.float16 casts the pose output on device and halves
          the device->host pull; the host result is upcast back to
          float32.  Dir-vec components are O(0.1-1), so the f16 rounding
          error (~5e-4 relative) is far below the codec/model noise floor.
        * mesh: a jax.sharding.Mesh with a 'data' axis — the clip batch
          shards over it (params replicated), so an N-chip pod synthesizes
          N x the clips per call with XLA/GSPMD partitioning the whole
          fused scan.  Partitionable threefry keeps the random draws equal
          to the single-device run (asserted in tests/test_parallel.py).
          Batch (and chunk, if used) must divide the mesh size.

        Caveat: the speaker-z reparameterization eps is drawn per batch,
        so chunking changes the draw exactly like synthesizing the clips
        in smaller batches would (the reference's randn_like behaves the
        same); with z_type='speaker' and a trained (finite-logvar) model
        the std is tiny, and with z pinned at mu results are bit-equal
        (tests/test_synthesis.py::test_fused_chunked_matches_unchunked)."""
        B = audio.shape[0]

        def cast(o):
            return o.astype(jnp.float16) if out_dtype == np.float16 else o

        if chunk <= 0 or chunk >= B:
            out = np.asarray(cast(self._run_fused_one(audio, plan, 0, B,
                                                      mesh)))
            return out.astype(np.float32) if out.dtype != np.float32 else out
        outs = []
        for i in range(0, B, chunk):
            n = min(chunk, B - i)
            outs.append(cast(self._run_fused_one(audio[i:i + n], plan, i, n,
                                                 mesh)))
        # pull in dispatch order; later chunks keep computing meanwhile
        return np.concatenate([np.asarray(o) for o in outs],
                              axis=0).astype(np.float32)

    def _run_fused_one(self, audio, plan, i, n, mesh=None):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            audio = jax.device_put(jnp.asarray(audio),
                                   NamedSharding(mesh, P("data")))
        full_spec = _mel_any(audio)
        assert full_spec.shape[2] == plan["S_total"], \
            (full_spec.shape, plan["S_total"])
        if plan["pad_to"] > plan["S_total"]:
            full_spec = jnp.pad(
                full_spec,
                ((0, 0), (0, 0), (0, plan["pad_to"] - plan["S_total"])),
                mode="edge")
        text = plan["text_all"][:, i:i + n]
        vids = plan["vids"][i:i + n]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            text = jax.device_put(text, NamedSharding(mesh, P(None, "data")))
            vids = jax.device_put(vids, NamedSharding(mesh, P("data")))
        return self._fused_step(self.state, full_spec, text,
                                plan["s0_all"], vids, plan["rng"],
                                num_sub=plan["num_sub"],
                                spec_len=plan["spec_len"])

    def generate_fused(self, audio: np.ndarray, words_per_clip, lang: Vocab,
                       vids: np.ndarray,
                       rng: Optional[jax.Array] = None) -> np.ndarray:
        """One-device-call variant of generate() (identical windowing and
        cross-fade math)."""
        B, n_samples = np.asarray(audio).shape
        plan = self.prepare_fused(words_per_clip, lang, vids, n_samples, rng)
        return self.run_fused(audio, plan)


class MultimodalSynthesizer(SlidingWindowSynthesizer):
    """Trimodal-context generator per window (synthesize.py:106-119)."""

    uses_spec = False
    uses_audio = True

    def window_step(self, state, inputs, rng):
        cfg = self.cfg
        B = inputs["text_w"].shape[0]
        pre_seq = jnp.zeros((B, cfg.n_poses, self.spec.pose_dim + 1))
        pre_seq = pre_seq.at[:, :cfg.n_pre_poses, :-1].set(inputs["carry"])
        pre_seq = pre_seq.at[:, :cfg.n_pre_poses, -1].set(1.0)
        out, *_ = self.system.gen.apply(
            {"params": state.params["gen"],
             "batch_stats": state.batch_stats["gen"]},
            pre_seq, inputs["text_w"], inputs["audio_w"], inputs["vids"],
            train=False,
            rngs={"dropout": rng, "noise": jax.random.fold_in(rng, 1)})
        return out


class S2GSynthesizer(SlidingWindowSynthesizer):
    """speech2gesture generator per window (synthesize.py:100-105)."""

    uses_spec = True

    def window_step(self, state, inputs, rng):
        return self.system.gen.apply(
            {"params": state.params["gen"],
             "batch_stats": state.batch_stats["gen"]},
            inputs["spec_w"], inputs["carry"], train=False)


class Seq2SeqSynthesizer(SlidingWindowSynthesizer):
    """seq2seq per window: word tokens -> gestures, teacher-seeded with the
    carry (synthesize.py:92-99)."""

    uses_spec = False
    uses_word_seq = True

    def window_step(self, state, inputs, rng):
        cfg = self.cfg
        B = inputs["text_w"].shape[0]
        poses = jnp.zeros((B, cfg.n_poses, self.spec.pose_dim))
        poses = poses.at[:, :cfg.n_pre_poses].set(inputs["carry"])
        return self.system.net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            inputs["word_seq"], inputs["word_lengths"], poses,
            inputs["vids"], train=False, rngs={"dropout": rng})


class EmbedSynthesizer(SlidingWindowSynthesizer):
    """joint_embedding: decode from the speech latent (synthesize.py mode
    'speech'; eval_embed in train_joint_embed.py:54-62)."""

    uses_spec = False
    uses_audio = True

    def window_step(self, state, inputs, rng):
        cfg = self.cfg
        B = inputs["text_w"].shape[0]
        pre = inputs["carry"]
        out = self.system.net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            inputs["text_w"], inputs["audio_w"], pre, None,
            input_mode="speech", train=False,
            rngs={"dropout": rng, "noise": jax.random.fold_in(rng, 1)})
        return out[-1]


def make_synthesizer(system, state, low_latency: bool = False):
    """Dispatch on the system's config.

    low_latency=True (hierarchy only) swaps the cascade generators for
    Pallas-fused-GRU twins (ops/pallas_gru.py) — the recurrence runs as
    one kernel with weights resident in VMEM, which wins at the B<=8
    batch sizes of interactive synthesis; checkpoints are unchanged."""
    model = system.cfg.model
    if model == "hierarchy":
        if low_latency:
            import copy
            system = copy.copy(system)
            system.gens = tuple(g.clone(use_pallas_gru=True)
                                for g in system.gens)
        return HierarchySynthesizer(system, state)
    if model == "multimodal_context":
        return MultimodalSynthesizer(system, state)
    if model == "speech2gesture":
        return S2GSynthesizer(system, state)
    if model == "seq2seq":
        return Seq2SeqSynthesizer(system, state)
    if model == "joint_embedding":
        return EmbedSynthesizer(system, state)
    raise ValueError(f"no synthesizer for model {model}")


class GestureStream:
    """Incremental (live) gesture synthesis over ONE audio stream.

    The sliding-window engine is causal — window i consumes the
    spectrogram slice [s0_i, s0_i + spec_len) and the pre-seq carry from
    window i-1 — so gestures can be generated WHILE audio arrives,
    one window (n_poses frames = ~2.27 s) behind the live edge.  The
    reference's synthesize loops (synthesize_hierarchy.py:36-215) are
    batch-only; this is a serving superset for live avatars / telephony.

        stream = synth.stream(lang, vid=3)            # HierarchySynthesizer
        for chunk, new_words in audio_source:         # any chunk sizes
            frames = stream.feed(chunk, words=new_words)
            ...render frames...                        # (n_new, pose_dim)
        frames = stream.finish()

    Semantics vs the batch path (``generate()``), both exact by design:

    * window layout: with ``total_seconds`` given (file playback, TTS — the
      duration is known up front) the batch formula is used and the output
      is numerically IDENTICAL to ``generate()`` once the dB-reference
      condition below holds.  With it unknown (live), window i starts at
      the sample-exact spec frame ``(i * stride_samples) // hop`` — within
      one 32 ms spec frame of the batch layout's clip-relative rounding.
    * mel frames: interior spectrogram frames see only real samples, so
      they are computed incrementally from hop-aligned segments
      (ops/mel.py::log_mel_abs(center=False)) and equal the full-clip
      transform's frames bit-for-bit; the first and last frame (start/end
      reflect padding) are produced by the centered transform on the
      buffered prefix / full buffer.
    * dB reference: librosa's ``power_to_db(ref=np.max)`` references the
      WHOLE clip's peak mel energy — unknowable live.  The stream applies
      the RUNNING peak over fully-arrived frames; from the moment the
      clip's loudest frame has arrived, features match the batch path
      exactly.  (Speech clips hit their peak early in practice; a caller
      with a calibrated deployment can pre-seed ``db_ref``.)
    * words may arrive incrementally (live ASR); a window consumes the
      words known when it runs, and it becomes runnable one spec frame
      (~32 ms) BEFORE its nominal end time — so deliver a word no later
      than the audio ~32 ms before its onset.  Transcript-first feeding
      (the TTS case) trivially satisfies this.

    Emission: window 0 yields its first ``n_poses - n_pre_poses`` frames;
    each later window first re-emits the previous window's held-back
    ``n_pre_poses`` tail cross-faded with its own head (the batch path's
    blend), then its middle frames; ``finish()`` flushes the final tail.
    """

    def __init__(self, synth: "SlidingWindowSynthesizer", lang: Vocab,
                 vid: int, total_seconds: Optional[float] = None,
                 rng: Optional[jax.Array] = None,
                 db_ref: Optional[float] = None,
                 executor=None):
        """executor: optional ``(inputs, rng) -> (1, n_poses, pose_dim)``
        override for the window device call — serve.py routes concurrent
        streams' windows through a shared batching executor so k live
        streams cost one device call per window instead of k."""
        from ha2g_tpu.ops.mel import HOP, N_FFT, log_mel_abs
        assert synth.uses_spec and not synth.uses_audio, \
            "streaming drives spectrogram-windowed models"
        self.synth = synth
        self.cfg = synth.cfg
        self.lang = lang
        self.vid = int(vid)
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._hop, self._nfft = HOP, N_FFT
        self._log_mel_abs = log_mel_abs
        cfg = self.cfg
        self.unit_time = cfg.n_poses / cfg.motion_resampling_framerate
        self.stride_time = (cfg.n_poses - cfg.n_pre_poses) / \
            cfg.motion_resampling_framerate
        self.spec_len = spectrogram_length_for(
            cfg.n_poses, cfg.motion_resampling_framerate)
        self.total_seconds = total_seconds
        if total_seconds is not None:
            n_total = int(round(total_seconds * SR))
            self._S_total = n_total // self._hop + 1
            _, _, self._num_sub = _window_layout(cfg, n_total / SR)
        self._executor = executor
        self._buf = np.zeros(0, np.float32)
        self._words: list = []
        self._frames = np.zeros((128, 0), np.float32)  # absolute log-mel
        self._ref = -np.inf if db_ref is None else float(db_ref)
        self._next_w = 0
        self._carry = np.zeros((1, cfg.n_pre_poses, synth.spec.pose_dim),
                               np.float32)
        self._tail: Optional[np.ndarray] = None
        self._finished = False

    # ------------------------------------------------------------------
    def _s0(self, i: int) -> int:
        if self.total_seconds is not None:
            return math.floor(i * self.stride_time / self.total_seconds
                              * self._S_total)
        return (i * int(round(self.stride_time * SR))) // self._hop

    def _extend_frames(self, final: bool) -> None:
        """Grow the cached absolute log-mel frames from the buffer.

        TPU shape discipline: a naive "centered transform over the prefix"
        recompiles for EVERY buffer length (a compile per feed — observed
        as a multi-minute stall on the real chip).  Instead the start/end
        reflect context is materialized on the host (512 samples each) and
        every extension goes through ONE non-centered jit whose segment
        length is zero-padded to a power-of-two frame bucket — a handful of
        compiled shapes total, reused across streams.  Frame k of the
        centered transform covers samples [k*hop - nfft/2, k*hop + nfft/2),
        i.e. E[k*hop : k*hop + nfft] of the reflect-extended signal E."""
        hop, half = self._hop, self._nfft // 2
        n = len(self._buf)
        have = self._frames.shape[1]
        want = n // hop + (1 if final else 0)   # final adds the end-reflect
        if want <= have or n <= half:           # frame (librosa center=True)
            return
        parts = [self._buf[1:half + 1][::-1], self._buf]
        if final:
            parts.append(self._buf[-2:-half - 2:-1])
        ext = np.concatenate(parts)
        f = want - have
        seg = ext[have * hop: (want + 1) * hop]
        fb = 1 << max(6, (f - 1).bit_length())  # frame bucket: pow2, min 64
        seg = np.pad(seg, (0, (fb + 1) * hop - len(seg)))
        new = np.asarray(self._log_mel_abs(jnp.asarray(seg), center=False))
        self._frames = np.concatenate([self._frames, new[:, :f]], axis=1)
        assert self._frames.shape[1] == want, (self._frames.shape, want, n)
        if want > 0:
            self._ref = max(self._ref, float(self._frames.max()))

    def _run_window(self, i: int) -> np.ndarray:
        cfg = self.cfg
        s0, s1 = self._s0(i), self._s0(i) + self.spec_len
        fr = self._frames
        if s1 > fr.shape[1]:              # final window: edge-pad (batch
            fr = np.pad(fr, ((0, 0), (0, s1 - fr.shape[1])), mode="edge")
        # float32 throughout: matches the device path's f32 subtract/floor
        spec_w = np.maximum(fr[:, s0:s1] - np.float32(self._ref),
                            np.float32(-80.0))
        start_t = i * self.stride_time
        text_w = frame_aligned_word_indices(
            self._words, start_t, start_t + self.unit_time, cfg.n_poses,
            self.lang)
        inputs = {"spec_w": jnp.asarray(spec_w[None]),
                  "text_w": jnp.asarray(text_w[None]),
                  "carry": jnp.asarray(self._carry),
                  "vids": jnp.asarray([self.vid], np.int32)}
        w_rng = jax.random.fold_in(self.rng, i)
        if self._executor is None:
            out = np.asarray(self.synth._step(self.synth.state, inputs,
                                              w_rng))
        else:
            out = np.asarray(self._executor(inputs, w_rng))
        self._carry = out[:, -cfg.n_pre_poses:]
        n = cfg.n_pre_poses
        if self._tail is None:
            emit = out[0, :-n]
        else:
            j = np.arange(n).reshape(n, 1)
            blend = self._tail * (n - j) / (n + 1) + \
                out[0, :n] * (j + 1) / (n + 1)
            emit = np.concatenate([blend, out[0, n:-n]], axis=0)
        self._tail = out[0, -n:]
        self._next_w = i + 1
        return emit.astype(np.float32)

    def _ready(self, i: int) -> bool:
        """Window i's spec frames all fully real in the buffer?"""
        if self.total_seconds is not None and i >= self._num_sub:
            return False
        return (self._s0(i) + self.spec_len) * self._hop <= len(self._buf)

    # ------------------------------------------------------------------
    def feed(self, samples=None, words: Sequence = ()) -> np.ndarray:
        """Append audio samples (float32 [-1,1], int16, or uint8 mu-law)
        and/or word timings; returns newly final pose frames
        (n_new, pose_dim) — possibly empty."""
        assert not self._finished, "stream already finished"
        if words:
            self._words.extend(words)
        if samples is not None:
            # int16 / mu-law decoded on host (pcm_to_float_np): per-chunk
            # device round trips would cost a ~34 ms tunnel hop each
            from ha2g_tpu.ops.mel import pcm_to_float_np
            self._buf = np.concatenate([self._buf,
                                        pcm_to_float_np(samples)])
        outs = []
        while self._ready(self._next_w):
            self._extend_frames(final=False)
            outs.append(self._run_window(self._next_w))
        return np.concatenate(outs, axis=0) if outs else \
            np.zeros((0, self.synth.spec.pose_dim), np.float32)

    def finish(self) -> np.ndarray:
        """Flush: run any remaining (edge-padded) windows on the complete
        buffer and emit the held-back tail."""
        assert not self._finished, "stream already finished"
        self._finished = True
        if len(self._buf) <= self._nfft // 2:
            # degenerate: less audio than one reflect-padded DFT frame
            return (self._tail.astype(np.float32) if self._tail is not None
                    else np.zeros((0, self.synth.spec.pose_dim), np.float32))
        clip_seconds = len(self._buf) / SR
        if self.total_seconds is None:
            self.total_seconds = clip_seconds
            self._S_total = len(self._buf) // self._hop + 1
            _, _, self._num_sub = _window_layout(self.cfg, clip_seconds)
        self._extend_frames(final=True)
        outs = []
        while self._next_w < self._num_sub:
            outs.append(self._run_window(self._next_w))
        if self._tail is not None:
            outs.append(self._tail.astype(np.float32))
        return np.concatenate(outs, axis=0) if outs else \
            np.zeros((0, self.synth.spec.pose_dim), np.float32)


def polyfit_smooth(out_dir_vec: np.ndarray, cfg: Config) -> np.ndarray:
    """Cubic-polyfit smoothing across window joints for seq2seq outputs
    (synthesize.py:163-185).  out_dir_vec: (total_frames, D)."""
    n_smooth = cfg.n_pre_poses
    stride = cfg.n_poses - cfg.n_pre_poses
    total = out_dir_vec.shape[0]
    num_sub = max((total - cfg.n_poses) // stride + 1, 1)
    out = out_dir_vec.copy()
    for i in range(num_sub):
        start = cfg.n_pre_poses + i * stride - n_smooth
        if start < 0:
            start, end = 0, n_smooth * 2
        else:
            end = start + n_smooth * 3
        y = out[start:end]
        if y.shape[0] < 4:
            continue
        x = np.arange(y.shape[0])
        coeffs = np.polyfit(x, y, 3)
        out[start:end] = np.stack(
            [np.poly1d(coeffs[:, k])(x) for k in range(y.shape[1])], axis=1)
    return out


def fade_out_to_mean(out_dir_vec: np.ndarray, cfg: Config,
                     end_padding_duration_s: float) -> np.ndarray:
    """Quadratic-fit fade to the mean pose over the zero-padded tail
    (synthesize_hierarchy.py:189-213)."""
    n_smooth = cfg.n_pre_poses
    fps = cfg.motion_resampling_framerate
    start = len(out_dir_vec) - int(end_padding_duration_s * fps)
    end = start + n_smooth * 2
    out = out_dir_vec
    if len(out) < end:
        out = np.pad(out, [(0, end - len(out)), (0, 0)], mode="constant")
    out[end - n_smooth:] = 0.0
    y = out[start:end]
    x = np.arange(y.shape[0])
    w = np.ones(len(y))
    w[0] = w[-1] = 5
    coeffs = np.polyfit(x, y, 2, w=w)
    out[start:end] = np.stack(
        [np.poly1d(coeffs[:, k])(x) for k in range(y.shape[1])], axis=1)
    return out

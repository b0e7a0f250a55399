"""Checkpoint save/load.

Capability superset of the reference (train_utils.py:149-213): the reference
torch-saves per-module state dicts + pickled Vocab objects and has NO resume
path (no optimizer state, SURVEY.md section 5.4).  Here a checkpoint is a
directory:

  state.msgpack   — the FULL training-state pytree (params, batch_stats,
                    optimizer states, step) via flax.serialization
  config.json     — the embedded Config (self-describing, like the
                    reference's pickled args namespace)
  lang_vocab.json / speaker_vocab.json — explicit vocab tables
  word_vectors.npy (optional)

Mid-training resume restores everything, including Adam moments.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import numpy as np
import jax
from flax import serialization

from ha2g_tpu.config import Config
from ha2g_tpu.data.vocab import Vocab


def save_checkpoint(path: str | Path, state: Any, cfg: Config,
                    lang: Optional[Vocab] = None,
                    speaker: Optional[Vocab] = None,
                    extra: Optional[dict] = None) -> None:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    host_state = jax.device_get(state)
    (path / "state.msgpack").write_bytes(serialization.to_bytes(host_state))
    meta = {"config": cfg.to_dict(), "extra": extra or {}}
    (path / "config.json").write_text(json.dumps(meta, default=float))
    if lang is not None:
        lang.save(path / "lang_vocab.json")
        if lang.word_embedding_weights is not None:
            np.save(path / "word_vectors.npy", lang.word_embedding_weights)
    if speaker is not None:
        speaker.save(path / "speaker_vocab.json")


def load_config(path: str | Path) -> tuple[Config, dict]:
    meta = json.loads((Path(path) / "config.json").read_text())
    return Config.from_dict(meta["config"]), meta.get("extra", {})


def load_state(path: str | Path, template_state: Any) -> Any:
    """Restore into a freshly-initialized state pytree of the same model."""
    raw = (Path(path) / "state.msgpack").read_bytes()
    return serialization.from_bytes(template_state, raw)


def load_vocabs(path: str | Path) -> tuple[Optional[Vocab], Optional[Vocab]]:
    path = Path(path)
    lang = speaker = None
    if (path / "lang_vocab.json").exists():
        lang = Vocab.load(path / "lang_vocab.json")
        if (path / "word_vectors.npy").exists():
            lang.word_embedding_weights = np.load(path / "word_vectors.npy")
    if (path / "speaker_vocab.json").exists():
        speaker = Vocab.load(path / "speaker_vocab.json")
    return lang, speaker

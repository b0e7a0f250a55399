"""Word / speaker vocabulary.

Rebuild of scripts/model/vocab.py + scripts/utils/vocab_utils.py: a Vocab
with PAD/SOS/EOS/UNK specials, an optional pretrained embedding table, and
the same class reused (without specials) as the speaker model
(lmdb_data_loader.py:181-199).  Serialization is explicit JSON+npy instead of
pickled objects inside checkpoints (SURVEY.md section 7 hard-part 6).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Optional

import numpy as np

PAD_TOKEN = 0
SOS_TOKEN = 1
EOS_TOKEN = 2
UNK_TOKEN = 3


def normalize_string(s: str) -> str:
    """lowercase, trim, and remove non-letter characters
    (reference data_utils.py:18-25)."""
    s = s.lower().strip()
    s = re.sub(r"([,.!?])", r" \1 ", s)
    s = re.sub(r"(['])", r"", s)
    s = re.sub(r"[^a-zA-Z,.!?]+", r" ", s)
    s = re.sub(r"\s+", r" ", s).strip()
    return s


def remove_tags_marks(text: str) -> str:
    return re.sub(re.compile("<.*?>|[.,:;!?]+"), "", text)


class Vocab:
    """Word <-> index mapping (reference vocab.py:8-67)."""

    PAD_token = PAD_TOKEN
    SOS_token = SOS_TOKEN
    EOS_token = EOS_TOKEN
    UNK_token = UNK_TOKEN

    def __init__(self, name: str, insert_default_tokens: bool = True):
        self.name = name
        self.insert_default_tokens = insert_default_tokens
        self.trimmed = False
        self.word_embedding_weights: Optional[np.ndarray] = None
        self.reset_dictionary()

    def reset_dictionary(self):
        self.word2index: dict[str, int] = {}
        self.word2count: dict[str, int] = {}
        if self.insert_default_tokens:
            self.index2word = {self.PAD_token: "<PAD>", self.SOS_token: "<SOS>",
                               self.EOS_token: "<EOS>", self.UNK_token: "<UNK>"}
        else:
            self.index2word = {self.UNK_token: "<UNK>"}
        self.n_words = len(self.index2word)

    def index_word(self, word: str):
        if word not in self.word2index:
            self.word2index[word] = self.n_words
            self.word2count[word] = 1
            self.index2word[self.n_words] = word
            self.n_words += 1
        else:
            self.word2count[word] += 1

    def index_words_from_list(self, words):
        for w in words:
            self.index_word(w)

    def get_word_index(self, word: str) -> int:
        return self.word2index.get(word, self.UNK_token)

    # ---- embedding table -------------------------------------------------
    def load_word_vectors_npy(self, path: str | Path, embed_dim: int = 300):
        """Load a (n_words, dim) table aligned to this vocab from .npy
        (the fastText .bin loader of the reference, vocab.py:70-84, requires
        the fasttext binary dep; convert offline to npy + json)."""
        self.word_embedding_weights = np.load(path).astype(np.float32)
        assert self.word_embedding_weights.shape == (self.n_words, embed_dim)

    def load_word_vectors(self, path: str | Path, embed_dim: int = 300,
                          seed: int = 0):
        """Pretrained-embedding loading with the reference's semantics
        (vocab.py:70-84): init the whole table N(0, 1/sqrt(dim)), then
        overwrite every vocab word with its model vector.  Dispatch by
        extension: .bin = fastText binary (pure-Python reader incl.
        subword n-grams, so OOV vocab words still get vectors, exactly
        like the reference's fasttext.get_word_vector), .vec/.txt = text
        vectors (OOV words keep the random init), .npy = a pre-aligned
        (n_words, dim) table."""
        path = Path(path)
        if path.suffix == ".npy":
            return self.load_word_vectors_npy(path, embed_dim)
        rng = np.random.default_rng(seed)
        weights = rng.normal(0, 1 / np.sqrt(embed_dim),
                             (self.n_words, embed_dim)).astype(np.float32)
        if path.suffix == ".bin":
            from ha2g_tpu.data.fasttext_bin import load_model
            try:
                import fasttext  # the real package, if present
                model = fasttext.load_model(str(path))
            except ImportError:
                model = load_model(path)
            assert model.get_dimension() == embed_dim
            for word, idx in self.word2index.items():
                weights[idx] = model.get_word_vector(word)
        else:
            from ha2g_tpu.data.fasttext_bin import load_vec_text
            vectors, dim = load_vec_text(path)
            assert dim == embed_dim, f"{path} has dim {dim} != {embed_dim}"
            for word, idx in self.word2index.items():
                if word in vectors:
                    weights[idx] = vectors[word]
        self.word_embedding_weights = weights

    def random_word_vectors(self, embed_dim: int = 300, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.word_embedding_weights = rng.normal(
            size=(self.n_words, embed_dim)).astype(np.float32)

    # ---- serialization -----------------------------------------------------
    def to_dict(self) -> dict:
        return {"name": self.name,
                "insert_default_tokens": self.insert_default_tokens,
                "n_words": self.n_words,
                "index2word": {str(k): v for k, v in self.index2word.items()},
                "word2count": self.word2count}

    @classmethod
    def from_dict(cls, d: dict) -> "Vocab":
        v = cls(d["name"], d["insert_default_tokens"])
        counts = d.get("word2count", {})
        items = sorted(((int(k), w) for k, w in d["index2word"].items()))
        for idx, word in items:
            if v.index2word.get(idx) == word and word not in counts:
                continue  # reset-time placeholder (<PAD>/<UNK>/...)
            v.word2index[word] = idx
            v.index2word[idx] = word
            # preserve counts so Vocab.trimmed workflows survive a
            # save/load round trip (older files lack them; default 1)
            v.word2count[word] = int(counts.get(word, 1))
            v.n_words = max(v.n_words, idx + 1)
        # n_words is NOT max(index)+1 in general: with
        # insert_default_tokens=False the <UNK> placeholder sits at index
        # 3 while real entries start at 1 (reference vocab.py quirk,
        # inherited); restore the recorded count exactly
        if "n_words" in d:
            v.n_words = int(d["n_words"])
        return v

    def save(self, path: str | Path):
        Path(path).write_text(json.dumps(self.to_dict()))

    @classmethod
    def load(cls, path: str | Path) -> "Vocab":
        return cls.from_dict(json.loads(Path(path).read_text()))


def build_vocab(name: str, clip_sets, insert_default_tokens: bool = True) -> Vocab:
    """Scan word lists of all clip sets (reference vocab_utils.py:11-35)."""
    vocab = Vocab(name, insert_default_tokens)
    for clips in clip_sets:
        for clip in clips:
            for word, _, _ in clip["words"]:
                vocab.index_word(word)
    return vocab

"""Text-to-speech + forced-alignment front-end for from_text synthesis.

Rebuilds the reference's optional-dependency surface:
* TTSHelper (scripts/utils/tts_helper.py:9-104): Google Cloud TTS with an
  md5-keyed wav cache.  The google-cloud-texttospeech client is
  import-gated; without it, ``synth_speech`` raises with guidance.
* align_words (scripts/synthesize.py:212-229): gentle forced alignment of
  the transcript to the synthesized audio.  gentle is import-gated; the
  ``uniform_align`` fallback spreads words evenly over the clip — enough to
  drive the frame-aligned word-index encoding, which only consumes word
  START times (synthesize_hierarchy.py:100-113).
"""

from __future__ import annotations

import hashlib
import logging
import re
from pathlib import Path


class TTSHelper:
    """Cached TTS synthesis (wav, 16 kHz mono)."""

    def __init__(self, cache_path: str = "cached_wav", verbose: bool = False):
        self.cache_path = Path(cache_path)
        self.cache_path.mkdir(parents=True, exist_ok=True)
        self.verbose = verbose

    def _cache_file(self, text: str, voice: str) -> Path:
        key = hashlib.md5((voice + text).encode()).hexdigest()
        return self.cache_path / f"tts_{key}.wav"

    def synthesis(self, ssml_text: str, voice_name: str = "en-US-Wavenet-A",
                  verbose: bool = False) -> str:
        """Returns the path of a cached or freshly synthesized wav."""
        out = self._cache_file(ssml_text, voice_name)
        if out.exists():
            if verbose or self.verbose:
                logging.info("using cached tts %s", out)
            return str(out)
        try:
            from google.cloud import texttospeech  # type: ignore
        except ImportError as e:
            raise ImportError(
                "from_text synthesis needs google-cloud-texttospeech "
                "(and GCP credentials); alternatively supply a wav + "
                "transcript and use uniform_align") from e
        client = texttospeech.TextToSpeechClient()
        synthesis_input = texttospeech.SynthesisInput(ssml=ssml_text)
        voice = texttospeech.VoiceSelectionParams(
            language_code="-".join(voice_name.split("-")[:2]),
            name=voice_name)
        audio_config = texttospeech.AudioConfig(
            audio_encoding=texttospeech.AudioEncoding.LINEAR16,
            sample_rate_hertz=16000)
        response = client.synthesize_speech(
            input=synthesis_input, voice=voice, audio_config=audio_config)
        out.write_bytes(response.audio_content)
        return str(out)


def gentle_align(audio_path: str, transcript: str):
    """Word timestamps via the gentle forced aligner (import-gated)."""
    try:
        import gentle  # type: ignore
    except ImportError as e:
        raise ImportError("gentle is not installed; use uniform_align") from e
    resources = gentle.Resources()
    with gentle.resampled(audio_path) as wavfile:
        aligner = gentle.ForcedAligner(resources, transcript)
        result = aligner.transcribe(wavfile)
    words = []
    for w in result.words:
        if w.case == "success":
            words.append((w.word, float(w.start), float(w.end)))
    return words


def uniform_align(transcript: str, duration_s: float
                  ) -> list[tuple[str, float, float]]:
    """Fallback alignment: spread words uniformly over the clip."""
    words = [w for w in re.split(r"\s+", transcript.strip()) if w]
    if not words:
        return []
    step = duration_s / (len(words) + 1)
    return [(w, (i + 1) * step, (i + 1) * step + min(step, 0.3))
            for i, w in enumerate(words)]

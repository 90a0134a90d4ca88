"""Adapters that plug REAL fastText / KenLM model binaries into the
filter pipeline.

The engine's default models (functions/models.py) are deterministic
in-repo stand-ins — required for the golden byte-identity contract and
for a sandbox with no model downloads. Production runs swap in the real
binaries through these adapters, which present the SAME batch interface
(``predict(texts) -> (langs, conf)``, ``score(texts) -> ppl``), so the
swap is one constructor call and zero plan-shape change:

    models = QualityModels(
        langid=FastTextLangId.from_file("lid.176.bin"),
        perplexity=KenLMPerplexity.from_file("wiki.arpa.bin"))
    run_filter_job(spark, input, output, models=models)

Broadcast contract (the part that matters on a 1000-executor cluster):
an adapter holds the RAW MODEL BYTES — picklable, so
``SparkContext.broadcast`` ships them once per executor — and the
native model handle is loaded LAZILY per worker process from a temp
file, then cached on the instance. ``__getstate__`` drops the loaded
handle, so serialization cost is the blob, never the parsed model.

The ``fasttext`` / ``kenlm`` packages are not installed in this
environment; imports are gated with a clear error, and the unit tests
exercise the full plumbing (lazy load, pickle round-trip, batch
interface) by injecting fake modules.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from datacanary_spark.functions.models import SCORE_MAX_BYTES


def _head_text(t, max_bytes: int = SCORE_MAX_BYTES) -> str:
    """First ``max_bytes`` of the document measured in UTF-8 BYTES —
    the same scoring window the built-in models use (a character slice
    would read up to 4× more bytes on CJK text, diverging the verdicts
    the adapters are supposed to reproduce). A codepoint cut in half by
    the byte slice is dropped."""
    b = ("" if t is None else str(t)).encode("utf-8")[:max_bytes]
    return b.decode("utf-8", errors="ignore")


def _require(module: str):
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError as e:
        raise ImportError(
            f"the '{module}' package is required for this adapter but is "
            f"not installed; install it on driver and executors (e.g. via "
            f"--archives of a packed env) or use the engine's built-in "
            f"deterministic models (functions/models.py)") from e


class _LazyBinaryModel:
    """Shared blob-carrying / lazy-loading machinery."""

    _suffix = ".bin"

    def __init__(self, blob: bytes):
        if not isinstance(blob, (bytes, bytearray)):
            raise TypeError("model blob must be bytes")
        self._blob = bytes(blob)
        self._model = None

    @classmethod
    def from_file(cls, path: str):
        with open(path, "rb") as f:
            return cls(f.read())

    def _load_native(self, path: str):  # pragma: no cover - overridden
        raise NotImplementedError

    def _load(self):
        if self._model is None:
            # the native libs load from a file path, not bytes: write the
            # broadcast blob to a per-process temp file once
            fd, path = tempfile.mkstemp(suffix=self._suffix)
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(self._blob)
                self._model = self._load_native(path)
            finally:
                try:
                    os.unlink(path)
                except OSError:
                    pass
        return self._model

    def __getstate__(self):
        # broadcast/pickle ships the blob only — never the native handle
        return {"_blob": self._blob}

    def __setstate__(self, state):
        self._blob = state["_blob"]
        self._model = None


class FastTextLangId(_LazyBinaryModel):
    """fastText language-ID (e.g. lid.176.bin) behind LangIdModel's
    batch interface."""

    def _load_native(self, path: str):
        return _require("fasttext").load_model(path)

    def predict(self, texts):
        """Returns (lang: np.ndarray[str], conf: np.ndarray[float64]).

        fastText labels come back as ``__label__xx``; newline is a
        document separator for fastText, so it is stripped, and scoring
        reads the same first-KBs window as the built-in model.
        """
        m = self._load()
        cleaned = [_head_text(t).replace("\n", " ") for t in texts]
        labels, probs = m.predict(cleaned, k=1)
        langs = np.array(
            [(l[0][len("__label__"):] if l else "und") for l in labels],
            dtype=object)
        conf = np.array([float(p[0]) if len(p) else 0.0 for p in probs],
                        dtype=np.float64)
        return langs, conf


class KenLMPerplexity(_LazyBinaryModel):
    """KenLM n-gram LM (binary or arpa) behind PerplexityModel's batch
    interface. Perplexity = 10^(-log10P / tokens) over the same
    first-KBs window as the built-in model."""

    _suffix = ".klm"

    def _load_native(self, path: str):
        return _require("kenlm").Model(path)

    def score(self, texts) -> np.ndarray:
        from datacanary_spark.functions.models import EMPTY_DOC_PPL

        m = self._load()
        out = np.empty(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            s = _head_text(t).strip()
            n_tokens = len(s.split())
            if n_tokens == 0:
                out[i] = EMPTY_DOC_PPL
                continue
            # kenlm scores log10 P(sentence) including </s>
            out[i] = 10.0 ** (-m.score(s) / (n_tokens + 1))
        return out

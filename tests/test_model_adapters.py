"""Real-model adapter plumbing (fastText / KenLM), exercised with
injected fake modules — the native packages are not installed here, so
these tests verify exactly the parts the adapters own: gated import,
lazy per-process load from the broadcast blob, pickle round-trip that
drops the native handle, and batch-interface conformance."""

from __future__ import annotations

import math
import pickle
import sys
import types

import numpy as np
import pytest

from datacanary_spark.functions.model_adapters import (
    FastTextLangId,
    KenLMPerplexity,
)


class _FakeFastTextModel:
    def __init__(self, path):
        with open(path, "rb") as f:
            self.blob = f.read()

    def predict(self, texts, k=1):
        labels = [(f"__label__{'en' if 'the' in t else 'de'}",) if t else ()
                  for t in texts]
        probs = [np.array([0.9]) if t else np.array([]) for t in texts]
        return labels, probs


class _FakeKenLMModel:
    def __init__(self, path):
        pass

    def score(self, s):
        return -0.5 * len(s.split())  # log10 P


@pytest.fixture()
def fake_modules(monkeypatch):
    ft = types.ModuleType("fasttext")
    ft.load_model = _FakeFastTextModel
    km = types.ModuleType("kenlm")
    km.Model = _FakeKenLMModel
    monkeypatch.setitem(sys.modules, "fasttext", ft)
    monkeypatch.setitem(sys.modules, "kenlm", km)


def test_missing_package_raises_actionable_error(monkeypatch):
    monkeypatch.setitem(sys.modules, "fasttext", None)
    a = FastTextLangId(b"blob")
    with pytest.raises(ImportError, match="fasttext.*not installed"):
        a.predict(["x"])


def test_fasttext_adapter_batch_interface(fake_modules):
    a = FastTextLangId(b"modelbytes")
    langs, conf = a.predict(["the cat sat", "kein englisch", None, ""])
    assert list(langs) == ["en", "de", "und", "und"]
    assert conf[0] == pytest.approx(0.9) and conf[3] == 0.0
    # the native model was loaded from a temp file holding the blob
    assert a._model.blob == b"modelbytes"


def test_pickle_roundtrip_drops_native_handle(fake_modules):
    a = FastTextLangId(b"modelbytes")
    a.predict(["warm up the handle"])
    assert a._model is not None
    b = pickle.loads(pickle.dumps(a))          # the broadcast path
    assert b._model is None and b._blob == b"modelbytes"
    langs, _ = b.predict(["the lazy reload"])  # lazy re-load per process
    assert list(langs) == ["en"]


def test_kenlm_adapter_scores_and_empty_sentinel(fake_modules):
    from datacanary_spark.functions.models import EMPTY_DOC_PPL

    a = KenLMPerplexity(b"lm")
    ppl = a.score(["three word doc", "", None])
    # -0.5*3 log10 over 4 tokens (incl </s>) -> 10^(1.5/4)
    assert ppl[0] == pytest.approx(10 ** (1.5 / 4))
    assert ppl[1] == EMPTY_DOC_PPL and ppl[2] == EMPTY_DOC_PPL
    assert not math.isnan(ppl[0])


def test_adapters_slot_into_quality_models_bundle(fake_modules):
    """The bundle broadcast by the pipeline accepts the adapters — the
    production swap is one constructor call."""
    from datacanary_spark.functions.models import QualityModels

    qm = QualityModels(langid=FastTextLangId(b"ft"),
                       perplexity=KenLMPerplexity(b"km"))
    blob = qm.to_bytes()
    back = QualityModels.from_bytes(blob)
    langs, conf = back.langid.predict(["the quick test"])
    assert list(langs) == ["en"]
    assert back.perplexity.score(["a b"])[0] > 0


def test_scoring_window_is_bytes_not_chars(fake_modules):
    """Parity with the built-in models: the scoring window is UTF-8
    BYTES (a char slice would read ~3x more of a CJK document)."""
    from datacanary_spark.functions.model_adapters import _head_text
    from datacanary_spark.functions.models import SCORE_MAX_BYTES

    cjk = "日" * SCORE_MAX_BYTES  # 3 bytes per char
    head = _head_text(cjk)
    assert len(head.encode("utf-8")) <= SCORE_MAX_BYTES
    assert len(head) == SCORE_MAX_BYTES // 3  # not a char-count slice
    assert _head_text(None) == ""
    # a codepoint cut mid-sequence by the byte boundary is dropped
    assert not _head_text("a" + "é" * SCORE_MAX_BYTES).endswith("�")

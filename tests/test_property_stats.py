"""Property-based check: Spark text stats == golden pandas twin on
adversarial generated text (unicode letters, whitespace runs, bullets,
ellipses, symbols, newlines, empty strings). One Hypothesis example =
one batch of texts = one Spark job, so examples are few but each covers
many documents."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datacanary_spark.functions.heuristics import STAT_NAMES, with_text_stats
from datacanary_spark.golden import _doc_stats

ALPHABET = (
    "ab zπé汉字 \t\n"      # letters (incl. unicode), ASCII whitespace
    "#$%*+=|"              # symbol-class characters
    ".-•"                  # ellipsis/bullet building blocks
    " "               # unicode NBSP — must NOT split words
)

texts_strategy = st.lists(
    st.one_of(st.none(),
              st.text(alphabet=ALPHABET, min_size=0, max_size=120)),
    min_size=1, max_size=25)

CHECKED = [n for n in STAT_NAMES if n not in ("n_chars", "line_count")]


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=texts_strategy)
def test_spark_stats_match_golden_twin(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in
           with_text_stats(df, "text", prefix="").collect()}
    for i, t in enumerate(texts):
        expected = _doc_stats(t)
        for name in CHECKED:
            g, e = got[i][name], expected[name]
            if e is None or g is None:
                assert g == e, (name, repr(t), g, e)
            else:
                assert g == pytest.approx(e, rel=1e-12), (name, repr(t), g, e)

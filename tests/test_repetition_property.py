"""Generator-driven oracle for repetition_stats: a pure-Python
reference implementation over random multi-line token documents,
compared value-for-value against the distributed explode/agg form.

The hand fixtures in test_repetition.py already caught two combinatoric
slips (periodic texts repeat their ROTATED n-grams); this module lets
hypothesis hunt the rest of the space — empty lines, whitespace-only
lines, single-token docs, all-duplicate docs — against an
implementation simple enough to be obviously right.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hs

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdb_sync_spark.functions.text import repetition_stats  # noqa: E402

# Long property/chaos/replay suite: excluded from the default
# (driver-time-boxed) profile; the full local gate runs it — see
# pytest.ini and scripts/run_full_tests.sh.
pytestmark = pytest.mark.slow


WS_SET = set(" \t\n\r\f\x0b")

# documents assembled from a tiny alphabet so duplication is common —
# the interesting regime for these stats
token = hs.sampled_from(["a", "b", "ab", "xy", "Z"])
line = hs.lists(token, min_size=0, max_size=6).map(" ".join)
doc = hs.lists(line, min_size=0, max_size=8).map("\n".join)


def _ref(text: str, top_n: int, dup_n: int) -> dict:
    """The obviously-right reference."""
    if text is None:
        text = ""
    lines = [ln.strip() for ln in text.split("\n")]
    lines = [ln for ln in lines if ln != ""]
    lc = Counter(lines)
    n_lines = sum(lc.values())
    dup_line_frac = (
        1 - len(lc) / n_lines if n_lines else 0.0
    )
    tot_chars = sum(len(ln) * c for ln, c in lc.items())
    dup_chars = sum(len(ln) * c for ln, c in lc.items() if c > 1)
    dup_line_char_frac = dup_chars / tot_chars if tot_chars else 0.0

    toks = [t for t in text.strip().split() if t] if text.strip() else []

    def grams(n):
        return Counter(
            tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)
        )

    g_top = grams(top_n)
    top_frac = (
        min(1.0, max(g_top.values()) * top_n / len(toks))
        if g_top else 0.0
    )
    g_dup = grams(dup_n)
    tot = sum(g_dup.values())
    dup_frac = (
        sum(c - 1 for c in g_dup.values() if c > 1) / tot if tot else 0.0
    )
    return {
        "n_lines": n_lines,
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
        "top_ngram_frac": top_frac,
        "dup_ngram_frac": dup_frac,
    }


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=hs.lists(doc, min_size=1, max_size=5))
def test_matches_python_reference(spark, docs):
    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(df).collect()
    }
    assert set(got) == set(range(len(docs)))
    for i, d in rows:
        want = _ref(d, 2, 5)
        g = got[i]
        assert g["n_lines"] == want["n_lines"], (i, d)
        for k in ("dup_line_frac", "dup_line_char_frac",
                  "top_ngram_frac", "dup_ngram_frac"):
            assert g[k] == pytest.approx(want[k]), (k, i, repr(d))

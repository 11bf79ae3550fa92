r"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting (SURVEY.md Phase 5; generalizes the reference's
string layer P9/F-ops to corpus analytics).

All pure Catalyst expressions — tokenization via ``split``, per-token work
via array higher-order functions. No explode: one row in, one row out, so
the operators scale linearly with document count and never shuffle.

Cross-engine notes: whitespace tokenization is ``split(trim_ws(text),
WS+'+')`` in Spark ≡ ``regexp_split_to_array(trim_sql(text), ...)`` in
DuckDB over the SAME explicit
whitespace class (``WS_CHARS`` — never bare ``\s``, whose definition
differs between Java regex and RE2); token-length sums fold to
INT (exact); ratios are single double divisions of exact ints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tmdb_sync_spark.io import parallel_table
from tmdb_sync_spark.registry import register

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

# The whitespace class, spelled out EXPLICITLY for both engines: Java
# regex (Spark) defines \s as [ \t\n\x0B\f\r] while RE2 (DuckDB) defines
# it as [ \t\n\f\r] — a vertical tab (U+000B) tokenizes differently and
# every downstream feature diverges (found live by a hostile-unicode
# corpus probe: doc "tab\tand\nnewline\rand\x0Bvtab mix" produced 6
# Spark tokens vs 5 DuckDB tokens and shifted seven feature columns).
# WS_CHARS feeds Spark patterns; WS_SQL is the same class for DuckDB
# regex literals (standard SQL strings pass backslashes through).
WS_CHARS = r" \t\n\r\f\x0B"
WS = rf"[{WS_CHARS}]"
WS_SQL = WS_CHARS    # alias, not a copy: the classes must never drift

# The LITERAL characters of the quality heuristic's keep alphabet
# (A-Za-z0-9 + the WS class) for `translate`-based punctuation
# counting — decoded FROM WS_CHARS so the two spellings cannot drift.
_PUNCT_KEEP = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    + WS_CHARS.encode().decode("unicode_escape")
)

BPE_PATTERN = rf"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{WS_CHARS}]"

_STOP_SQL = "['the','a','and','of','to','in','is']"


def trim_ws(col: Column) -> Column:
    """Trim exactly ``WS_CHARS`` from both ends. The builtins are NOT
    interchangeable across engines: Spark's ``trim`` strips ASCII space
    only (a leading tab survives and yields a phantom empty first token),
    while DuckDB's strips full Unicode whitespace (a non-breaking space
    U+00A0 disappears even though the tokenizer's contract says NBSP is
    a token character). Found live by the hypothesis tokenizer-parity
    generator on doc ``'\\xa0'`` — spelled out here as a regex over the
    same explicit class both engines tokenize with."""
    return F.regexp_replace(col, rf"^{WS}+|{WS}+$", "")


def trim_sql(expr: str = "text") -> str:
    """DuckDB twin of :func:`trim_ws` — same explicit class, never the
    builtin ``trim`` (Unicode-aware, diverges on NBSP et al.)."""
    return f"regexp_replace({expr}, '^[{WS_SQL}]+|[{WS_SQL}]+$', '', 'g')"


def _tokens(col: Column) -> Column:
    return F.split(trim_ws(col), WS + "+")


# Public single source of the whitespace tokenizer: every operator that
# materializes a token column (here, dedup's shingles, the curation
# pipeline) must build it from THIS expression, or a future regex change
# silently desynchronizes them from QUALITY_SQL / the shingle oracle.
tokens_expr = _tokens


def stopword_count_expr(tokens: Column) -> Column:
    """Stopword count over a materialized token-array column — exported
    so callers that need the count themselves can compute it ONCE and
    pass it back into :func:`quality_score_expr` (lambda-bearing trees
    are ineligible for Spark's subexpression elimination, so two textual
    copies run the interpreted per-token filter twice)."""
    return F.size(F.filter(tokens, lambda x: F.lower(x).isin(*STOPWORDS)))


def quality_score_expr(
    text: Column,
    tokens: Column | None = None,
    n_stop: Column | None = None,
) -> Column:
    """The deterministic length / stopword-ratio / punct quality heuristic
    (shared by ``tx_text_features`` and the curation pipeline — one
    definition so both engines and both queries agree exactly).

    Pass ``tokens`` (a MATERIALIZED token-array column) whenever the
    caller already projects one: with the default, the ``split`` lands
    inside the stopword ``filter`` lambda and is re-evaluated interpreted
    per element (see ``dedup._shingles_from``). Likewise pass ``n_stop``
    when the caller already computes the stopword count (see
    :func:`stopword_count_expr`)."""
    t = _tokens(text) if tokens is None else tokens
    n_tokens = F.size(t)
    if n_stop is None:
        n_stop = stopword_count_expr(t)
    # translate, not regexp_replace (r12, guide §1.2): deleting the
    # KEEP alphabet and measuring what remains counts exactly the
    # codepoints the old negated-class regex deleted — same n_punct for
    # every input — at a table lookup per char instead of a regex scan.
    # Interleaved A/B at sf0.1 (quality projection over documents):
    # 0.31 → 0.22 s warm, outputs bit-identical; the DuckDB twin
    # (QUALITY_SQL) keeps the regex form as the cross-engine pin.
    n_punct = F.length(F.translate(text, _PUNCT_KEEP, ""))
    stop_ratio = n_stop / n_tokens
    return (
        F.when(n_tokens >= 10, 0.5).otherwise(0.0)
        + F.when(stop_ratio.between(0.05, 0.6), 0.3).otherwise(0.0)
        + F.when(n_punct * 5 < F.length(trim_ws(text)), 0.2).otherwise(0.0)
    )


# DuckDB twin of quality_score_expr over a relation exposing ``text``
# (explicit-class trim_sql, never builtin trim — see trim_ws).
_T = trim_sql("text")
QUALITY_SQL = (
    f"(CASE WHEN len(regexp_split_to_array({_T}, '[{WS_SQL}]+')) >= 10 THEN 0.5 ELSE 0.0 END"
    f" + CASE WHEN CAST(len(list_filter(regexp_split_to_array({_T}, '[{WS_SQL}]+'),"
    f" x -> list_contains({_STOP_SQL}, lower(x)))) AS INT)"
    f" / len(regexp_split_to_array({_T}, '[{WS_SQL}]+')) BETWEEN 0.05 AND 0.6 THEN 0.3 ELSE 0.0 END"
    f" + CASE WHEN (length(text) - length(regexp_replace(text, '[^A-Za-z0-9{WS_SQL}]', '', 'g'))) * 5"
    f" < length({_T}) THEN 0.2 ELSE 0.0 END)"
)


_MARKERS = {
    "en": ("the", "and", "of", "is", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "de", "los", "es"),
    "fr": ("le", "la", "et", "les", "est"),
}


def _marker_sql(lang: str) -> str:
    lst = ",".join(f"'{w}'" for w in _MARKERS[lang])
    return f"len(list_filter(t, x -> list_contains([{lst}], lower(x))))"


@register(
    "tx_text_features",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, lang AS lang_label,
               regexp_split_to_array({_T}, '[{WS_SQL}]+') AS t,
               length({_T}) AS trimmed_len,
               length(text) - length(regexp_replace(text, '[^A-Za-z0-9{WS_SQL}]', '', 'g')) AS n_punct,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9{WS_SQL}]')) AS n_bpe_tokens
        FROM documents
    ),
    scored AS (
        SELECT *,
               CAST({_marker_sql('en')} AS INT) AS en_n,
               CAST({_marker_sql('de')} AS INT) AS de_n,
               CAST({_marker_sql('es')} AS INT) AS es_n,
               CAST({_marker_sql('fr')} AS INT) AS fr_n
        FROM toks
    )
    SELECT doc_id,
           CAST(len(t) AS INT) AS n_tokens,
           CAST(n_bpe_tokens AS INT) AS n_bpe_tokens,
           CAST(n_punct AS INT) AS n_punct,
           CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS BIGINT) AS token_chars,
           CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS BIGINT) / len(t) AS avg_token_len,
           CAST(len(list_filter(t, x -> list_contains({_STOP_SQL}, lower(x)))) AS INT) AS n_stopwords,
           CAST(len(list_filter(t, x -> list_contains({_STOP_SQL}, lower(x)))) AS INT) / len(t) AS stopword_ratio,
           (CASE WHEN len(t) >= 10 THEN 0.5 ELSE 0.0 END
            + CASE WHEN CAST(len(list_filter(t, x -> list_contains({_STOP_SQL}, lower(x)))) AS INT) / len(t)
                        BETWEEN 0.05 AND 0.6 THEN 0.3 ELSE 0.0 END
            + CASE WHEN n_punct * 5 < trimmed_len THEN 0.2 ELSE 0.0 END) AS quality_score,
           lang_label, en_n, de_n, es_n, fr_n,
           CASE WHEN en_n = 0 AND de_n = 0 AND es_n = 0 AND fr_n = 0 THEN 'und'
                WHEN en_n >= de_n AND en_n >= es_n AND en_n >= fr_n THEN 'en'
                WHEN de_n >= es_n AND de_n >= fr_n THEN 'de'
                WHEN es_n >= fr_n THEN 'es'
                ELSE 'fr' END AS lang_guess
    FROM scored
    """,
)
def tx_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/quality stats + language ID, one fused per-document pass.

    - ``n_tokens``: whitespace tokens; ``n_bpe_tokens``: BPE-ish regex
      token count (letters / digit runs / single symbols).
    - ``quality_score``: deterministic length / stopword-ratio / punct
      heuristic (the classic pretraining quality-filter shape) — a sum of
      exact double literals, so it hash-matches across engines.
    - Language ID: count per-language marker words, argmax with a fixed
      priority order for ties (deterministic). ``lang_label`` rides along
      so accuracy is inspectable; the contract is the deterministic
      guess, not label recovery.

    Fusing the two stages shares one tokenization scan — at 100 TB the
    text is read and split once for every per-row feature downstream.
    """
    docs = parallel_table(spark, sf_dir, "documents").withColumn(
        # materialize the token array BEFORE any HOF references it: an
        # embedded split re-tokenizes per lambda element (interpreted);
        # an attribute ref is a row-local array read. CollapseProject
        # keeps this projection separate (non-cheap alias, many refs).
        "_toks", _tokens(F.col("text"))
    )
    t = F.col("_toks")
    n_tokens = F.size(t)
    token_chars = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    ).cast("long")
    n_stop = stopword_count_expr(t)
    # same translate form quality_score_expr uses for its punct term
    # (value-identical to the negated-class regex count — see the note
    # there); identical trees also let codegen CSE share ONE translate
    # between this column and the quality score, where the old regex
    # form paid a separate full-text scan. The oracle keeps the regex
    # spelling as the cross-engine pin.
    n_punct = F.length(F.translate(F.col("text"), _PUNCT_KEEP, ""))
    n_bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0)))
    stop_ratio = n_stop / n_tokens
    # pass the already-computed n_stop: the lambda-bearing filter is
    # ineligible for subexpression elimination, so a second textual copy
    # would run the interpreted per-token pass twice per document
    quality = quality_score_expr(F.col("text"), tokens=t, n_stop=n_stop)

    def marker_count(words: tuple[str, ...]) -> Column:
        # NB: HOF lambdas must be single-parameter — PySpark binds a
        # lambda variable to every declared parameter, defaults included.
        ws = list(words)
        return F.size(F.filter(t, lambda x: F.lower(x).isin(ws)))

    counts = {lang: marker_count(words) for lang, words in _MARKERS.items()}
    en, de, es, fr = counts["en"], counts["de"], counts["es"], counts["fr"]
    guess = (
        F.when((en == 0) & (de == 0) & (es == 0) & (fr == 0), "und")
        .when((en >= de) & (en >= es) & (en >= fr), "en")
        .when((de >= es) & (de >= fr), "de")
        .when(es >= fr, "es")
        .otherwise("fr")
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        n_punct.alias("n_punct"),
        token_chars.alias("token_chars"),
        (token_chars / n_tokens).alias("avg_token_len"),
        n_stop.alias("n_stopwords"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
        F.col("lang").alias("lang_label"),
        en.alias("en_n"),
        de.alias("de_n"),
        es.alias("es_n"),
        fr.alias("fr_n"),
        guess.alias("lang_guess"),
    )


@register(
    "tx_ngram_topk",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower({_T}), '[{WS_SQL}]+') AS t
        FROM documents
    ),
    grams AS (
        SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM toks
        WHERE len(t) >= 2
    )
    SELECT bigram, COUNT(*) AS n
    FROM grams
    GROUP BY bigram
    ORDER BY n DESC, bigram ASC
    LIMIT 20
    """,
)
def tx_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-k bigrams — the pretraining corpus-analysis staple.

    Explode bigrams → count → top-20. The limit rides on the aggregate as
    ``TakeOrderedAndProject`` (per-partition heaps, no global sort);
    map-side partial counts keep the Exchange small — the shape that holds
    at 100 TB where the gram space is huge but heavy hitters dominate.
    Ties broken by bigram text so both engines cut the same top-20.
    """
    docs = parallel_table(spark, sf_dir, "documents").withColumn(
        # materialized first — element_at inside the lambda must read an
        # attribute, not re-run the split per bigram (see tx_text_features)
        "_toks", F.split(F.lower(trim_ws(F.col("text"))), WS + "+")
    )
    t = F.col("_toks")
    grams = docs.where(F.size(t) >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i), F.element_at(t, i + 1)
                ),
            )
        ).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


# --- PII redaction (corpus-prep scrub) --------------------------------
#
# The standard pre-training scrub: replace emails, phone-like number
# runs, and IPv4 literals with stable placeholder tokens, as pure
# Catalyst regexp_replace chains — JVM-side, fused into whatever scan
# the caller is already running, one row in / one row out, no shuffle.
#
# Deliberate scope (stated, not hidden): pattern-based PII only.
# Emails and IPv4s are crisp; "phone numbers" is a heuristic over
# digit-run shapes (≥9 digits with separators) that WILL both miss
# exotic formats and occasionally eat a long numeric id — callers
# needing NER-grade scrubbing run a model pass downstream; this is the
# cheap always-on layer. Order matters and is fixed: emails first
# (their local parts can contain digits a phone pattern could bite),
# then IPv4 (dotted quads would otherwise match the phone shape), then
# phones.

EMAIL_PATTERN = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# octets allow leading zeros (192.168.001.1 is how routers print them)
IPV4_PATTERN = (
    r"\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9]{1,2})\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9]{1,2})\b"
)
# Phone-shaped runs: optional +country, then a digit/separator body
# ending in a digit. The lookahead asserts ≥9 DIGITS reachable through
# SEPARATORS ONLY (its filler class excludes letters, so it can never
# satisfy itself with digits beyond the run); the lookbehind/lookahead
# keep it off the tails of longer identifiers. '.' is deliberately NOT
# a phone separator: with it, decimals (3.14159...) and dotted quads
# phone-match (found live by the test corpus) — dotted phone formats
# are the accepted miss, stated here. Java regex (Spark) supports the
# lookarounds; this expression has no DuckDB twin and needs none —
# redaction is an engine-side prep step, not a registered query.
PHONE_PATTERN = (
    r"(?<![0-9A-Za-z.])\+?(?=(?:[ ()\-]*[0-9]){9})"
    r"[0-9][0-9 ()\-]{7,}[0-9](?![0-9A-Za-z])"
)

EMAIL_TOKEN = "[EMAIL]"
IP_TOKEN = "[IP]"
PHONE_TOKEN = "[PHONE]"


def redact_pii_expr(col: Column) -> Column:
    """``text`` → scrubbed text: emails → ``[EMAIL]``, IPv4 →
    ``[IP]``, phone-shaped runs (≥9 digits through separators) →
    ``[PHONE]``. Idempotent: placeholder tokens contain no redactable
    shapes. Order is fixed — emails first (local parts contain digit
    runs), then IPv4 (dotted quads would otherwise phone-match), then
    phones."""
    out = F.regexp_replace(col, EMAIL_PATTERN, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_PATTERN, IP_TOKEN)
    return F.regexp_replace(out, PHONE_PATTERN, PHONE_TOKEN)


def pii_counts_expr(col: Column) -> Column:
    """Struct of per-category hit counts on the RAW text — the audit
    column a scrub job writes next to the redacted text (monitoring
    redaction volume is how pattern drift gets noticed)."""
    return F.struct(
        F.regexp_count(col, F.lit(EMAIL_PATTERN)).alias("emails"),
        F.regexp_count(col, F.lit(IPV4_PATTERN)).alias("ips"),
        F.regexp_count(
            F.regexp_replace(
                F.regexp_replace(col, EMAIL_PATTERN, EMAIL_TOKEN),
                IPV4_PATTERN, IP_TOKEN,
            ),
            F.lit(PHONE_PATTERN),
        ).alias("phones"),
    )


# --- repetition quality signals (corpus-prep filter family) -----------
#
# The standard repetition heuristics pretraining pipelines gate on
# (popularized by the Gopher/MassiveText filtering rules): documents
# dominated by repeated lines, repeated n-grams, or a single frequent
# n-gram are boilerplate/spam, not prose. Two shapes on purpose:
#
# - max_char_run_expr is a pure projection (one regex pass, no shuffle);
# - repetition_stats is explode + two-level aggregation — per-doc
#   distinct-counting CANNOT be a linear projection (an array-HOF form
#   is O(lines²) per doc: each distinct-line occurrence count rescans
#   the array — a 10k-line doc would do 10⁸ comparisons in one task),
#   so the scalable form shuffles on (doc_id, unit) with map-side
#   partial counts, exactly the tx_ngram_topk layout. Both shuffles key
#   on doc-scoped units: uniform, unskewable by any single hot n-gram.

def max_char_run_expr(col: Column) -> Column:
    """Length of the longest same-character run — the cheap spam tell
    ("aaaaaaa…"), as one linear regex extraction (runs can't overlap,
    so extract-all sees each once; map-side, no shuffle)."""
    runs = F.regexp_extract_all(col, F.lit(r"((.)\2*)"), 1)
    return F.coalesce(
        F.array_max(F.transform(runs, F.length)), F.lit(0)
    )


def repetition_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Per-document repetition signals: ``(id_col, n_lines,
    dup_line_frac, dup_line_char_frac, top_ngram_frac, dup_ngram_frac,
    max_char_run)``.

    - ``dup_line_frac``: fraction of (trimmed, non-empty) line
      OCCURRENCES beyond the first of their text — 0 when every line is
      unique.
    - ``dup_line_char_frac``: fraction of line CHARACTERS sitting in
      duplicated lines (all occurrences count, the Gopher reading: a
      doc that is one boilerplate line pasted 50× scores ≈ 1).
    - ``top_ngram_frac``: fraction of token positions covered by the
      single most frequent ``top_n``-gram (ties broken toward the
      higher count; 0 when the doc has fewer than ``top_n`` tokens).
    - ``dup_ngram_frac``: fraction of ``dup_n``-gram occurrences that
      are repeats of an already-seen ``dup_n``-gram.
    - ``max_char_run``: :func:`max_char_run_expr`.

    Documents whose text is NULL/empty surface with zeroed stats (they
    are the quality filter's problem, not a missing row). Tokenization
    is THE shared tokenizer (:data:`tokens_expr`); lines split on
    ``\\n`` and trim ``WS_CHARS``.

    A typical gate (the caller's policy, deliberately not baked in):
    ``dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.30 AND
    top_ngram_frac <= 0.20 AND dup_ngram_frac <= 0.30``.
    """
    base = df.select(
        F.col(id_col),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
    ).withColumn("_toks", tokens_expr(F.col("_t")))

    # r12 fusion (guide §2.3/§2.4): the previous shape ran FOUR
    # independent subtrees over `base` (char-run projection, line
    # explode, 2-gram explode, 5-gram explode) — four scans + two
    # tokenizations, three separate two-level aggregation chains (six
    # exchanges), and a four-way join on doc_id to stitch the stats
    # back together. All three unit families now ride ONE tagged
    # explode → ONE (doc, kind, unit) count → ONE per-doc conditional
    # roll-up: a single scan, a single tokenization, two exchanges,
    # zero joins. The per-doc char run travels as a singleton 'D' unit
    # (which also guarantees every input doc keeps an output row —
    # the job the per_doc join anchor used to do). Values and types are
    # bit-identical: each kind's aggregate below is the same expression
    # the dedicated chain computed, gated on its kind tag.

    def _ngrams(n: int) -> Column:
        # positions 0..ntok-n; the join separator is "\n", which no
        # token can contain (tokens are WS-split and \n ∈ WS_CHARS), so
        # distinct n-grams never collide into one joined string
        return F.when(
            F.size("_toks") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - n),
                lambda i: F.array_join(
                    F.slice("_toks", i + 1, n), "\n"
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def _unit(kind: str, u: Column, v: Column) -> Column:
        return F.struct(
            F.lit(kind).alias("k"), u.alias("u"), v.cast("int").alias("v")
        )

    _no_v = F.lit(None)
    units = base.select(
        id_col,
        F.explode(
            F.concat(
                F.array(
                    _unit("D", F.lit(""), max_char_run_expr(F.col("_t")))
                ),
                F.transform(
                    F.filter(
                        F.transform(F.split("_t", "\n"), trim_ws),
                        lambda x: x != "",
                    ),
                    lambda x: _unit("L", x, _no_v),
                ),
                F.transform(
                    _ngrams(top_n), lambda g: _unit("2", g, _no_v)
                ),
                F.transform(
                    _ngrams(dup_n), lambda g: _unit("5", g, _no_v)
                ),
            )
        ).alias("_u"),
    ).select(
        id_col,
        F.col("_u.k").alias("_k"),
        F.col("_u.u").alias("_g"),
        F.col("_u.v").alias("_v"),
    )

    counted = units.groupBy(id_col, "_k", "_g").agg(
        F.count(F.lit(1)).alias("_c"), F.first("_v").alias("_v")
    )

    def _if(kind: str, col: Column) -> Column:
        return F.when(F.col("_k") == kind, col)

    _c, _g = F.col("_c"), F.col("_g")
    stats = counted.groupBy(id_col).agg(
        F.max(_if("D", F.col("_v"))).alias("max_char_run"),
        F.sum(_if("L", _c)).alias("_n_lines"),
        F.count(_if("L", F.lit(1))).alias("_u_lines"),
        F.sum(
            _if("L", F.when(_c > 1, _c * F.length(_g)).otherwise(0))
        ).alias("_dup_chars"),
        F.sum(_if("L", _c * F.length(_g))).alias("_line_chars"),
        F.max(_if("2", _c)).alias("_m2"),
        F.sum(_if("2", _c)).alias("_tot2"),
        F.sum(
            _if("5", F.when(_c > 1, _c - 1).otherwise(0))
        ).alias("_d5"),
        F.sum(_if("5", _c)).alias("_tot5"),
    )

    return stats.select(
        id_col,
        F.coalesce("_n_lines", F.lit(0)).cast("long").alias("n_lines"),
        # count() never returns NULL, so the line fractions are gated on
        # the line SUM (NULL iff the doc had no non-empty line — the
        # rows the old left join supplied as NULL)
        F.coalesce(
            1 - F.col("_u_lines") / F.col("_n_lines"), F.lit(0.0)
        ).alias("dup_line_frac"),
        F.coalesce(
            F.col("_dup_chars") / F.col("_line_chars"), F.lit(0.0)
        ).alias("dup_line_char_frac"),
        # least() skips NULL operands, so the no-2-gram doc must NULL
        # out BEFORE the cap, not after
        F.coalesce(
            F.when(
                F.col("_m2").isNotNull(),
                F.least(
                    F.col("_m2") * top_n
                    / (F.col("_tot2") + top_n - 1),
                    F.lit(1.0),
                ),
            ),
            F.lit(0.0),
        ).alias("top_ngram_frac"),
        F.coalesce(
            F.col("_d5") / F.col("_tot5"), F.lit(0.0)
        ).alias("dup_ngram_frac"),
        "max_char_run",
    )


@register(
    "repetition_stats",
    # full DuckDB twin (r8 rotation): lines via lateral unnest + the
    # explicit-WS trim, n-grams via list_slice windows joined with \n
    # (no token can contain it), max_char_run via gaps-and-islands over
    # codepoints (RE2 has no backreferences, so Spark's ((.)\2*) regex
    # has no DuckDB mirror). Every fraction is ONE double division of
    # exact integer operands — IEEE-deterministic across engines.
    oracle=rf"""
    WITH base AS (
        SELECT doc_id, COALESCE(text, '') AS t,
               regexp_split_to_array(
                   {trim_sql("COALESCE(text, '')")}, '[{WS_SQL}]+') AS tk
        FROM documents
    ),
    runs AS (
        SELECT doc_id, COUNT(*) AS run_len
        FROM (
            SELECT doc_id, ch,
                   i - ROW_NUMBER() OVER (
                       PARTITION BY doc_id, ch ORDER BY i) AS grp
            FROM (
                SELECT doc_id, i, substring(t, CAST(i AS INT), 1) AS ch
                FROM base,
                     unnest(generate_series(1, length(t))) AS u(i)
            )
        )
        GROUP BY doc_id, ch, grp
    ),
    mcr AS (
        SELECT doc_id, CAST(MAX(run_len) AS INT) AS max_char_run
        FROM runs GROUP BY doc_id
    ),
    nz_lines AS (
        SELECT doc_id, line, COUNT(*) AS c, length(line) AS len
        FROM (
            SELECT doc_id, {trim_sql("l")} AS line
            FROM base, unnest(string_split(t, chr(10))) AS u(l)
        )
        WHERE line <> ''
        GROUP BY doc_id, line
    ),
    line_stats AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_lines,
               1 - COUNT(*) / CAST(SUM(c) AS DOUBLE) AS dup_line_frac,
               CAST(SUM(CASE WHEN c > 1 THEN c * len ELSE 0 END)
                    AS DOUBLE) / SUM(c * len) AS dup_line_char_frac
        FROM nz_lines GROUP BY doc_id
    ),
    g2 AS (
        SELECT doc_id, g, COUNT(*) AS c
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(tk) - 1),
                       i -> array_to_string(
                           list_slice(tk, i, i + 1), chr(10)))) AS g
            FROM base WHERE len(tk) >= 2
        )
        GROUP BY doc_id, g
    ),
    top2 AS (
        SELECT doc_id,
               LEAST(MAX(c) * 2 / CAST(SUM(c) + 1 AS DOUBLE), 1.0)
                   AS top_ngram_frac
        FROM g2 GROUP BY doc_id
    ),
    g5 AS (
        SELECT doc_id, g, COUNT(*) AS c
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(tk) - 4),
                       i -> array_to_string(
                           list_slice(tk, i, i + 4), chr(10)))) AS g
            FROM base WHERE len(tk) >= 5
        )
        GROUP BY doc_id, g
    ),
    dup5 AS (
        SELECT doc_id,
               SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)
                   / CAST(SUM(c) AS DOUBLE) AS dup_ngram_frac
        FROM g5 GROUP BY doc_id
    )
    SELECT b.doc_id,
           COALESCE(ls.n_lines, 0) AS n_lines,
           COALESCE(ls.dup_line_frac, 0.0) AS dup_line_frac,
           COALESCE(ls.dup_line_char_frac, 0.0) AS dup_line_char_frac,
           COALESCE(t2.top_ngram_frac, 0.0) AS top_ngram_frac,
           COALESCE(d5.dup_ngram_frac, 0.0) AS dup_ngram_frac,
           COALESCE(m.max_char_run, 0) AS max_char_run
    FROM base b
    LEFT JOIN line_stats ls USING (doc_id)
    LEFT JOIN top2 t2 USING (doc_id)
    LEFT JOIN dup5 d5 USING (doc_id)
    LEFT JOIN mcr m USING (doc_id)
    """,
)
def repetition_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver registration of :func:`repetition_stats` (rotated into
    the 50-slot window in r8): the Gopher-family repetition signals at
    their default shape (top 2-gram, dup 5-gram) over the documents
    table."""
    return repetition_stats(parallel_table(spark, sf_dir, "documents"))


# default repetition-gate thresholds (the Gopher-style rule set the
# docstrings cite); callers override per corpus
GATE_DEFAULTS = {
    "max_dup_line_frac": 0.30,
    "max_dup_line_char_frac": 0.30,
    "max_top_ngram_frac": 0.20,
    "max_dup_ngram_frac": 0.30,
    "max_char_run": 80,
}


def quality_gate(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float | None = None,
    thresholds: dict | None = None,
) -> dict:
    """The composed corpus filter: repetition signals (+ optionally the
    quality score) applied with per-rule AUDIT COUNTS — the
    observability a production scrub needs (a threshold drifting from
    dropping 2% to 40% of a crawl should page someone, not silently
    shrink the corpus).

    Returns ``{"kept": DataFrame (input rows), "audit": {rule:
    n_dropped_by_it, ..., "n_in", "n_kept"}}``. A document failing
    several rules counts once PER RULE in the audit (the counts answer
    "what is each rule doing", not "how many dropped" — that is
    ``n_in - n_kept``). One stats pass + one bounded audit aggregate;
    the kept frame is the input anti-joined against failing ids, so
    downstream plans see original columns untouched.

    ``thresholds`` overrides :data:`GATE_DEFAULTS` per key (unknown
    keys raise — a typo'd threshold silently defaulting is the worst
    failure mode for a filter). ``min_quality`` additionally applies
    :func:`quality_score_expr` ≥ the bound.
    """
    th = dict(GATE_DEFAULTS)
    for k, v in (thresholds or {}).items():
        if k not in GATE_DEFAULTS:
            raise ValueError(
                f"quality_gate: unknown threshold {k!r} "
                f"(valid: {sorted(GATE_DEFAULTS)})"
            )
        th[k] = v

    stats = repetition_stats(df, id_col=id_col, text_col=text_col)
    rules = {
        "dup_line_frac": F.col("dup_line_frac") > th["max_dup_line_frac"],
        "dup_line_char_frac":
            F.col("dup_line_char_frac") > th["max_dup_line_char_frac"],
        "top_ngram_frac": F.col("top_ngram_frac") > th["max_top_ngram_frac"],
        "dup_ngram_frac": F.col("dup_ngram_frac") > th["max_dup_ngram_frac"],
        "max_char_run": F.col("max_char_run") > th["max_char_run"],
    }
    if min_quality is not None:
        stats = stats.join(
            df.select(
                id_col,
                quality_score_expr(F.col(text_col)).alias("_q"),
            ),
            id_col,
        )
        rules["min_quality"] = F.col("_q") < F.lit(float(min_quality))

    fail_any = None
    for cond in rules.values():
        fail_any = cond if fail_any is None else (fail_any | cond)

    audit_row = stats.agg(
        F.count(F.lit(1)).alias("n_in"),
        *[
            F.sum(cond.cast("long")).alias(name)
            for name, cond in rules.items()
        ],
        F.sum((~fail_any).cast("long")).alias("n_kept"),
    ).collect()[0]
    audit = {k: int(audit_row[k] or 0) for k in audit_row.asDict()}

    failing = stats.where(fail_any).select(id_col)
    kept = df.join(failing, id_col, "left_anti")
    return {"kept": kept, "audit": audit}

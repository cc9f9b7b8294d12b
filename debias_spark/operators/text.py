"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All built-in functions — no UDFs, so the whole
pack runs inside whole-stage codegen and is fully expressible as SQL
oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small per-language function-word lists for the overlap heuristic.  Order
# matters: ties resolve in list order (en > de > es > fr), deterministically.
LANG_STOPWORDS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and", "to", "in", "is"]),
    ("de", ["der", "die", "das", "und", "zu", "ein", "ist"]),
    ("es", ["el", "la", "de", "y", "que", "un", "es"]),
    ("fr", ["le", "la", "de", "et", "les", "un", "est"]),
]

PUNCT_CLASS = r"[.,;:!?'\"]"
# BPE-ish lexer: letter runs | digit runs | single non-space symbol
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != ""))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-overlap score (count of distinct function words
    present)."""
    toks = distinct_tokens(text)
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).cast("long")
        for lang, words in LANG_STOPWORDS
    }


def lang_predict(scores: dict[str, Column]) -> Column:
    """Argmax with deterministic tie order = LANG_STOPWORDS order."""
    langs = [lang for lang, _ in LANG_STOPWORDS]
    pred = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = [scores[lg] for lg in langs[langs.index(lang) + 1 :]]
        cond = scores[lang] >= F.greatest(*later) if len(later) > 1 else scores[lang] >= later[0]
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return pred


def whitespace_token_count(text: Column) -> Column:
    """Token count on whitespace runs; empty/blank text counts 0."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    ).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Lexer-style token count (letter runs / digit runs / symbols)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long")


def punct_ratio(text: Column) -> Column:
    n = F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return n.cast("double") / F.nullif(F.length(text), F.lit(0)).cast("double")


def stopword_ratio(text: Column) -> Column:
    """Share of tokens that are (any-language) function words."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    all_sw = sorted({w for _, words in LANG_STOPWORDS for w in words})
    sw = F.array(*[F.lit(w) for w in all_sw])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits.cast("double") / F.nullif(F.size(toks), F.lit(0)).cast("double")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    reasonable stopword share.  Weights are explicit so the SQL oracle can
    restate them verbatim."""
    n_tok = whitespace_token_count(text)
    len_ok = (
        F.when((n_tok >= 10) & (n_tok <= 1000), F.lit(1.0))
        .when(n_tok > 0, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    p = F.coalesce(punct_ratio(text), F.lit(0.0))
    s = F.coalesce(stopword_ratio(text), F.lit(0.0))
    return F.round(0.5 * len_ok + 0.25 * (1.0 - F.least(p * 10, F.lit(1.0))) + 0.25 * F.least(s * 5, F.lit(1.0)), 4) + 0.0


def normalize_for_fingerprint(text: Column) -> Column:
    """Canonical form: lowercase, whitespace runs collapsed, trimmed."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint of the normalized text (md5 — stable across
    engines and platforms; the exact-dedup shuffle key at scale)."""
    return F.md5(normalize_for_fingerprint(text))


def normalize_strict(text: Column) -> Column:
    """The Z7 'fuzzy-exact' canonical form: lowercase, non-alphanumerics
    STRIPPED, space runs collapsed, trimmed — stricter than
    ``normalize_for_fingerprint`` (which keeps punctuation).  The DuckDB
    twin is ``NORMALIZE_STRICT_DUCK``; keep the two spellings in
    lockstep, they are hash-compared by every caller's oracle.
    (llm_ops4's dedup_exact_normalized predates this helper and inlines
    the identical expression — consolidate when that key next changes.)"""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), r"[^a-z0-9 ]", ""), r" +", " "
        )
    )


# DuckDB spelling of normalize_strict over a column expression {x}
NORMALIZE_STRICT_DUCK = (
    "trim(regexp_replace(regexp_replace(lower({x}), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g'))"
)


# ---------------------------------------------------------------------------
# X53 quality gate, factored so the corpus-build capstone (Z75) provably
# applies the IDENTICAL keep/drop rule chain the standalone key pins.
# ---------------------------------------------------------------------------

def quality_features(text: Column) -> tuple[Column, Column]:
    """(n_tokens, n_punct) — the two measured features of the X53 quality
    rule chain (n_chars comes from the table column)."""
    n_tokens = F.size(F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,!?;:]", ""))
    return n_tokens, n_punct


def quality_verdict(n_chars: Column, n_tokens: Column, n_punct: Column) -> Column:
    """First-match-wins quality verdict (length -> word-shape ->
    punctuation density) over pre-computed feature columns.  The DuckDB
    twin is ``QUALITY_VERDICT_DUCK``; keep the two in lockstep."""
    return (
        F.when(n_chars < 30, "too_short")
        .when(
            (n_tokens == 0)
            | (n_chars * 1.0 / F.greatest(n_tokens, F.lit(1)) > 12),
            "long_words",
        )
        .when(n_punct * 1.0 / F.greatest(n_chars, F.lit(1)) > 0.1, "punct_heavy")
        .otherwise("keep")
    )


# DuckDB spellings over column expressions {x} / feature names
QUALITY_TOKENS_DUCK = (
    "len(list_filter(string_split_regex(lower({x}), '\\s+'), x -> x <> ''))"
)
QUALITY_PUNCT_DUCK = "length(regexp_replace({x}, '[^.,!?;:]', '', 'g'))"
QUALITY_VERDICT_DUCK = """CASE
                 WHEN {n_chars} < 30 THEN 'too_short'
                 WHEN {n_tokens} = 0
                   OR {n_chars} * 1.0 / greatest({n_tokens}, 1) > 12
                   THEN 'long_words'
                 WHEN {n_punct} * 1.0 / greatest({n_chars}, 1) > 0.1
                   THEN 'punct_heavy'
                 ELSE 'keep'
               END"""


def word_ngrams_frame(docs, n: int, id_col: str = "doc_id", text_col: str = "text"):
    """DISTINCT (id, gram) rows of n-token windows per document — the
    contamination-audit gram build (Y12), factored out so the bloom
    prefilter variant (Y72) provably screens the IDENTICAL gram set.

    r13 spelling: grams are built as a pure ARRAY expression (slice over
    the token array per window position, de-duplicated per doc with
    array_distinct before the explode) — ZERO exchanges, where the old
    lead()-window build paid a per-doc sort shuffle plus a global
    distinct shuffle over the full gram stream.  Values identical:
    windows are consecutive tokens of the same array, and per-doc
    distinct IS global distinct because the doc id is part of the key."""
    from pyspark.sql import functions as F

    from debias_spark.operators.dedup import word_tokens

    # the token array is projected ONCE per row before the window
    # transform: a lambda that captured the tokenization expression
    # would re-tokenize the document per window position (measured 5x
    # slower than the window build; CollapseProject keeps the split out
    # of the lambda because it is non-cheap and multiply-referenced).
    # NO fan_out here: callers with scan-shaped input apply it themselves
    # (fan_out's partition probe compiles the physical plan, which is
    # cheap on a scan but measurably expensive on deep mid-pipeline
    # frames like the corpus builds' s2 — A/B'd at sf0.1).
    ex = docs.select(id_col, word_tokens(F.col(text_col)).alias("_toks"))
    t = F.col("_toks")
    grams = F.when(
        F.size(t) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return ex.select(id_col, F.explode(grams).alias("gram"))

"""Text extraction + analysis operators over web-page/document tables.

The north rule requires per-url extracted text to be **byte-identical** to the
reference extractor. The reference (GDAL) has no HTML extractor — the
"reference extractor" here is the FIXTURES.md §1 spec, implemented exactly
once in :func:`extract_text_py` and used both by the synthetic generator
(data/pages.py) and by the engine operator (:func:`extract_text`), so the
invariant ``text == extract_text(html)`` is checkable end-to-end.

All other operators are training-data-pipeline text analysis over a
``documents``-shaped table ``(doc_id, text, lang, source, n_chars)``:

* ``token_count``     — whitespace tokens + a BPE-ish regex token count
* ``quality_score``   — length / punctuation / stopword-ratio heuristics
* ``lang_id``         — stopword-profile n-gram-free heuristic language ID
* ``fingerprint``     — polynomial rolling hash over word tokens

Design: every operator is a pure Column expression (JVM-side, whole-stage
codegen) — NO Python in the hot path; each has an ANSI-SQL mirror
(``sql_*``) so the DuckDB oracle evaluates the *same formula*, which is the
correctness contract of the driver gate.

Reference parity notes: the LIKE/ILIKE case-sensitivity split mirrors
ogr/swq_op_general.cpp:41-95,1102-1111; the md5-based token hashing plays the
role GDAL's swq string ops leave to the SQLite dialect.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Reference extractor (FIXTURES.md §1): title + "\n" + <p> bodies joined "\n"
# ---------------------------------------------------------------------------

_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
_P_RE = re.compile(r"<p>(.*?)</p>", re.S)


def extract_text_py(html: bytes) -> str:
    """THE reference extractor: title + "\\n" + paragraph texts joined "\\n".

    Single source of truth — the generator builds html around a known text
    and this function must invert it byte-identically (north rule).
    """
    s = html.decode("utf-8")
    title = _TITLE_RE.search(s)
    parts = [title.group(1)] if title else []
    parts.extend(_P_RE.findall(s))
    return "\n".join(parts)


def extract_text(html_col: Column) -> Column:
    """Column form of the reference extractor.

    Pure JVM regexp (no Python): decode utf-8 → pull <title> and all <p>
    bodies → join with newline. `regexp_extract_all` keeps document order,
    matching the sequential scan of the python mirror. `(?s)` mirrors the
    mirror's re.S (titles/paragraphs may span newlines). A document with NO
    <title> tag contributes nothing (title → NULL, skipped by concat_ws),
    while `<title></title>` contributes an empty string — exactly the
    python-mirror distinction between "no match" and "empty group".
    """
    s = html_col.cast("string")
    has_title = s.rlike("(?s)<title>.*?</title>")
    title = F.when(
        has_title, F.regexp_extract(s, "(?s)<title>(.*?)</title>", 1)
    ).otherwise(F.lit(None).cast("string"))
    paras_arr = F.regexp_extract_all(s, F.lit("(?s)<p>(.*?)</p>"), F.lit(1))
    paras = F.when(
        F.size(paras_arr) > 0, F.array_join(paras_arr, "\n")
    ).otherwise(F.lit(None).cast("string"))
    return F.concat_ws("\n", title, paras)


SQL_EXTRACT_TEXT = (
    "concat_ws(chr(10), "
    "CASE WHEN regexp_matches(decode(html), '(?s)<title>.*?</title>') "
    "THEN regexp_extract(decode(html), '(?s)<title>(.*?)</title>', 1) "
    "ELSE NULL END, "
    "CASE WHEN len(regexp_extract_all(decode(html), '(?s)<p>(.*?)</p>', 1)) > 0 "
    "THEN array_to_string(regexp_extract_all(decode(html), '(?s)<p>(.*?)</p>', 1), chr(10)) "
    "ELSE NULL END)"
)


# ---------------------------------------------------------------------------
# Tokenization (whitespace + BPE-ish regex) — portable Spark/DuckDB semantics
# ---------------------------------------------------------------------------

# BPE-ish token classes: letter runs | digit runs | single non-alnum-non-space.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count = words separated by runs of spaces."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, " +"))
    ).cast("long")


def sql_ws_token_count(text_expr: str) -> str:
    return (
        f"(case when trim({text_expr}) = '' then 0 else "
        f"len(string_split_regex(trim({text_expr}), ' +')) end)::bigint"
    )


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count via regexp matches (letters|digits|punct).

    Operates on the Column argument itself (a previous version built the
    expression with a hardcoded ``text`` column name, silently miscounting
    on any renamed column)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0))
    ).cast("long")


def sql_bpe_token_count(text_expr: str) -> str:
    return f"len(regexp_extract_all({text_expr}, '{BPE_TOKEN_PATTERN}', 0))::bigint"


# ---------------------------------------------------------------------------
# Quality scoring — length / punctuation / stopword ratios
# ---------------------------------------------------------------------------

STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"]


def _count_word(text: Column, w: str) -> Column:
    # word-boundary count via regexp; \b is identical in Java and RE2.
    # Column-based (not F.expr) so renamed text columns count correctly.
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(f"\\b{w}\\b"), F.lit(0))
    )


def quality_columns(df: DataFrame, text: str = "text") -> DataFrame:
    """Add (n_chars_m, n_ws_tokens, punct_ratio, stopword_ratio, q_score).

    q_score is a deterministic 0..1 heuristic: short docs and punctuation-
    heavy docs score low, stopword-bearing prose scores high. Every term is
    closed-form so the oracle reproduces it exactly (rounded to 6 dp).
    """
    from gdal_spark.functions import stable_round

    t = F.col(text)
    n_chars = F.length(t)
    n_tokens = ws_token_count(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit("[^A-Za-z0-9 ]"), F.lit(0)))
    stop_hits = None
    for w in STOPWORDS:
        c = _count_word(t, w)
        stop_hits = c if stop_hits is None else stop_hits + c
    punct_ratio = stable_round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = stable_round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6)
    q = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * F.lit(0.2)
    )
    return df.select(
        "*",
        n_chars.cast("long").alias("n_chars_m"),
        n_tokens.alias("n_ws_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        stable_round(q, 6).alias("q_score"),
    )


def sql_quality_select(text_expr: str = "text") -> dict[str, str]:
    """DuckDB fragments mirroring quality_columns, keyed by output column."""
    n_chars = f"length({text_expr})"
    n_tokens = sql_ws_token_count(text_expr)
    n_punct = f"len(regexp_extract_all({text_expr}, '[^A-Za-z0-9 ]', 0))"
    stop_hits = " + ".join(
        f"len(regexp_extract_all(lower({text_expr}), '\\b{w}\\b', 0))"
        for w in STOPWORDS
    )
    from gdal_spark.functions import sql_stable_round

    # all arithmetic forced to DOUBLE (bare decimal literals are DECIMAL in
    # DuckDB); rounding via the cross-engine stable floor form
    punct_ratio = sql_stable_round(
        f"({n_punct})::double / greatest({n_chars}, 1)::double", 6
    )
    stop_ratio = sql_stable_round(
        f"({stop_hits})::double / greatest({n_tokens}, 1)::double", 6
    )
    q = sql_stable_round(
        f"least(({n_tokens})::double / 100.0::double, 1.0::double) * 0.5::double"
        f" + least(({stop_ratio}) * 5.0::double, 1.0::double) * 0.3::double"
        f" + (1.0::double - least(({punct_ratio}) * 10.0::double, 1.0::double)) * 0.2::double",
        6,
    )
    return {
        "n_chars_m": f"({n_chars})::bigint",
        "n_ws_tokens": f"({n_tokens})::bigint",
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "q_score": q,
    }


# ---------------------------------------------------------------------------
# Language ID — stopword-profile heuristic (deterministic, SQL-mirrorable)
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "die", "und", "nicht"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "los", "que", "y"],
    "pt": ["o", "os", "uma", "não"],
}


def lang_id(df: DataFrame, text: str = "text", out: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax over per-language marker-word counts,
    ties → 'und' if zero hits else lexicographically-first language.
    Deterministic closed form → exact oracle parity.
    """
    scores = []
    for lang, words in sorted(LANG_MARKERS.items()):
        s = None
        for w in words:
            c = _count_word(F.col(text), w)
            s = c if s is None else s + c
        scores.append(F.struct(s.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    pred = F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"])
    return df.withColumn(out, pred)


def sql_lang_id(text_expr: str = "text") -> str:
    cases = []
    for lang, words in sorted(LANG_MARKERS.items()):
        s = " + ".join(
            f"len(regexp_extract_all(lower({text_expr}), '\\b{w}\\b', 0))"
            for w in words
        )
        cases.append((lang, f"({s})"))
    # argmax with lexicographic tie-break == array_max over (score, lang)
    # structs because Spark orders structs lexicographically field-by-field
    # and for equal scores picks the LARGEST lang... careful: array_max picks
    # max (score, lang), so equal-score tie → max lang string. Mirror that.
    struct_list = ", ".join(f"({s}, '{lang}')" for lang, s in cases)
    return (
        f"(select case when max(s.sc) over () <= 0 then 'und' else s.lg end "
        f"from (values {struct_list}) as s(sc, lg) "
        f"order by s.sc desc, s.lg desc limit 1)"
    )


# ---------------------------------------------------------------------------
# Document fingerprint — polynomial rolling hash over whitespace tokens
# ---------------------------------------------------------------------------

FP_BASE = 1000003
FP_MOD = 2147483647  # 2^31 - 1


def fingerprint(text: Column) -> Column:
    """Rolling hash: fold over tokens of (acc * B + token_h) mod P where
    token_h = first-8-hex-digits of md5(token). Pure Spark `aggregate`
    (JVM fold) — deterministic, SQL-mirrorable via DuckDB list_reduce.
    """
    toks = F.split(F.trim(text), " +")
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * F.lit(FP_BASE)
            + F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        ) % F.lit(FP_MOD),
    )


def sql_fingerprint(text_expr: str = "text") -> str:
    return (
        f"list_reduce(list_prepend(0::bigint, "
        f"list_transform(string_split_regex(trim({text_expr}), ' +'), "
        f"t -> ('0x' || substring(md5(t), 1, 8))::bigint)), "
        f"(acc, h) -> (acc * {FP_BASE} + h) % {FP_MOD})"
    )


# ---------------------------------------------------------------------------
# Repetition metrics (Gopher-style quality rules: duplicate-line fraction,
# top-word mass) — pure column math, SQL-mirrored
# ---------------------------------------------------------------------------

def repetition_columns(df: DataFrame, text: str = "text") -> DataFrame:
    """(n_lines, dup_line_frac, top_word_frac): the core Gopher repetition
    signals — fraction of non-unique lines and the mass of the most
    frequent word. O(n²) list ops per doc, identical formula to the SQL
    mirror (docs are short; at scale this is still map-only column work)."""
    lines = F.split(F.col(text), "\n")
    n_lines = F.size(lines)
    dup_frac = (
        (n_lines - F.size(F.array_distinct(lines))).cast("double")
        / n_lines.cast("double")
    )
    words = F.split(F.trim(F.col(text)), " +")
    counts = F.transform(
        words, lambda w: F.size(F.filter(words, lambda v: v == w))
    )
    top_frac = F.array_max(counts).cast("double") / F.size(words).cast("double")
    return df.withColumn("n_lines", n_lines.cast("long")).withColumn(
        "dup_line_frac", dup_frac
    ).withColumn("top_word_frac", top_frac)


def sql_repetition_select(text_expr: str = "text") -> dict[str, str]:
    lines = f"string_split({text_expr}, chr(10))"
    words = f"string_split_regex(trim({text_expr}), ' +')"
    counts = (
        f"list_transform({words}, w -> len(list_filter({words}, v -> v = w)))"
    )
    return {
        "n_lines": f"len({lines})::bigint",
        "dup_line_frac": (
            f"(len({lines}) - len(list_distinct({lines})))::double"
            f" / len({lines})::double"
        ),
        "top_word_frac": (
            f"list_max({counts})::double / len({words})::double"
        ),
    }


# ---------------------------------------------------------------------------
# PII scrubbing — email / phone / IPv4 redaction (map-only regexp_replace
# chains; patterns restricted to the Java-regex ∩ RE2 common dialect so the
# DuckDB oracle applies the byte-identical transformation)
# ---------------------------------------------------------------------------

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(text: Column) -> Column:
    """Redact emails → [EMAIL], phones → [PHONE], IPv4 → [IP]. Email runs
    first (its domain part would otherwise be chewed up by the IP rule for
    numeric hosts). Pure JVM regexp — map-only at any scale."""
    out = F.regexp_replace(text, PII_EMAIL, "[EMAIL]")
    out = F.regexp_replace(out, PII_PHONE, "[PHONE]")
    return F.regexp_replace(out, PII_IPV4, "[IP]")


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) BEFORE scrubbing."""
    def n(pat):
        return F.size(
            F.regexp_extract_all(text, F.lit(pat), F.lit(0))
        ).cast("long")

    return n(PII_EMAIL), n(PII_PHONE), n(PII_IPV4)


def sql_pii_scrub(expr: str) -> str:
    return (
        f"regexp_replace(regexp_replace(regexp_replace({expr}, "
        f"'{PII_EMAIL}', '[EMAIL]', 'g'), "
        f"'{PII_PHONE}', '[PHONE]', 'g'), "
        f"'{PII_IPV4}', '[IP]', 'g')"
    )


def sql_pii_counts(expr: str) -> tuple[str, str, str]:
    def n(pat):
        return f"len(regexp_extract_all({expr}, '{pat}', 0))::bigint"

    return n(PII_EMAIL), n(PII_PHONE), n(PII_IPV4)


# ---------------------------------------------------------------------------
# Corpus-level LINE dedup (CCNet / RefinedWeb style): hash every normalized
# pseudo-line, count DISTINCT documents per line across the whole corpus,
# strip lines that appear in >= min_docs documents (boilerplate removal),
# reassemble the document in order.
#
# The fixture's documents are single-line word soup, so "lines" are
# deterministic non-overlapping word windows (line_words each) — the same
# derivation the chunking operator uses; on real web text you'd split on
# newline first and fall through to the same pipeline.
#
# Scale: one explode (x nlines), ONE shuffle keyed on the 16-byte line md5
# with map-side partial agg (countDistinct via the doc-id set is per-line
# tiny), one hash-join back, one groupBy(doc_id) to reassemble. No Python.
# ---------------------------------------------------------------------------

LINE_WORDS = 12


def line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    line_words: int = LINE_WORDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Output per document: (id_col, n_lines, n_removed, n_kept_words,
    clean_digest) — clean_digest = md5 of the space-rejoined kept lines
    (empty string when everything was boilerplate)."""
    toks = docs.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), " +").alias("_t"),
    ).withColumn("_nt", F.size("_t"))
    n_lines = F.ceil(F.col("_nt") / F.lit(line_words)).cast("long")
    lines = toks.withColumn(
        "_idx", F.explode(F.sequence(F.lit(0), n_lines - 1))
    ).select(
        id_col,
        "_idx",
        F.array_join(
            F.slice(F.col("_t"), F.col("_idx") * line_words + 1, line_words),
            " ",
        ).alias("_line"),
        F.least(
            F.lit(line_words), F.col("_nt") - F.col("_idx") * line_words
        ).alias("_lw"),
    )
    cnt = (
        lines.groupBy(F.md5(F.col("_line")).alias("_lh"))
        .agg(F.countDistinct(id_col).alias("_nd"))
    )
    keyed = lines.withColumn("_lh", F.md5(F.col("_line"))).join(cnt, "_lh")
    keep = F.col("_nd") < F.lit(min_docs)
    kept_struct = F.when(keep, F.struct(F.col("_idx"), F.col("_line")))
    return (
        keyed.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(keep, F.lit(0)).otherwise(F.lit(1))).alias("n_removed"),
            F.sum(F.when(keep, F.col("_lw")).otherwise(F.lit(0))).alias(
                "n_kept_words"
            ),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s.getField("_line"),
                    ),
                    " ",
                )
            ).alias("clean_digest"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-document EXACT-SUBSTRING dedup (ExactSubstr, Lee et al. 2022, lite):
# rolling fixed-width character windows with stride; two documents sharing
# any window hash share a verbatim >=window_chars span.  The full suffix-
# array construction is replaced by the bucketed window-hash equi-join —
# the candidate-generation shape that scales (explode x len/stride, 16-byte
# keys, AQE-splittable hot hashes), trading exact span extents for span
# EXISTENCE, which is what the filter decision needs.
# ---------------------------------------------------------------------------

SUBSTR_CHARS = 60
SUBSTR_STRIDE = 20


def substring_dup_stats(
    docs: DataFrame,
    window_chars: int = SUBSTR_CHARS,
    stride: int = SUBSTR_STRIDE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per document: (id_col, n_windows, n_dup_windows, n_partners).

    n_dup_windows = this document's window positions whose window text
    occurs in >= 2 distinct documents; n_partners = distinct OTHER
    documents sharing at least one window.  Documents shorter than
    window_chars emit zero windows (all-zero row)."""
    base = docs.select(F.col(id_col), F.col(text_col).alias("_x"))
    n_win = F.floor(
        (F.length("_x") - F.lit(window_chars)) / F.lit(stride)
    ).cast("long") + 1
    wins = (
        base.filter(F.length("_x") >= window_chars)
        .withColumn("_w", F.explode(F.sequence(F.lit(0), n_win - 1)))
        .select(
            id_col,
            "_w",
            F.md5(
                F.substring(
                    F.col("_x"), F.col("_w") * stride + 1, window_chars
                )
            ).alias("_wh"),
        )
    )
    per_hash = wins.groupBy("_wh").agg(
        F.countDistinct(id_col).alias("_nd")
    )
    dup_w = (
        wins.join(per_hash, "_wh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("_nd") >= 2, 1).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
    )
    dw = wins.select(F.col(id_col).alias("_da"), "_wh").distinct()
    partners = (
        dw.alias("a")
        .join(dw.withColumnRenamed("_da", "_db").alias("b"), "_wh")
        .filter(F.col("_da") != F.col("_db"))
        .select("_da", "_db")
        .distinct()
        .groupBy("_da")
        .agg(F.count(F.lit(1)).alias("n_partners"))
    )
    return (
        docs.select(F.col(id_col))
        .join(dup_w, id_col, "left")
        .join(partners, F.col(id_col) == F.col("_da"), "left")
        .select(
            id_col,
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce("n_partners", F.lit(0)).alias("n_partners"),
        )
    )


# ---------------------------------------------------------------------------
# C4 page/line cleaning (Raffel et al. 2020 §2.2, the published C4 rules as
# implemented in tensorflow_datasets c4_utils.py): keep lines that end in a
# terminal punctuation mark, have >= 5 words, and don't mention javascript;
# drop whole pages containing "lorem ipsum" or a curly brace, or with fewer
# than 3 sentences after line filtering.
#
# Scale: pure JVM column work — one split, HOF filter/aggregate, no explode,
# no shuffle; linear map over any corpus size.
# ---------------------------------------------------------------------------

C4_MIN_WORDS = 5
C4_MIN_SENTENCES = 3
C4_TERMINAL_RE = '[.!?"]$'


def c4_filter_columns(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document C4 cleaning stats: (id_col, n_lines, n_kept_lines,
    n_kept_words, n_sentences, keep_doc, clean_digest).  clean_digest is
    md5 of the kept lines rejoined with newlines ('' when nothing
    survives); keep_doc applies the page-level rules on the ORIGINAL text
    (lorem ipsum / curly brace) plus the >= 3 sentence floor on the
    cleaned text."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(C4_TERMINAL_RE)
        & (F.size(F.regexp_extract_all(ln, F.lit("[^ ]+"), F.lit(0)))
           >= C4_MIN_WORDS)
        & (F.locate("javascript", F.lower(ln)) == 0),
    )
    staged = df.select(
        F.col(id_col),
        F.col(text_col).alias("_raw"),
        F.size(lines).cast("long").alias("n_lines"),
        kept.alias("_kept"),
    ).select(
        id_col,
        "_raw",
        "n_lines",
        F.size("_kept").cast("long").alias("n_kept_lines"),
        F.aggregate(
            "_kept",
            F.lit(0).cast("long"),
            lambda acc, ln: acc + F.size(
                F.regexp_extract_all(ln, F.lit("[^ ]+"), F.lit(0))
            ),
        ).alias("n_kept_words"),
        F.array_join("_kept", "\n").alias("_clean"),
    )
    n_sent = F.size(
        F.regexp_extract_all(F.col("_clean"), F.lit("[.!?]"), F.lit(0))
    ).cast("long")
    return staged.select(
        id_col,
        "n_lines",
        "n_kept_lines",
        "n_kept_words",
        n_sent.alias("n_sentences"),
        (
            (n_sent >= C4_MIN_SENTENCES)
            & (F.locate("lorem ipsum", F.lower(F.col("_raw"))) == 0)
            & (F.locate("{", F.col("_raw")) == 0)
        ).alias("keep_doc"),
        F.md5(F.col("_clean")).alias("clean_digest"),
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, Appendix A1.1 — the published
# MassiveText document filters): word-count window, mean-word-length window,
# symbol-to-word ratio (# and ellipsis), bullet-start / ellipsis-end line
# ratios, alphabetic-word fraction, stop-word floor.
#
# Scale: single projection of JVM regexp/HOF column math — no shuffle, no
# Python; linear map at any corpus size.
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_columns(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Gopher quality metrics + keep flag: (id_col, n_words,
    mean_word_len, symbol_ratio, frac_alpha_words, frac_bullet_lines,
    frac_ellipsis_lines, n_stopwords, keep_doc).  Ratio columns are raw
    doubles — callers gate/round as needed; keep_doc applies the published
    thresholds (50..100k words, mean len 3..10, symbols <0.1, bullets <0.9,
    ellipsis <0.3, alpha >=0.8, >=2 distinct stop words)."""
    words = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), F.lit(0))
    lines = F.split(F.col(text_col), "\n")
    staged = df.select(
        F.col(id_col),
        F.col(text_col).alias("_raw"),
        words.alias("_w"),
        lines.alias("_l"),
    ).select(
        id_col,
        F.size("_w").cast("long").alias("n_words"),
        F.aggregate(
            "_w", F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        ).alias("_wlen"),
        F.size(
            F.filter("_w", lambda w: w.rlike("[A-Za-z]"))
        ).cast("long").alias("_n_alpha"),
        (
            F.size(F.regexp_extract_all("_raw", F.lit("#"), F.lit(0)))
            + F.size(F.regexp_extract_all("_raw", F.lit(r"\.\.\."), F.lit(0)))
        ).cast("long").alias("_n_sym"),
        F.size("_l").cast("long").alias("_n_lines"),
        F.size(
            F.filter("_l", lambda ln: ln.substr(F.lit(1), F.lit(2)) == "- ")
        ).cast("long").alias("_n_bullet"),
        F.size(
            F.filter("_l", lambda ln: ln.rlike(r"\.\.\.$"))
        ).cast("long").alias("_n_ell_end"),
        sum(
            (
                F.array_contains(
                    F.transform("_w", F.lower), F.lit(sw)
                ).cast("int")
                for sw in GOPHER_STOPWORDS
            ),
            F.lit(0),
        ).cast("long").alias("n_stopwords"),
    )
    nw = F.col("n_words").cast("double")
    nl = F.col("_n_lines").cast("double")
    mean_len = F.col("_wlen") / nw
    sym = F.col("_n_sym") / nw
    alpha = F.col("_n_alpha") / nw
    bullet = F.col("_n_bullet") / nl
    ell = F.col("_n_ell_end") / nl
    return staged.select(
        id_col,
        "n_words",
        mean_len.alias("mean_word_len"),
        sym.alias("symbol_ratio"),
        alpha.alias("frac_alpha_words"),
        bullet.alias("frac_bullet_lines"),
        ell.alias("frac_ellipsis_lines"),
        "n_stopwords",
        (
            (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
            & (mean_len >= 3.0) & (mean_len <= 10.0)
            & (sym < 0.1) & (bullet < 0.9) & (ell < 0.3)
            & (alpha >= 0.8) & (F.col("n_stopwords") >= 2)
        ).alias("keep_doc"),
    )


# ---------------------------------------------------------------------------
# Training-mix upsampling (the published LLM data-mixture recipe: per-source
# epoch weights, e.g. GPT-3 Table 2.2 / Gopher A3.1): a source with weight
# w is repeated floor(w) times plus one more with probability frac(w),
# decided DETERMINISTICALLY per document from its id hash — exact, seedless,
# reproducible resampling.
#
# Scale: map-only (hash + map lookup + sequence explode); output size is
# input × mean weight, no shuffle.
# ---------------------------------------------------------------------------

def mix_upsample(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    default_weight: float = 1.0,
) -> DataFrame:
    """One output row per (document, epoch copy): all input columns plus
    ``copy_idx`` (1-based).  Unknown sources get ``default_weight``.
    The fractional epoch keeps a document iff u(doc) < frac(w), where
    u = first-8-hex of md5(id) / 2^32 — uniform, per-doc stable."""
    pairs = []
    for k, v in weights.items():
        pairs.extend([F.lit(k), F.lit(float(v))])
    wmap = F.create_map(*pairs)
    w = F.coalesce(
        F.element_at(wmap, F.col(source_col)), F.lit(float(default_weight))
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("double")
        / F.lit(4294967296.0)
    )
    n_copies = (
        F.floor(w).cast("long")
        + (u < (w - F.floor(w))).cast("long")
    )
    return (
        docs.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("_n_copies"))),
        )
        .drop("_n_copies")
    )


# ---------------------------------------------------------------------------
# Model-based quality scoring plumbing (the fasttext/DCLM-style linear
# quality classifier every published curation pipeline runs): hashed
# bag-of-words features, a broadcast weight table, sigmoid score, threshold
# keep.  The weights here are a deterministic synthetic vector (Knuth
# multiplicative hash of the feature index) — the PLUMBING (hashing, feature
# join, per-doc reduction) is the real, at-scale part; swap the weight
# table for trained parameters.
#
# Scale: explode(tokens) → broadcast join on the feature id → one groupBy
# per doc.  Weights are dyadic rationals (k/1024), so the per-doc sum is
# EXACT in float regardless of reduction order — the score is
# cross-engine-deterministic.
# ---------------------------------------------------------------------------

QUALITY_DIM = 1024


def quality_weights_df(spark) -> DataFrame:
    """(feat, w) — w = ((feat * 2654435761) % 1024) / 1024 - 0.5."""
    return spark.range(QUALITY_DIM).select(
        F.col("id").alias("feat"),
        (
            ((F.col("id") * F.lit(2654435761)) % QUALITY_DIM)
            .cast("double") / QUALITY_DIM - F.lit(0.5)
        ).alias("w"),
    )


def linear_quality_score(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document linear quality score: z = Σ w[h(token)] / n_tokens,
    score = sigmoid(z), keep = z > 0.  h = first-8-hex of md5(token) mod
    the weight dimension.  Output: (id_col, n_tokens, n_feats, score,
    keep_doc)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), " +")).alias("_tok"),
    ).select(
        id_col,
        (
            F.conv(F.substring(F.md5("_tok"), 1, 8), 16, 10).cast("long")
            % QUALITY_DIM
        ).alias("feat"),
    )
    joined = toks.join(F.broadcast(weights), "feat")
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("feat").cast("long").alias("n_feats"),
        F.sum("w").alias("_zsum"),
    )
    z = F.col("_zsum") / F.col("n_tokens").cast("double")
    return agg.select(
        id_col, "n_tokens", "n_feats",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("score"),
        (z > 0.0).alias("keep_doc"),
    )


# ---------------------------------------------------------------------------
# Domain blocklist filtering (the UT1/RefinedWeb-style URL curation step):
# a host matches a blocklist entry if the entry equals the host OR any of
# its registrable parent domains.  At-scale shape: explode the host's
# suffix chain (bounded by label count) and equi-join the blocklist —
# never a LIKE/endswith join (which would be a nested loop).
# ---------------------------------------------------------------------------

def host_suffix_chain(host: F.Column, max_labels: int = 6) -> F.Column:
    """['a.b.co', 'b.co', 'co'] — every dot-suffix of the host, bounded."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.filter(
        F.transform(
            F.sequence(F.lit(0), F.least(n - 1, F.lit(max_labels - 1))),
            lambda i: F.array_join(F.slice(parts, i + 1, max_labels * 4), "."),
        ),
        lambda s: s != "",
    )


def blocklist_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    entry_col: str = "domain",
) -> DataFrame:
    """Append (blocked boolean, block_match string|null) per document.
    Suffix-chain explode + broadcast equi-join on the blocklist entry,
    fold back with a min() so one row per doc survives."""
    chain = docs.select(
        F.col(id_col),
        F.posexplode(
            host_suffix_chain(F.col(host_col))
        ).alias("_sfx_pos", "_sfx"),
    )
    hits = (
        chain.join(
            F.broadcast(
                blocklist.select(F.col(entry_col).alias("_sfx"))
            ),
            "_sfx",
        )
        .groupBy(id_col)
        .agg(F.min(F.struct("_sfx_pos", "_sfx")).alias("_hit"))
        .select(id_col, F.col("_hit._sfx").alias("block_match"))
    )
    return docs.join(hits, id_col, "left").withColumn(
        "blocked", F.col("block_match").isNotNull()
    )


# ---------------------------------------------------------------------------
# Unigram LM scoring (the CCNet perplexity-filter idea with the corpus's
# own unigram model as the LM): score(doc) = mean log p(token), p from the
# corpus token frequencies.  Per-token log-probs are quantized to micro
# NATS in the frequency table (one float op per DISTINCT token), so the
# per-document reduction is integer-exact and order-free.
#
# Scale: one shuffle to build the frequency table, one equi-join back
# (AQE broadcasts it when small), one groupBy(doc).
# ---------------------------------------------------------------------------

def unigram_lm_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, n_tokens, sum_logp_micro, avg_logp, ppl) — avg_logp in
    nats (micro-quantized), ppl = exp(-avg_logp)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), " +")).alias("tok"),
    )
    n_total = toks.count()
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    freq = freq.select(
        "tok",
        F.floor(
            F.log(F.col("n_tok").cast("double") / float(n_total)) * 1e6
        ).cast("long").alias("logp_micro"),
    )
    agg = (
        toks.join(freq, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("logp_micro").cast("long").alias("sum_logp_micro"),
        )
    )
    avg = F.col("sum_logp_micro").cast("double") / 1e6 / F.col("n_tokens")
    return agg.select(
        id_col, "n_tokens", "sum_logp_micro",
        avg.alias("avg_logp"),
        F.exp(-avg).alias("ppl"),
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (Robertson–Spärck Jones probabilistic relevance;
# the Okapi BM25 formula as published in Robertson & Zaragoza 2009, "The
# Probabilistic Relevance Framework: BM25 and Beyond").  The corpus-scale
# search primitive a training-data pipeline uses for targeted slicing
# (benchmark-adjacent retrieval, topic mining).
#
# score(D, Q) = Σ_t IDF(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
# with the standard "plus-one" IDF = ln(1 + (N − df + 0.5)/(df + 0.5)).
#
# Exactness contract: k1 = 1.25 and b = 0.75 are dyadic, every float op is
# a single correctly-rounded IEEE op in the same order on both engines,
# and the per-term score is micro-quantized to 2^20 integer units BEFORE
# the per-doc sum (order-free) — the engine's established pattern for
# cross-engine-exact float aggregation (unigram LM, DSIR).
# ---------------------------------------------------------------------------

BM25_K1 = 1.25
BM25_B = 0.75
_BM25_MICRO = float(1 << 20)


def bm25_topk(
    docs: DataFrame, terms: list[str], top_k: int,
    id_col: str = "doc_id", text: str = "text",
) -> DataFrame:
    """Top-k docs by BM25 → (doc_id, score_micro).

    Scale shape: tokenize + per-term tf are map-only JVM HOFs over a
    BROADCAST 1-row-per-term explode (|Q| rows); df/N/avgdl are three
    bounded partial aggregates broadcast back; the doc score is ONE
    integer groupBy; the top-k is TakeOrdered.  No shuffle carries more
    than |docs|·|Q| skinny rows."""
    spark = docs.sparkSession
    toks = F.split(F.trim(F.col(text)), " +")
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("_toks"),
        F.size(toks).alias("dl"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("dl_sum"))
    term_rows = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in terms])).alias("term"))
    tf_long = base.crossJoin(F.broadcast(term_rows)).select(
        "doc_id", "dl", "term",
        F.size(F.filter(F.col("_toks"), lambda x: x == F.col("term")))
        .alias("tf"),
    )
    dfreq = tf_long.filter(F.col("tf") > 0).groupBy("term").agg(
        F.count(F.lit(1)).alias("df"))
    avgdl = F.col("dl_sum").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    tfd = F.col("tf").cast("double")
    denom = tfd + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * (F.col("dl").cast("double") / avgdl))
    score_t = idf * (tfd * F.lit(BM25_K1 + 1.0)) / denom
    sq = F.floor(score_t * F.lit(_BM25_MICRO) + 0.5).cast("long")
    scored = (
        tf_long.filter(F.col("tf") > 0)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(sq).alias("score_micro"))
    )
    return (
        scored.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
        .limit(top_k)
    )


def sql_bm25_topk(table: str, terms: list[str], top_k: int) -> str:
    """DuckDB twin of bm25_topk — same tokenization, same single-rounded
    float ops in the same order, same 2^20 per-term quantization."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks,
         len(string_split_regex(trim(text), ' +')) AS dl
  FROM {table}
), stats AS (
  SELECT count(*)::bigint AS n_docs, sum(dl)::bigint AS dl_sum FROM base
), q(term) AS (SELECT unnest([{tlist}])),
tf AS (
  SELECT doc_id, dl, term,
         len(list_filter(toks, x -> x = term))::bigint AS tf
  FROM base CROSS JOIN q
), dfreq AS (
  SELECT term, count(*)::bigint AS df FROM tf WHERE tf > 0 GROUP BY term
), sc AS (
  SELECT doc_id,
         floor(
           ln(1.0 + (n_docs::double - df::double + 0.5) / (df::double + 0.5))
           * (tf::double * {BM25_K1 + 1.0!r})
           / (tf::double + {BM25_K1!r} * ({1.0 - BM25_B!r}
              + {BM25_B!r} * (dl::double
                              / (dl_sum::double / n_docs::double))))
           * {_BM25_MICRO!r} + 0.5)::bigint AS sq
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
  WHERE tf > 0
)
SELECT doc_id, sum(sq)::bigint AS score_micro
FROM sc GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {top_k}"""


def bigram_kn_counts(docs: DataFrame, text_col: str = "text",
                     top_k: int = 25) -> DataFrame:
    """Bigram language-model counting with Kneser-Ney CONTINUATION counts
    (Kneser & Ney 1995; Chen & Goodman 1998 §2.7) — the distributed
    counting pass under any KN-smoothed n-gram LM build:

    * bigram counts c(w1 w2): one explode (map-only transform over the
      token array, JVM HOFs) + one partial-agg shuffle on the pair,
    * continuation count N1+(• w2) = |{w1 : c(w1 w2) > 0}|: a second
      bounded (vocabulary-sized) aggregate OVER THE DISTINCT-PAIR table,
      never the raw stream,
    * P_cont(w2) = N1+(• w2) / |distinct bigrams|, quantized to integer
      micro-units with integer division so both engines agree exactly.

    Returns the top ``top_k`` bigrams by (count desc, bigram asc) —
    TakeOrdered, no global sort."""
    d = docs.select(
        F.split(F.trim(F.col(text_col)), " +").alias("toks")
    ).filter(F.size("toks") >= 2)
    pairs = d.select(F.explode(F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> struct(element_at(toks, i) AS w1, "
        "element_at(toks, i + 1) AS w2))")).alias("p")
    ).select("p.w1", "p.w2")
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    cont = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("cont_w2"))
    tot = bg.agg(F.count(F.lit(1)).alias("n_distinct"))
    out = bg.join(cont, "w2").crossJoin(F.broadcast(tot)).select(
        F.concat_ws(" ", "w1", "w2").alias("bg"),
        "cnt", "cont_w2",
        F.expr("(cont_w2 * 1000000L) div n_distinct").alias("pcont_micro"),
    )
    return out.orderBy(F.desc("cnt"), F.asc("bg")).limit(top_k)


def kn_bigram_perplexity(train: DataFrame, test: DataFrame,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Document perplexity under an interpolated Kneser-Ney BIGRAM LM
    trained on ``train`` (Kneser & Ney 1995; Chen & Goodman 1998 eq. 15
    with one discount) - the CCNet-style LM-quality signal (Wenzek et
    al. 2020 score documents with a 5-gram KenLM; the bigram order keeps
    the model tables vocabulary-bounded while exercising the identical
    pipeline shape):

        P(w|v) = max(c(v,w) - D, 0)/c(v) + (D * N1+(v.)/c(v)) * Pcont(w)
        Pcont(w) = (N1+(.w) + 0.5) / (|bigram types| + 0.5 * (V + 1))

    with D = 0.75; an unseen context backs off to Pcont alone, and the
    +0.5/(V+1) floor keeps OOV continuations finite (one shared UNK
    type).  D and the floor are dyadic, every per-bigram float op is a
    single correctly-rounded IEEE op in the same order on both engines,
    and ln(P) is micro-quantized per bigram BEFORE the per-document sum
    (order-free integer aggregation - the unigram-LM/DSIR/BM25 pattern).

    Scale shape: the three LM tables (bigram counts, context totals +
    continuation-type counts, right-continuation counts) are vocabulary-
    bounded aggregates joined back to the test bigram stream on skinny
    string keys; nothing driver-side, no cross joins wider than the
    1-row totals broadcast.
    """
    def _pairs(docs: DataFrame, keep_id: bool):
        cols = [F.col(id_col)] if keep_id else []
        d = docs.select(
            *cols, F.split(F.trim(F.col(text_col)), " +").alias("toks")
        ).filter(F.size("toks") >= 2)
        return d.select(
            *cols,
            F.explode(F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(element_at(toks, i) AS v, "
                "element_at(toks, i + 1) AS w))")).alias("p"),
        ).select(*cols, "p.v", "p.w")

    bg = _pairs(train, False).groupBy("v", "w").agg(
        F.count(F.lit(1)).alias("cvw"))
    ctx = bg.groupBy("v").agg(F.sum("cvw").alias("cv"),
                              F.count(F.lit(1)).alias("n1v"))
    cont = bg.groupBy("w").agg(F.count(F.lit(1)).alias("nw"))
    tot = bg.agg(F.count(F.lit(1)).alias("nb")).crossJoin(
        train.select(F.explode(
            F.split(F.trim(F.col(text_col)), " +")).alias("t"))
        .agg(F.countDistinct("t").alias("vsize")))

    t = (_pairs(test, True)
         .join(bg, ["v", "w"], "left")
         .join(ctx, ["v"], "left")
         .join(cont, ["w"], "left")
         .crossJoin(F.broadcast(tot)))
    pcont = (F.coalesce(F.col("nw"), F.lit(0)) + 0.5) \
        / (F.col("nb") + 0.5 * (F.col("vsize") + 1))
    seen = F.greatest(F.coalesce(F.col("cvw"), F.lit(0)) - 0.75, F.lit(0.0)) \
        / F.col("cv") + 0.75 * F.col("n1v") / F.col("cv") * pcont
    p = F.when(F.col("cv").isNotNull(), seen).otherwise(pcont)
    scored = t.select(
        id_col, F.floor(F.log(p) * 1e6).cast("long").alias("logp_micro"))
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("logp_micro").cast("long").alias("sum_logp_micro"))
    avg = F.col("sum_logp_micro").cast("double") / 1e6 / F.col("n_bigrams")
    return agg.select(id_col, "n_bigrams", "sum_logp_micro",
                      F.exp(-avg).alias("ppl"))


def bpe_train(docs: DataFrame, text_col: str = "text",

              merges: int = 5, top_k: int = 20) -> DataFrame:
    """Byte-pair-encoding TOKENIZER TRAINING (Sennrich et al. 2016, the
    standard subword-vocab build every LLM pipeline runs over its corpus):

    * ONE corpus-scale pass builds the word-count table (lowercase a-z
      words; the only unbounded shuffle — output is vocabulary-bounded),
    * each merge round is pair-count (JVM HOF explode over the bounded
      word table) → argmax (single driver row, tie-break lexicographic)
      → greedy rewrite, i.e. K driver-paced rounds like the engine's
      other iterative operators,
    * symbol sequences ride as ``(a)(b)(c)(_)`` strings so the rewrite is
      a plain non-overlapping left-to-right ``replace('(a)(b)','(ab)')``
      — IDENTICAL greedy semantics in Spark SQL and the DuckDB oracle
      (overlap case ``(a)(a)(a)`` merges to ``(aa)(a)``, the BPE rule).

    Returns the ordered merge table (kind='merge', step=1..K, token=
    'a+b', cnt=pair count) plus the final top-k token frequencies
    (kind='token', step=0)."""
    spark = docs.sparkSession
    w = (
        docs.select(F.explode(F.split(
            F.lower(F.trim(F.col(text_col))), "[^a-z]+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(
                F.lit("("), F.array_join(F.split("w", ""), ")("),
                F.lit(")(_)"),
            ).alias("repr"),
            "cnt",
        )
        .persist()
    )
    merge_rows = []
    for step in range(1, merges + 1):
        syms = F.split(F.expr("trim(BOTH '()' FROM repr)"), "\\)\\(")
        pairs = (
            w.withColumn("_s", syms)
            .filter(F.size("_s") >= 2)
            .select("cnt", F.explode(F.expr(
                "transform(sequence(1, size(_s) - 1), "
                "i -> struct(element_at(_s, i) AS a, "
                "element_at(_s, i + 1) AS b))")).alias("p"))
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("pcnt"))
            .orderBy(F.desc("pcnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()[0]
        )
        a, b, pcnt = best["a"], best["b"], int(best["pcnt"])
        merge_rows.append(("merge", step, f"{a}+{b}", pcnt))
        w = w.select(
            F.replace(
                F.col("repr"),
                F.lit(f"({a})({b})"), F.lit(f"({a}{b})"),
            ).alias("repr"),
            "cnt",
        )
    toks = (
        w.select(
            F.explode(F.split(
                F.expr("trim(BOTH '()' FROM repr)"), "\\)\\(")
            ).alias("token"),
            "cnt",
        )
        .groupBy("token").agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token")).limit(top_k)
        .select(F.lit("token").alias("kind"),
                F.lit(0).cast("long").alias("step"), "token", "cnt")
    )
    mdf = spark.createDataFrame(
        merge_rows, "kind string, step long, token string, cnt long")
    return mdf.unionAll(toks)


WINNOW_K = 8          # k-gram length (chars)
WINNOW_W = 6          # winnowing window (hashes)
WINNOW_M = 2147483647  # Mersenne modulus keeps the fold in integer range


def winnowing_fingerprints(docs: DataFrame,
                           text_col: str = "text") -> DataFrame:
    """WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken 2003
    — the MOSS selection rule): polynomial rolling hashes of the
    character k-grams, then from every window of W consecutive hashes
    keep the MINIMUM — the guarantee is that any shared substring of
    length >= k + w - 1 produces at least one shared fingerprint.

    Everything is JVM higher-order-function column math (transform /
    aggregate / slice / array_min / array_distinct): no UDF, no shuffle —
    one map-only projection; the fold arithmetic ((acc*31 + c) mod M,
    (a + b) mod M) is integer-exact and order-free on both engines.
    Output per doc: fingerprint count + modular fingerprint sum."""
    k, w, m = WINNOW_K, WINNOW_W, WINNOW_M
    t = F.split(F.trim(F.col(text_col)), "")
    kgram_hash = (
        f"transform(sequence(1, size(_t) - {k} + 1), i -> "
        f"aggregate(transform(sequence(0, {k - 1}), "
        f"j -> cast(ascii(element_at(_t, cast(i + j AS int))) AS bigint)), "
        f"cast(0 AS bigint), (acc, c) -> (acc * 31 + c) % {m}))"
    )
    sel = (
        f"array_distinct(transform(sequence(1, size(_hs) - {w} + 1), "
        f"j -> array_min(slice(_hs, cast(j AS int), {w}))))"
    )
    fold_sum = (
        f"aggregate(_fps, cast(0 AS bigint), (a, b) -> (a + b) % {m})"
    )
    return (
        docs.select("doc_id", t.alias("_t"))
        .withColumn(
            "_hs",
            F.when(F.size("_t") >= k, F.expr(kgram_hash))
            .otherwise(F.expr("cast(array() AS array<bigint>)")),
        )
        .withColumn(
            "_fps",
            F.when(F.size("_hs") >= w, F.expr(sel))
            .otherwise(F.expr("cast(array() AS array<bigint>)")),
        )
        .select(
            "doc_id",
            F.size("_fps").cast("long").alias("n_fp"),
            F.coalesce(F.expr(fold_sum), F.lit(0)).cast("long")
            .alias("fp_sum"),
        )
    )


def fineweb_filters(
    docs: DataFrame,
    line_words: int = LINE_WORDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """FineWeb's three custom line-level quality filters (Penedo et al.
    2024, the public FineWeb report — the post-C4/Gopher generation of
    web-curation heuristics):

      1. fraction of lines ending in terminal punctuation  (< 0.12 drops)
      2. fraction of characters in duplicated lines        (> 0.10 drops)
      3. fraction of lines shorter than 30 characters      (> 0.67 drops)

    Lines are the engine's pseudo-lines (``line_words``-token windows —
    the fixture is single-line word soup), and terminal punctuation is
    INJECTED deterministically (a '.' appended when the raw line length
    ≡ 0 mod 3) so the ratio path is exercised on a punctuation-free
    corpus; both rules are mirrored verbatim in the SQL oracle.

    Reported ratios are integer milli-units ((1000·num) DIV den); the
    keep decision itself uses integer CROSS-MULTIPLICATION
    (e.g. 10·dup_chars <= chars) so the paper's strict ">" drop
    boundaries hold EXACTLY — floor-milli "<= 100" would shift a drop
    at precisely 0.100…1 to 0.101.  Pure integer math on both engines.
    Plan: explode to
    lines (map-only), one partial-agg shuffle on (doc, line) for the
    within-doc duplicate counts, one (doc) re-aggregate — no joins, no
    Python."""
    toks = docs.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), " +").alias("_t"),
    ).withColumn("_nt", F.size("_t"))
    n_lines = F.ceil(F.col("_nt") / F.lit(float(line_words))).cast("long")
    raw = toks.withColumn(
        "_idx", F.explode(F.sequence(F.lit(0), n_lines - 1))
    ).select(
        id_col,
        F.array_join(
            F.slice(F.col("_t"), F.col("_idx") * line_words + 1, line_words),
            " ",
        ).alias("_line0"),
    )
    line = F.concat(
        F.col("_line0"),
        F.when(F.length("_line0") % 3 == 0, F.lit(".")).otherwise(F.lit("")),
    )
    per_line = (
        raw.select(F.col(id_col), line.alias("_line"))
        .groupBy(id_col, "_line")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(
            id_col, "_c",
            F.length("_line").alias("_len"),
            F.col("_line").endswith(".").alias("_punct"),
        )
    )
    doc = per_line.groupBy(id_col).agg(
        F.sum("_c").alias("_n"),
        F.sum(F.when(F.col("_punct"), F.col("_c")).otherwise(0))
        .alias("_np"),
        F.sum(F.when(F.col("_len") < 30, F.col("_c")).otherwise(0))
        .alias("_ns"),
        F.sum(F.col("_len") * F.col("_c")).alias("_ch"),
        F.sum(
            F.when(F.col("_c") > 1, F.col("_len") * F.col("_c"))
            .otherwise(0)
        ).alias("_dch"),
    )
    punct_m = F.expr("(1000 * _np) DIV _n")
    short_m = F.expr("(1000 * _ns) DIV _n")
    dup_m = F.expr(
        "CASE WHEN _ch = 0 THEN 0 ELSE (1000 * _dch) DIV _ch END")
    return doc.select(
        F.col(id_col),
        punct_m.cast("long").alias("punct_milli"),
        dup_m.cast("long").alias("dup_char_milli"),
        short_m.cast("long").alias("short_line_milli"),
        # cross-multiplied exact thresholds: punct >= 0.12, dup <= 0.10,
        # short <= 0.67 (dch = 0 whenever ch = 0, so no zero-guard needed)
        F.expr(
            "25 * _np >= 3 * _n AND 10 * _dch <= _ch"
            " AND 100 * _ns <= 67 * _n"
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer training (Kudo 2018, the SentencePiece unigram
# model — the OTHER standard subword vocabulary next to bpe_train's BPE):
# seed a substring vocabulary from corpus frequencies, then Viterbi-EM:
# segment every word with the best (max-likelihood) path under the current
# piece probabilities, re-estimate probabilities from the winning paths,
# repeat.
#
# Determinism/exactness contract (shared with the DuckDB oracle): piece
# log-probs are micro-quantized (floor(ln(p)·1e6), the engine's standard
# cross-engine idiom), the best path minimizes the INTEGER tuple
# (cost, n_pieces, path-string), and instead of a float DP the bounded
# path lattice is enumerated EXHAUSTIVELY — words are capped at
# max_word_len and pieces at max_piece_len, so a word has at most
# tetranacci(12) ≈ 1.5k segmentations and the enumeration is a chain of
# small broadcast equi-joins (Spark) / a recursive CTE (DuckDB) with
# bit-identical winners.
#
# Scale: ONE corpus-scale pass builds the word-count table (the only
# unbounded shuffle); everything after operates on the top-N words and a
# bounded piece vocabulary (the standard SentencePiece practice of
# training on a frequency table, not the raw corpus), so EM cost is
# independent of corpus size.
# ---------------------------------------------------------------------------

def unigram_tokenizer_counts(
    docs: DataFrame,
    text_col: str = "text",
    *,
    max_word_len: int = 12,
    max_piece_len: int = 4,
    top_words: int = 200,
    top_pieces: int = 60,
    top_k: int = 25,
) -> DataFrame:
    """→ (piece, cnt1, cnt2): per-piece usage counts (weighted by word
    frequency) on the Viterbi-best segmentations after EM round 1 and
    round 2; top_k by (cnt2 desc, piece asc).

    Round-2 probabilities are Laplace-smoothed round-1 counts
    ((cnt1+1)/(total1+|V|)) so no piece is dropped mid-EM and every word
    stays segmentable (single chars are always in the seed vocab)."""
    spark = docs.sparkSession

    words_df = (
        docs.select(F.explode(F.split(
            F.lower(F.trim(F.col(text_col))), "[^a-z]+")).alias("w"))
        .filter((F.col("w") != "") & (F.length("w") <= max_word_len))
        .groupBy("w").agg(F.count(F.lit(1)).alias("wcnt"))
        .orderBy(F.desc("wcnt"), F.asc("w")).limit(top_words)
    )
    # bounded LUT collects (≤ top_words / ≤ top_pieces+26 rows) — the
    # seed/cost tables are re-referenced by every enumeration step, so
    # they are materialized once instead of re-deriving the corpus scan
    # 2×max_word_len times inside the unrolled join chain.
    words = [(r["w"], int(r["wcnt"])) for r in words_df.collect()]

    sub_freq: dict[str, int] = {}
    for w, wcnt in words:
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i:i + l]
                sub_freq[p] = sub_freq.get(p, 0) + wcnt
    multi = sorted(
        ((p, f) for p, f in sub_freq.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]))[:top_pieces]
    chars = sorted((p, f) for p, f in sub_freq.items() if len(p) == 1)
    pieces = dict(chars + multi)

    import math

    def costs_from(freqs: dict[str, int]) -> list[tuple[str, int, int]]:
        total = sum(freqs.values())
        return [
            (p, len(p),
             -int(math.floor(math.log(f / total) * 1e6)))
            for p, f in sorted(freqs.items())
        ]

    wdf = spark.createDataFrame(words, "w string, wcnt long")

    def best_paths(cost_rows: list[tuple[str, int, int]]) -> DataFrame:
        """Exhaustive lattice enumeration: max_word_len unrolled rounds,
        each a broadcast equi-join of the frontier's candidate substrings
        against the piece table; winner per word by (cost, np, path)."""
        from pyspark.sql import Window

        # the sentinel row ('', 0, 0) lets COMPLETED paths flow through
        # every round's join unchanged (their candidate list is [''])
        # so each round references `paths` exactly ONCE — the naive
        # done-vs-frontier split references it twice and doubles the
        # logical plan per round (2^max_word_len leaves).  One linear
        # 12-join plan, a single Spark job, no checkpoints.
        cdf = spark.createDataFrame(
            [("", 0, 0)] + cost_rows, "piece string, plen int, c long")
        paths = wdf.select(
            "w", "wcnt",
            F.lit(0).alias("pos"), F.lit(0).cast("long").alias("cost"),
            F.lit(0).alias("np"), F.lit("").alias("path"),
        )
        for _ in range(max_word_len):
            cand = paths.select(
                "*",
                F.explode(F.expr(
                    "CASE WHEN pos >= length(w) THEN array('') "
                    f"ELSE transform(sequence(1, least({max_piece_len}, "
                    "length(w) - pos)), "
                    "l -> substring(w, pos + 1, l)) END")).alias("sub"),
            )
            paths = cand.join(
                F.broadcast(cdf), cand["sub"] == cdf["piece"]
            ).select(
                "w", "wcnt",
                (F.col("pos") + F.col("plen")).alias("pos"),
                (F.col("cost") + F.col("c")).alias("cost"),
                (F.col("np")
                 + F.when(F.col("plen") > 0, 1).otherwise(0)).alias("np"),
                F.concat(
                    "path",
                    F.when(F.col("plen") > 0,
                           F.concat(F.lit("("), "piece", F.lit(")")))
                    .otherwise(F.lit(""))).alias("path"),
            )
        full = paths.filter(F.col("pos") == F.length("w"))
        win = Window.partitionBy("w").orderBy(
            F.asc("cost"), F.asc("np"), F.asc("path"))
        return (
            full.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") == 1)
            .select("w", "wcnt", "path")
        )

    def piece_counts(best: DataFrame) -> DataFrame:
        return (
            best.select(
                "wcnt",
                F.explode(F.split(
                    F.expr("trim(BOTH '()' FROM path)"), "\\)\\("))
                .alias("piece"))
            .groupBy("piece").agg(F.sum("wcnt").alias("cnt"))
        )

    cnt1_df = piece_counts(best_paths(costs_from(pieces)))
    cnt1 = {r["piece"]: int(r["cnt"]) for r in cnt1_df.collect()}

    smoothed = {p: cnt1.get(p, 0) + 1 for p in pieces}
    cnt2_df = piece_counts(best_paths(costs_from(smoothed)))

    c1df = spark.createDataFrame(
        sorted(cnt1.items()), "piece string, cnt1 long")
    return (
        cnt2_df.select("piece", F.col("cnt").alias("cnt2"))
        .join(F.broadcast(c1df), "piece", "left")
        .select("piece", F.coalesce("cnt1", F.lit(0)).alias("cnt1"), "cnt2")
        .orderBy(F.desc("cnt2"), F.asc("piece")).limit(top_k)
    )


# ---------------------------------------------------------------------------
# PII redaction (the Dolma / FineWeb pre-training hygiene pass: mask
# email addresses, IPv4 addresses and US-style phone numbers with
# sentinel tokens before the corpus ships).  Patterns are written in the
# Java-regex ∩ RE2 common subset (no lookaround, no backrefs) so the
# DuckDB oracle applies literally the same strings.
#
# Scale: pure JVM regexp_replace columns — shuffle-free, codegen-side,
# no Python in the path.
# ---------------------------------------------------------------------------

PII_PATTERNS = (
    ("email", r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}",
     "|||EMAIL|||"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "|||IP|||"),
    ("phone", r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}", "|||PHONE|||"),
)


def pii_redact(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id_col, n_email, n_ip, n_phone, redacted) — per-doc match counts
    plus the masked text.  Order matters and is fixed: emails first
    (so their user@host digits can't half-match as phones), then IPs,
    then phones — the Dolma ordering."""
    counts = [
        F.size(F.regexp_extract_all(
            F.col(text_col), F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    red = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return docs.select(F.col(id_col), *counts, red.alias("redacted"))


# ---------------------------------------------------------------------------
# Quality-classifier TRAINING (the fastText/DCLM-style step that produces
# the weights linear_quality_score consumes): full-batch logistic
# regression over hashed bag-of-words features, driver-paced gradient
# iterations with the weight vector broadcast each round (the kmeans-Lloyd
# pattern — the collected state is dim-bounded, independent of corpus
# size).
#
# Cross-engine exactness: everything is integer arithmetic except the
# sigmoid — features are kilo-quantized (xk = floor(1000*c/n)), residuals
# micro-floored (rm = floor((p-y)*1e6)), gradients integer sums, weight
# updates exact floor division — so a DuckDB oracle replays the identical
# trajectory CTE by CTE.
#
# Scale: one corpus shuffle builds the (doc, feat, xk) design matrix; each
# iteration is one broadcast equi-join + two bounded aggregates.  At 100 TB
# the matrix is the corpus-sized term; iterations touch it map-side only.
# ---------------------------------------------------------------------------

def _floordiv_long(a: F.Column, b: F.Column) -> F.Column:
    """Exact floor(a/b) for long columns (both engines lack a shared
    integer-division operator with floor semantics)."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def logreg_quality_train(
    docs: DataFrame,
    label_col: F.Column,
    dim: int = 32,
    iters: int = 2,
    lr: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Train logistic-regression weights over md5-hashed token features.

    Returns (weights rows [(feat, w_micro)], n_docs) — weights in micro
    units after ``iters`` full-batch steps of ``w -= lr * mean((p-y)·x)``
    from w=0.  label_col must be an int 0/1 Column over ``docs``."""
    spark = docs.sparkSession
    feats = docs.select(
        F.col(id_col), label_col.cast("long").alias("_y"),
        F.explode(F.split(F.trim(F.col(text_col)), " +")).alias("_tok"),
    ).select(
        id_col, "_y",
        (F.conv(F.substring(F.md5("_tok"), 1, 8), 16, 10).cast("long")
         % dim).alias("feat"),
    )
    cnt = feats.groupBy(id_col, "feat").agg(
        F.count(F.lit(1)).cast("long").alias("_c"),
        F.first("_y").alias("_y"))
    nd = cnt.groupBy(id_col).agg(
        F.sum("_c").cast("long").alias("_n"), F.first("_y").alias("_y"))
    x = cnt.join(nd.select(id_col, "_n"), id_col).select(
        id_col, "feat",
        _floordiv_long(F.col("_c") * 1000, F.col("_n")).alias("xk"),
    ).localCheckpoint(eager=True)  # design matrix reused every iteration
    n_docs = nd.count()
    wm = {f: 0 for f in range(dim)}
    for it in range(iters):
        if all(v == 0 for v in wm.values()):
            # w = 0 → p = 0.5 exactly: residual is closed-form
            rm = nd.select(
                id_col,
                (F.lit(500000) - F.lit(1000000) * F.col("_y")).alias("rm"))
        else:
            wdf = spark.createDataFrame(
                [(f, v) for f, v in wm.items()], "feat long, wm long")
            zs = (x.join(F.broadcast(wdf), "feat")
                  .groupBy(id_col)
                  .agg(F.sum(F.col("xk") * F.col("wm"))
                       .cast("long").alias("zs")))
            rm = nd.join(zs, id_col, "left").select(
                id_col,
                F.floor(
                    (F.lit(1.0) / (F.lit(1.0)
                                   + F.exp(-(F.coalesce(F.col("zs"),
                                                        F.lit(0))
                                             .cast("double") / 1e9)))
                     - F.col("_y")) * 1e6
                ).cast("long").alias("rm"))
        gs = (x.join(rm, id_col)
              .groupBy("feat")
              .agg(F.sum(F.col("rm") * F.col("xk"))
                   .cast("long").alias("gs")))
        grads = {r["feat"]: r["gs"] for r in gs.collect()}  # dim-bounded
        for f, g in grads.items():
            q = lr * g
            b = 1000 * n_docs
            wm[f] -= (q - (q % b + b) % b) // b  # exact floor division
    return sorted(wm.items()), n_docs

"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting. All built-in functions — these run
over every document of the corpus, so nothing here may leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-ish token pattern: letter runs | digit runs | single non-space symbol
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "was")

# tiny n-gram/marker tables for heuristic language ID (per-language
# high-frequency function words; deterministic, dependency-free)
LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "was", "with"),
    "de": ("der", "die", "und", "das", "nicht", "ist"),
    "es": ("el", "la", "los", "que", "una", "es"),
    "fr": ("le", "la", "les", "des", "est", "une"),
}


def _token_count_in(col, words):
    """Count whitespace tokens of lower(text) that are in `words`
    (with multiplicity). One compiled-regex scan over the padded text:
    a token equals w exactly when w is flanked by whitespace in
    ' ' || lower(trim(text)) || ' ', so regexp_count with \\s
    lookarounds counts precisely the token hits — no per-token
    split + interpreted filter lambda. Words that contain whitespace
    (or are empty) can never equal a token and are dropped up front.
    (The DuckDB oracles keep the token-based formulation — the
    lookaround ban applies to the ORACLE side; only the results must
    match.)"""
    import re as _re

    wlist = [w for w in words if w and not _re.search(r"\s", w)]
    if not wlist:
        return F.lit(0)
    alt = "|".join("\\Q" + w + "\\E" for w in wlist)
    padded = F.concat(F.lit(" "), F.lower(F.trim(col)), F.lit(" "))
    return F.regexp_count(padded, F.lit(f"(?<=\\s)(?:{alt})(?=\\s)"))


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_chars, n_ws_tokens, n_bpe_tokens, avg_token_len).

    Expression choices: n_bpe counts matches without materializing the
    match array (regexp_count vs size(regexp_extract_all)); the token
    lengths sum is length(trim) minus the whitespace chars inside it
    (one regexp_replace) instead of a per-token transform+aggregate
    fold — integer-valued doubles below 2^53, so the division is
    bit-equal to the old fold."""
    t = F.col(text_col)
    trimmed = F.trim(t)
    ws_tokens = F.split(trimmed, r"\s+")
    sum_tok_len = F.length(F.regexp_replace(trimmed, r"\s+", "")).cast("double")
    return df.select(
        F.col(id_col).alias("id"),
        F.length(t).cast("long").alias("n_chars"),
        F.when(trimmed == "", 0).otherwise(F.size(ws_tokens)).cast("long").alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(BPE_TOKEN_RE)).cast("long").alias("n_bpe_tokens"),
        F.round(
            F.when(trimmed == "", 0.0).otherwise(
                sum_tok_len / F.size(ws_tokens)
            ),
            4,
        ).alias("avg_token_len"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_chars, punct_ratio, stopword_ratio, upper_ratio,
    quality): cheap heuristics of the C4/Gopher family — the quality
    gate a web-scale training pipeline puts before extraction."""
    t = F.col(text_col)
    n_chars = F.length(t)
    # count matches directly (single-char classes: count == the length
    # delta of the old regexp_replace-and-measure, minus the rewrite)
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    n_upper = F.regexp_count(t, F.lit("[A-Z]"))
    ws_tokens = F.split(F.trim(t), r"\s+")
    n_tokens = F.when(F.trim(t) == "", 0).otherwise(F.size(ws_tokens))
    n_stop = _token_count_in(t, STOPWORDS_EN)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4)
    stop_ratio = F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4)
    upper_ratio = F.round(n_upper / F.greatest(n_chars, F.lit(1)), 4)
    quality = F.round(
        F.when(n_tokens < 5, 0.0).otherwise(
            (1.0 - punct_ratio) * (0.5 + F.least(stop_ratio * 2, F.lit(0.5)))
        ),
        4,
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("long").alias("n_chars"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        upper_ratio.alias("upper_ratio"),
        quality.alias("quality"),
    )


def detect_language(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, lang_pred, lang_score): argmax over per-language marker-word
    counts; 'und' (undetermined) when nothing matches. Ties broken by
    language code order for determinism."""
    t = F.col(text_col)
    scores = {
        lang: _token_count_in(t, words) for lang, words in LANG_MARKERS.items()
    }
    out = df.select(F.col(id_col).alias("id"), *[v.alias(f"s_{k}") for k, v in scores.items()])
    best = F.greatest(*[F.col(f"s_{k}") for k in LANG_MARKERS])
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(
            (F.col(f"s_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out.select(
        "id", pred.alias("lang_pred"), best.cast("int").alias("lang_score")
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fp): md5 of casefolded whitespace-collapsed text — the
    rolling-hash style near-identity key used for fast dedup joins."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col).alias("id"), F.md5(norm).alias("fp"))


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, host, path, url_norm): Common-Crawl-style URL
    canonicalization — lowercase scheme+host, strip fragment, strip
    common tracking params (utm_*, fbclid, gclid), drop trailing slash,
    default-scheme http. Pure regexp (JVM, codegen) so the same rules
    are expressible in any engine; at 10^12 pages url_norm is the
    per-document join/dedup key."""
    u = F.col(url_col)
    # strip fragment first, then split
    no_frag = F.regexp_replace(u, r"#.*$", "")
    host = F.lower(F.regexp_extract(no_frag, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?]+)", 1))
    path = F.regexp_extract(no_frag, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]+([^?]*)", 1)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    # drop tracking params from the query string (token-level regex)
    q_clean = F.regexp_replace(
        query, r"(^|&)(utm_[A-Za-z]+|fbclid|gclid)=[^&]*", ""
    )
    q_clean = F.regexp_replace(q_clean, r"^&+", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    path_norm = F.when(F.col("_p") == "", F.lit("/")).otherwise(
        F.regexp_replace(F.col("_p"), r"/+$", "")
    )
    out = (
        df.withColumn("_p", path)
        .withColumn("host", host)
        .withColumn(
            "url_norm",
            F.concat(
                F.when(scheme == "", F.lit("http")).otherwise(scheme),
                F.lit("://"),
                host,
                F.when(path_norm == "", F.lit("/")).otherwise(path_norm),
                F.when(q_clean != "", F.concat(F.lit("?"), q_clean)).otherwise(F.lit("")),
            ),
        )
        .withColumn("path", F.when(F.col("_p") == "", F.lit("/")).otherwise(F.col("_p")))
        .drop("_p")
    )
    return out


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): sliding-window passage
    chunking over whitespace tokens — the passage-extraction step of a
    training-data/RAG pipeline. Stride = chunk_tokens - overlap; the
    final partial window is kept. All JVM-side (split + sequence +
    transform + posexplode): one narrow pass, no shuffle, so it
    pipelines with the scan at any corpus size."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    # split on \s+ directly: same token list as collapse-then-split,
    # without rewriting the whole text first
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # window starts: 0, stride, 2*stride, ... while start < n
    starts = F.when(
        n > 0, F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    chunks = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(toks, s + 1, chunk_tokens))
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
        )
        .where(F.col("chunk_text") != "")
        .withColumn("n_tokens", F.size(F.split(F.col("chunk_text"), " ")))
    )

"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

All pure Column expressions (JVM whole-stage codegen), each with a matching
DuckDB SQL generator so every operator is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small function-word lists per language (heuristic language ID)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pour", "dans", "des"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "por", "con", "para"],
    "ru": ["и", "в", "не", "на", "что", "это", "с", "по", "как", "но"],
}

TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def _words(text: Column) -> Column:
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda w: w != "")


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of word tokens that are function words of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(_words(text), lambda w: F.array_contains(sw, w)))


def lang_scores(text: Column) -> dict[str, Column]:
    n = F.greatest(F.size(_words(text)), F.lit(1))
    return {lang: stopword_hits(text, lang).cast("double") / n for lang in STOPWORDS}


def predicted_lang(text: Column) -> Column:
    """argmax language by stopword ratio; ties → lexicographically first
    language; all-zero → 'und' (undetermined)."""
    scores = lang_scores(text)
    best_score = F.greatest(*scores.values())
    result = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        result = F.when(
            (scores[lang] > 0) & (scores[lang] == best_score), F.lit(lang)
        ).otherwise(result)
    return result


def duckdb_predicted_lang_sql(text_expr: str) -> str:
    words = f"list_filter(string_split_regex(lower(trim({text_expr})), '\\s+'), w -> w != '')"
    n = f"greatest(len({words}), 1)"
    score = {}
    for lang, sws in STOPWORDS.items():
        lst = "[" + ", ".join(f"'{w}'" for w in sws) + "]"
        score[lang] = f"(CAST(len(list_filter({words}, w -> list_contains({lst}, w))) AS DOUBLE) / {n})"
    best = "greatest(" + ", ".join(score.values()) + ")"
    expr = "'und'"
    for lang in sorted(STOPWORDS, reverse=True):
        expr = f"CASE WHEN {score[lang]} > 0 AND {score[lang]} = {best} THEN '{lang}' ELSE {expr} END"
    return expr


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality heuristics: char length, word count, mean word
    length, alpha ratio, digit ratio, stopword(en) ratio."""
    words = _words(text)
    n_words = F.size(words)
    n_chars = F.char_length(text)
    total_word_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.char_length(w)
    )
    alpha_chars = F.char_length(F.regexp_replace(F.lower(text), "[^a-z]", ""))
    digit_chars = F.char_length(F.regexp_replace(text, "[^0-9]", ""))
    return {
        "n_chars": n_chars.cast("int"),
        "n_words": n_words.cast("int"),
        "mean_word_len": F.round(
            total_word_chars.cast("double") / F.greatest(n_words, F.lit(1)), 6
        ),
        "alpha_ratio": F.round(
            alpha_chars.cast("double") / F.greatest(n_chars, F.lit(1)), 6
        ),
        "digit_ratio": F.round(
            digit_chars.cast("double") / F.greatest(n_chars, F.lit(1)), 6
        ),
        "stopword_ratio": F.round(
            stopword_hits(text, "en").cast("double") / F.greatest(n_words, F.lit(1)), 6
        ),
    }


def duckdb_quality_sql(text_expr: str) -> dict[str, str]:
    words = f"list_filter(string_split_regex(lower(trim({text_expr})), '\\s+'), w -> w != '')"
    n_words = f"len({words})"
    n_chars = f"length({text_expr})"
    total_word_chars = f"list_sum(list_transform({words}, w -> length(w)))"
    alpha = f"length(regexp_replace(lower({text_expr}), '[^a-z]', '', 'g'))"
    digit = f"length(regexp_replace({text_expr}, '[^0-9]', '', 'g'))"
    en = "[" + ", ".join(f"'{w}'" for w in STOPWORDS["en"]) + "]"
    sw = f"len(list_filter({words}, w -> list_contains({en}, w)))"
    return {
        "n_chars": f"CAST({n_chars} AS INT)",
        "n_words": f"CAST({n_words} AS INT)",
        "mean_word_len": f"round(CAST(coalesce({total_word_chars}, 0) AS DOUBLE) / greatest({n_words}, 1), 6)",
        "alpha_ratio": f"round(CAST({alpha} AS DOUBLE) / greatest({n_chars}, 1), 6)",
        "digit_ratio": f"round(CAST({digit} AS DOUBLE) / greatest({n_chars}, 1), 6)",
        "stopword_ratio": f"round(CAST({sw} AS DOUBLE) / greatest({n_words}, 1), 6)",
    }


def token_counts(text: Column) -> dict[str, Column]:
    """Whitespace tokens and BPE-ish regex tokens (letter runs / digit runs /
    single punctuation)."""
    return {
        "ws_tokens": F.size(_words(text)).cast("int"),
        "re_tokens": F.size(
            F.regexp_extract_all(F.lower(text), F.lit(TOKEN_REGEX), 0)
        ).cast("int"),
    }


def duckdb_token_counts_sql(text_expr: str) -> dict[str, str]:
    words = f"list_filter(string_split_regex(lower(trim({text_expr})), '\\s+'), w -> w != '')"
    return {
        "ws_tokens": f"CAST(len({words}) AS INT)",
        "re_tokens": f"CAST(len(regexp_extract_all(lower({text_expr}), '{TOKEN_REGEX}')) AS INT)",
    }


def fingerprint_bottom_k(shingles: Column, k: int = 4) -> Column:
    """Bottom-k sketch fingerprint: the k smallest md5(shingle) hex values,
    concatenated — a compact stable document signature (winnowing-style;
    cf. the reference's rolling CountTrie hashing, but content-defined)."""
    hashed = F.array_sort(F.transform(shingles, lambda s: F.md5(s)))
    return F.concat_ws("", F.slice(hashed, 1, k))


def duckdb_fingerprint_sql(shingles_expr: str, k: int = 4) -> str:
    return (
        f"array_to_string(list_sort(list_transform({shingles_expr}, s -> md5(s)))[1:{k}], '')"
    )


# ---------------------------------------------------------------------------
# repetition features (Gopher-style quality signals)
# ---------------------------------------------------------------------------


def repetition_features(text: Column) -> dict[str, Column]:
    """Repetition signals used by pretraining-corpus quality filters
    (cf. Gopher's repetition heuristics): fraction of duplicate lines,
    duplicate words, and duplicate word-bigrams.  All linear-time column
    expressions — no quadratic per-doc work, no UDFs."""
    lines = F.filter(F.split(text, "\n"), lambda ln: F.trim(ln) != "")
    words = _words(text)
    n_words = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, F.greatest(n_words - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n_words - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )

    def dup_ratio(arr: Column) -> Column:
        n = F.size(arr)
        return F.round(
            F.when(n > 0, 1 - F.size(F.array_distinct(arr)) / n).otherwise(0.0), 6
        )

    return {
        "dup_line_ratio": dup_ratio(lines),
        "dup_word_ratio": dup_ratio(words),
        "dup_bigram_ratio": dup_ratio(bigrams),
    }


def duckdb_repetition_sql(text_expr: str) -> dict[str, str]:
    words = f"list_filter(string_split_regex(lower(trim({text_expr})), '\\s+'), w -> w != '')"
    lines = f"list_filter(string_split({text_expr}, chr(10)), ln -> trim(ln) != '')"
    bigrams = (
        f"list_transform(range(1, greatest(len({words}), 1)), "
        f"i -> ({words})[i] || ' ' || ({words})[i+1])"
    )

    def dup(arr):
        return (
            f"round(CASE WHEN len({arr}) > 0 "
            f"THEN 1 - CAST(len(list_distinct({arr})) AS DOUBLE) / len({arr}) "
            f"ELSE 0.0 END, 6)"
        )

    return {
        "dup_line_ratio": dup(lines),
        "dup_word_ratio": dup(words),
        "dup_bigram_ratio": dup(bigrams),
    }


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# conservative patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB)
URL_RE = "https?://[^\\s]+"
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
PHONE_RE = "\\+?[0-9][0-9()\\- ]{6,14}[0-9]"


def pii_counts(text: Column) -> dict[str, Column]:
    """Counts per PII category, matched in redaction order (URLs first so a
    mailto-ish URL isn't double-counted as an email)."""
    after_url = F.regexp_replace(text, URL_RE, "<URL>")
    after_email = F.regexp_replace(after_url, EMAIL_RE, "<EMAIL>")
    return {
        "n_urls": F.size(F.regexp_extract_all(text, F.lit(URL_RE), 0)).cast("int"),
        "n_emails": F.size(F.regexp_extract_all(after_url, F.lit(EMAIL_RE), 0)).cast("int"),
        "n_phones": F.size(F.regexp_extract_all(after_email, F.lit(PHONE_RE), 0)).cast("int"),
    }


def redact_pii(text: Column) -> Column:
    """Replace URLs, emails, then phone-like digit runs with typed tokens."""
    out = F.regexp_replace(text, URL_RE, "<URL>")
    out = F.regexp_replace(out, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def duckdb_pii_sql(text_expr: str) -> dict[str, str]:
    """SQL twins; DuckDB regexp_replace needs the 'g' flag to match Spark's
    replace-all semantics."""
    after_url = f"regexp_replace({text_expr}, '{URL_RE}', '<URL>', 'g')"
    after_email = f"regexp_replace({after_url}, '{EMAIL_RE}', '<EMAIL>', 'g')"
    return {
        "n_urls": f"CAST(len(regexp_extract_all({text_expr}, '{URL_RE}')) AS INT)",
        "n_emails": f"CAST(len(regexp_extract_all({after_url}, '{EMAIL_RE}')) AS INT)",
        "n_phones": f"CAST(len(regexp_extract_all({after_email}, '{PHONE_RE}')) AS INT)",
        "redacted": f"regexp_replace({after_email}, '{PHONE_RE}', '<PHONE>', 'g')",
    }

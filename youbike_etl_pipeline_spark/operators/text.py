"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north-star): language-ID,
quality scoring, token counting, document fingerprinting — each a pure
column-expression pipeline (JVM-side, codegen), so a 100 TB ``documents``
table streams through the scan with no Python on the data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language marker-word profiles for the n-gram/stopword heuristic
#: language identifier. Real deployments plug in fastText/CLD3 via a pandas
#: UDF; the heuristic keeps the hot path JVM-side.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty strings dropped."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_token_count(text: Column) -> Column:
    """BPE-ish sub-word proxy: word tokens plus punctuation splits —
    ``\\w+|[^\\w\\s]`` occurrences."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), 0))


def marker_count(text: Column, word: str) -> Column:
    """Occurrences of a marker word, counted by token equality.

    Deliberately NOT ``\\b<word>\\b``: word-boundary semantics around
    combining marks differ between Java regex and RE2 (a decomposed
    ``"déjà"`` contains a literal ``de`` that RE2 bounds but Java does not),
    so ``\\b`` counting is engine-dependent on accented text. Splitting on
    the explicit codepoint class ``[^a-z]+`` and counting exact token
    matches is bit-identical across engines (SQL mirror:
    ``len(list_filter(regexp_split_to_array(lower(text),'[^a-z]+'),
    x -> x = '<word>'))``)."""
    toks = F.split(F.lower(text), "[^a-z]+")
    return F.size(F.filter(toks, lambda t: t == word))


def lang_id(text: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language ID: score = total marker-word hits per language,
    arg-max with deterministic tie-break (language code ascending); 'und'
    when no marker hits. CJK characters short-circuit to 'zh'."""
    markers = markers or LANG_MARKERS
    scores: list[tuple[str, Column]] = []
    for lang, words in sorted(markers.items()):
        score = None
        for w in words:
            c = marker_count(text, w)
            score = c if score is None else score + c
        scores.append((lang, score))
    # arg-max fold keeping strictly-greater, so ascending language order
    # wins ties deterministically
    best_lang, best_score = F.lit("und"), F.lit(0)
    for lang, score in scores:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    has_cjk = F.size(F.regexp_extract_all(text, F.lit(r"[一-鿿]"), 0)) > 0
    return F.when(has_cjk, F.lit("zh")).otherwise(best_lang)


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features: length, token count, mean token length,
    punctuation ratio, stopword ratio, uppercase ratio."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    n_stop = None
    for w in LANG_MARKERS["en"]:
        c = marker_count(text, w)
        n_stop = c if n_stop is None else n_stop + c
    n_upper = F.size(F.regexp_extract_all(text, F.lit(r"[A-Z]"), 0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.when(n_tokens > 0, (n_chars - n_tokens + 1) / n_tokens),
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars),
        "stopword_ratio": F.when(n_tokens > 0, n_stop / n_tokens),
        "upper_ratio": F.when(n_chars > 0, n_upper / n_chars),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: rewards mid-length docs with sane
    punctuation/stopword profiles — the shape used for corpus filtering."""
    f = quality_features(text)
    length_term = F.least(f["n_tokens"] / 100.0, F.lit(1.0))
    punct_term = 1.0 - F.least(F.coalesce(f["punct_ratio"], F.lit(0.0)) * 5.0, F.lit(1.0))
    stop_term = F.least(F.coalesce(f["stopword_ratio"], F.lit(0.0)) * 4.0, F.lit(1.0))
    return (length_term + punct_term + stop_term) / 3.0


def char_fingerprint(text: Column, modulus: int = 1_000_000_007) -> Column:
    """Position-weighted character fingerprint: Σ (pos+1)·ascii(char) mod m,
    over the printable-ASCII projection of the text.

    Non-ASCII is stripped first (identical ``[^ -~]`` regexp on every
    engine): per-character splitting is where engines disagree — Spark
    splits codepoints while DuckDB's ``string_split`` works on grapheme
    clusters, so combining accents or CJK shift every later position. The
    ASCII projection makes the character sequence, and therefore the
    fingerprint, engine- and seed-independent. A SQL-portable
    simplification of a polynomial rolling hash (the full-strength
    per-shingle variant is :func:`shingle_hashes`, built on xxhash64)."""
    clean = F.regexp_replace(text, "[^ -~]", "")
    chars = F.split(clean, "")
    weighted = F.transform(chars, lambda ch, i: (i + 1) * F.ascii(ch))
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x) % modulus


def word_shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct word k-grams from an already-materialized token array.

    ``toks`` MUST be a plain column reference (``F.col``) to a projected
    token array, not an inline ``tokens(text)`` expression: sub-expressions
    embedded in a higher-order-function lambda are re-evaluated on EVERY
    lambda invocation (no CSE inside interpreted lambdas), which turns the
    shingle build O(n²·tokenize) — measured 3-5× slower end-to-end. With a
    reference, each ``element_at`` is an O(1) read of the row's array."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)]),
    )
    return F.array_distinct(F.when(n >= k, grams).otherwise(F.array()))


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams as an array column (dedup/minhash input).
    Convenience form; hot paths should project ``tokens(text)`` to a column
    first and call :func:`word_shingles_from_tokens` (see its warning)."""
    return word_shingles_from_tokens(tokens(text), k)


def shingle_hashes(text: Column, k: int = 3) -> Column:
    """64-bit hashes of the distinct word k-shingles (xxhash64) — the
    rolling-hash fingerprint set used by MinHash."""
    return F.transform(word_shingles(text, k), lambda s: F.xxhash64(s))


def normalize_text(text: Column) -> Column:
    """Training-data text normalization: lowercase, strip control chars,
    squash runs of whitespace, trim — the standard pre-dedup cleanup pass
    (pure regexp expressions, codegen'd)."""
    cleaned = F.regexp_replace(text, r"[\x00-\x1f]", " ")
    squashed = F.regexp_replace(cleaned, r"\s+", " ")
    return F.trim(F.lower(squashed))

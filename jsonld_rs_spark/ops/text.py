"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting (SURVEY.md §2 'training-data pipeline ops').

Every operator is pure column algebra (whole-stage-codegen eligible, no
Python on the hot path) and has an exact ANSI-SQL twin in
``__spark_entry__.oracle_sql`` so DuckDB verifies it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# language marker words (surrounded by spaces so they only match whole words)
LANG_MARKERS = {"en": " the ", "de": " der ", "fr": " le ", "es": " el "}
STOPWORD = " the "


def _occurrences(col, needle: str):
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def token_count_col(text_col=None):
    """Whitespace token count as a single Column over ``text`` — the
    fragment operators fuse into their own projections (spaces + 1; the
    synthetic corpus is single-space separated, so exact in both engines)."""
    text = F.col("text") if text_col is None else text_col
    return (
        F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1
    ).cast("long")


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token count per document."""
    return docs.select("doc_id", token_count_col().alias("n_tokens"))


def token_counts(docs: DataFrame) -> DataFrame:
    """Both token counters (whitespace + BPE-ish subword proxy) fused into
    ONE projection over one scan — consolidated r5 from token_count +
    bpe_token_count so the driver gate records a single row for both."""
    # no spread here (r8): measured 0.91 -> 0.82 s with it at sf0.1 — the
    # repartition of the full text costs about what the parallelism buys at
    # this per-row weight; left on the scan's own partitioning.
    return docs.select(
        "doc_id",
        token_count_col().alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_ISH_PATTERN))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def _lang_guess_expr(score_cols):
    """argmax over per-language score columns with deterministic first-wins
    tie-break en > de > fr > es, else 'und'. ``score_cols`` maps lang →
    Column (any expression — aliased columns or inline score subtrees)."""
    best = F.greatest(*score_cols.values())
    guess = F.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:  # first-wins tie-break
        guess = guess.when(score_cols[lang] == best, F.lit(lang))
    return guess


def lang_guess_col(text_col=None):
    """``lang_guess`` as a single Column over ``text`` — the fragment
    corpus_filter fuses into one projection (VERDICT r3 #3). Same algebra as
    lang_id; the marker-score subtrees are inlined (cheap columnar ops,
    CollapseProject duplication accepted as in lang_id)."""
    padded = F.concat(
        F.lit(" "), F.col("text") if text_col is None else text_col, F.lit(" ")
    )
    scores = {
        lang: _occurrences(padded, marker).cast("long")
        for lang, marker in LANG_MARKERS.items()
    }
    return _lang_guess_expr(scores)


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language guess with deterministic tie-break order
    en > de > fr > es, else 'und'. (A real system uses char n-gram models;
    the *shape* — per-language score columns + argmax — is the same.)"""
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            _occurrences(padded, marker).cast("long").alias(f"score_{lang}")
            for lang, marker in LANG_MARKERS.items()
        ],
    )
    guess = _lang_guess_expr({lang: F.col(f"score_{lang}") for lang in LANG_MARKERS})
    return scored.withColumn("lang_guess", guess)


def _max_run(arr):
    """Count of the most frequent element of ``arr``, computed as the
    longest equal-run of the SORTED array — a single F.aggregate fold, so
    the whole computation stays inside one projection (no per-document
    explode/groupBy shuffle, no UDF). The (element == prev) comparison is
    null-safe by construction: split() never yields nulls."""
    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def repetition_cols(text_col=None) -> dict:
    """Gopher-style repetition signals (Rae et al. 2021, arXiv:2112.11446,
    Table A1's repetition filters) as pure column algebra — the standard
    what-to-drop signals of a web-scale training-data build:

    * ``top_word_frac``  — count of the most frequent word / word count;
    * ``top_2gram_frac`` — count of the most frequent word 2-gram / 2-gram
      count (2-grams per ops.dedup._shingles, the corpus-wide shingle rule);
    * ``dup_line_frac``  — 1 − distinct lines / lines (0.0 on single-line
      corpora; real crawls have newlines, tests cover them).

    Returned as name → Column so callers fuse them into an existing
    projection (lang_quality) instead of adding a scan."""
    from .dedup import _shingles

    text = F.col("text") if text_col is None else text_col
    words = F.split(text, " ")
    words_n = F.size(words).cast("double")
    sh = _shingles(text, k=2)
    lines = F.split(text, "\n")
    return {
        "top_word_frac": F.round(_max_run(words) / words_n, 6),
        "top_2gram_frac": F.round(_max_run(sh) / F.size(sh).cast("double"), 6),
        "dup_line_frac": F.round(
            1.0 - F.size(F.array_distinct(lines)) / F.size(lines).cast("double"), 6
        ),
    }


def lang_quality(docs: DataFrame) -> DataFrame:
    """Language-ID + quality scoring + Gopher-style repetition signals fused
    into ONE projection over one scan — consolidated r5 from lang_id +
    quality_score (the en marker ' the ' doubles as the stopword, so the
    stop count IS score_en); r6 adds the repetition columns
    (top_word_frac / top_2gram_frac / dup_line_frac). Same column names as
    the parents; still pure column algebra, no shuffle before the sort."""
    from ..util import spread

    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    scores = {
        lang: _occurrences(padded, marker).cast("long")
        for lang, marker in LANG_MARKERS.items()
    }
    n_tokens_d = token_count_col().cast("double")
    stop_ratio = scores["en"].cast("double") / n_tokens_d
    rep = repetition_cols()
    # spread first (r8): the repetition folds (sort + aggregate over the
    # word/shingle arrays) are the most expensive pure column algebra in the
    # engine, and on a single-file sandbox scan the whole projection ran in
    # one task (measured 10.2 s noop at sf0.1). No-op on a wide scan.
    return spread(docs.select("doc_id", "lang", "text")).select(
        "doc_id",
        "lang",
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
        _lang_guess_expr(scores).alias("lang_guess"),
        token_count_col().alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        quality_col().alias("quality"),
        *[col.alias(name) for name, col in rep.items()],
    )


def quality_col(text_col=None):
    """``quality`` (rounded to 6 decimals, in [0,1]) as a single Column over
    ``text`` — the fragment corpus_filter fuses into one projection."""
    text = F.col("text") if text_col is None else text_col
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    n_tokens = token_count_col(text).cast("double")
    stop_ratio = _occurrences(padded, STOPWORD).cast("double") / n_tokens
    length_part = F.least(F.lit(1.0), n_tokens / F.lit(100.0))
    return F.round(length_part * 0.7 + stop_ratio * 0.3, 6)


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / stopword-ratio quality heuristic in [0,1]."""
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    n_tokens = token_count_col().cast("double")
    stop_ratio = _occurrences(padded, STOPWORD).cast("double") / n_tokens
    return docs.select(
        "doc_id",
        token_count_col().alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        quality_col().alias("quality"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 of the lowercased text plus a
    coarse 64-char 'head fingerprint' for prefix-bucketing."""
    return docs.select(
        "doc_id",
        F.md5(F.lower(F.col("text"))).alias("fp_md5"),
        F.md5(F.substring(F.lower(F.col("text")), 1, 64)).alias("fp_head"),
    )


BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def bpe_token_count(docs: DataFrame) -> DataFrame:
    """BPE-ish subword-proxy token count: letter runs are one token, every
    digit is its own token (GPT-2-style digit splitting), every other
    non-space character is its own token. The pattern uses only constructs
    Java regex and DuckDB's RE2 interpret identically (no \\s, no lazy
    quantifiers), so the SQL twin is exact. Still pure column algebra —
    regexp_count is JVM-side."""
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(BPE_ISH_PATTERN))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def winnow_fingerprint(docs: DataFrame, k: int = 8, w: int = 4) -> DataFrame:
    """Winnowing document fingerprint (Schleimer et al.'s scheme shape):
    hash every k-char gram, keep the minimum of each w-wide window, dedup —
    robust to local edits, standard for plagiarism/near-dup detection.
    Pure column algebra; the md5-array subtree is referenced more than once
    (size + slice) and duplicates under CollapseProject — acceptable for a
    cheap columnar map, noted per the round-1 lesson."""
    text = F.col("text")
    grams = F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1)))
    hashes = F.transform(grams, lambda i: F.md5(text.substr(i.cast("int"), F.lit(k))))
    hs = docs.select("doc_id", hashes.alias("hs"))
    starts = F.sequence(F.lit(1), F.greatest(F.size("hs") - (w - 1), F.lit(1)))
    fps = F.array_distinct(
        F.transform(
            starts,
            lambda s: F.array_min(F.slice(F.col("hs"), s.cast("int"), w)),
        )
    )
    return hs.select(
        "doc_id",
        F.size(fps).cast("long").alias("n_fps"),
        F.md5(F.concat_ws(",", F.array_sort(fps))).alias("fp"),
    )


def fingerprint_all(docs: DataFrame, k: int = 8, w: int = 4) -> DataFrame:
    """Exact (md5 + head) and winnowing fingerprints in ONE scan —
    consolidated r5 from fingerprint + winnow_fingerprint. Same column
    names as the two parents: (doc_id, fp_md5, fp_head, n_fps, fp)."""
    from ..util import spread

    text = F.col("text")
    grams = F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1)))
    hashes = F.transform(grams, lambda i: F.md5(text.substr(i.cast("int"), F.lit(k))))
    # spread first (r8): one md5 per character position is the heaviest
    # per-row map in ops.text, and on a single-file sandbox scan the whole
    # projection ran in one task (measured 8.8 s noop at sf0.1). No-op on a
    # wide scan.
    hs = spread(docs.select("doc_id", "text")).select(
        "doc_id",
        F.md5(F.lower(text)).alias("fp_md5"),
        F.md5(F.substring(F.lower(text), 1, 64)).alias("fp_head"),
        hashes.alias("hs"),
    )
    starts = F.sequence(F.lit(1), F.greatest(F.size("hs") - (w - 1), F.lit(1)))
    fps = F.array_distinct(
        F.transform(
            starts,
            lambda s: F.array_min(F.slice(F.col("hs"), s.cast("int"), w)),
        )
    )
    return hs.select(
        "doc_id",
        "fp_md5",
        "fp_head",
        F.size(fps).cast("long").alias("n_fps"),
        F.md5(F.concat_ws(",", F.array_sort(fps))).alias("fp"),
    )


# PII patterns chosen for identical interpretation by Java regex (Spark)
# and RE2 (DuckDB): plain character classes only — no lookaround, no lazy
# quantifiers, no \d shorthand (the bpe_token_count compatibility rule)
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def redact_pii(docs: DataFrame) -> DataFrame:
    """PII scrubbing: emails then phone-shaped digit runs replaced with
    [EMAIL]/[PHONE] markers — the redaction pass a training-corpus build
    runs before materialization. Returns (doc_id, redacted, n_emails,
    n_phones).

    Order matters and is part of the contract: emails are counted and
    redacted FIRST (an address's digits must not also count as a phone);
    phones are then counted on the email-redacted text. Pure column
    algebra — regexp_count/regexp_replace run JVM-side, and the SQL twin
    applies the identical two-step order."""
    after_email = F.regexp_replace(F.col("text"), EMAIL_PATTERN, "[EMAIL]")
    # no spread here (r8): measured 0.64 -> 0.83 s WITH it at sf0.1 — the
    # full-text repartition exchange costs more than two regex passes gain.
    return docs.select(
        "doc_id",
        F.regexp_replace(after_email, PHONE_PATTERN, "[PHONE]").alias("redacted"),
        F.regexp_count(F.col("text"), F.lit(EMAIL_PATTERN))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count(after_email, F.lit(PHONE_PATTERN))
        .cast("long")
        .alias("n_phones"),
    )


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms over the whole corpus — the
    signature-terms operator an LLM-data pipeline uses for topic tagging
    and near-dup triage.

    Scale shape (100 TB): three shuffles, all key-partitioned and
    partial-aggregated — (doc_id, word) term counts, word document
    frequencies, and the per-doc top-k window. The document-frequency side
    is vocabulary-sized, so it joins sort-merge on ``word`` (broadcasting a
    web-scale vocabulary would OOM the build side); stopword-skewed words
    are AQE skew-join eligible. The corpus size enters as a broadcast
    1-row aggregate (cross join), never a driver-side collect.

    Determinism/oracle parity: scores are rounded to 6 decimals BEFORE the
    top-k ordering (Spark's Math.log and DuckDB's libm ln may differ in the
    last ulp; ordering on the rounded value with a ``word`` tie-break keeps
    both engines' rank cutoffs identical).
    """
    from pyspark.sql import Window

    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "word", "tfidf", "rank")
    )

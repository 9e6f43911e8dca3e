"""Text analysis operators: tokenization, counting, quality, language-ID,
fingerprinting. All JVM-side expressions (whole-stage codegen), all
deterministic, all DuckDB-replayable for the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish piece pattern: runs of letters, runs of digits, single other glyph.
PIECE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

#: Tiny per-language stopword marker lists for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, lowercased, empties removed. NULL text
    tokenizes as EMPTY ([] — so size() is 0, not the legacy -1, and no
    consumer needs its own NULL guard)."""
    return F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), "\\s+"),
        lambda t: t != "",
    )


def ngrams_col(toks: Column, n: int) -> Column:
    """Space-joined word ``n``-grams of a token array; a row with fewer
    than ``n`` tokens yields an empty array (callers layer their own
    short-document semantics on top — dedup substitutes a whole-text
    shingle, contamination keeps the empty set).

    THE single place n-gram windows are constructed (dedup shingles,
    cross-doc grams, heavy hitters, contamination hashes all route here):
    a zip_with chain over shifted views of the token array — n−1 array
    allocations per ROW, where the positional ``transform(sequence, i ->
    slice(toks, i, n))`` form allocates a fresh n-element array per GRAM
    (measured 7× slower on the sf0.1 documents scan). Entries where a
    shifted view runs out turn NULL through concat's null propagation and
    the final slice drops them — bit-identical to the positional form.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n == 1:
        # a NULL token array (NULL text) still honors the empty-array
        # contract — the n>=2 arm converts NULL to [] through its when()
        return F.coalesce(toks, F.array().cast("array<string>"))
    acc = toks
    for k in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(toks, k + 1, F.size(toks)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(
        F.size(toks) >= n, F.slice(acc, 1, F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<string>"))


def token_count(text: Column, bpe: bool = False) -> Column:
    """Token count: whitespace (default) or BPE-ish regex pieces. NULL
    text counts 0 (Spark's legacy size(NULL) is -1, which would leak a
    negative count into token budgets and length gates)."""
    text = F.coalesce(text, F.lit(""))
    if bpe:
        return F.size(F.regexp_extract_all(F.lower(text), F.lit(PIECE_PATTERN), 0))
    return F.size(tokens_col(text))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features + a composite score.

    The score is an arbitrary-but-fixed linear blend; what matters is that
    it is deterministic and cheap (one pass of codegen'd expressions).
    NULL text scores as EMPTY text — without the coalesce, size(NULL
    tokens) is -1 under Spark's legacy default and the -1 leaks into
    n_tokens and the score.
    """
    text = F.coalesce(text, F.lit(""))
    toks = tokens_col(text)
    n_tok = F.size(toks)
    n_char = F.length(text)
    punct = F.length(F.regexp_replace(text, "[a-zA-Z0-9\\s]", ""))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    avg_tok_len = F.when(n_tok > 0, (n_char - (n_tok - 1)) / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_char > 0, punct / n_char).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1.0 - punct_ratio) * 0.3
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
    )
    return {
        "n_tokens": n_tok,
        "n_chars": n_char,
        "avg_token_len": avg_tok_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def language_id(text: Column) -> Column:
    """Stopword-marker language heuristic: the language whose marker words
    occur most often wins; ties go to the alphabetically-first language;
    zero hits → 'und' (undetermined)."""
    def _contains(arr):
        return lambda t: F.array_contains(arr, t)

    toks = tokens_col(text)
    scores = []
    for lang, words in sorted(LANG_MARKERS.items()):
        marker_arr = F.array(*[F.lit(w) for w in words])
        scores.append((lang, F.size(F.filter(toks, _contains(marker_arr)))))
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # reverse order so earlier (alphabetical) languages win ties
    for lang, s in reversed(scores):
        out = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(out)
    return out


def dup_word_frac_col(tokens: Column) -> Column:
    """Fraction of repeated words, rounded to 6 (0.0 for empty docs) — the
    single definition shared by :func:`repetition_metrics` and the
    capstone quality gate so the threshold formula cannot drift."""
    from pyspark.sql import functions as F  # noqa: F811

    n = F.size(tokens)
    return F.when(
        n > 0, F.round((n - F.size(F.array_distinct(tokens))) / n, 6)
    ).otherwise(F.lit(0.0))


def repetition_metrics(df, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition features per document:
    ``(id, n_words, dup_word_frac, max_run, top_bigram_count,
    top_bigram_frac)`` — the signals repetition-removal filters threshold
    on (fraction of repeated words, longest consecutive same-word run,
    share of the most frequent word bigram).

    Scale shape: ``dup_word_frac`` and ``max_run`` are pure per-row folds
    over the token array (zero shuffle; the run fold is one
    ``aggregate`` with a 3-field struct accumulator — O(n) per row).
    The top-bigram count CANNOT be a per-row fold without O(n²) work on
    long documents, so it takes the explode route: bigram rows →
    ``groupBy(id, bigram)`` count → ``groupBy(id)`` max — two map-side
    combinable hash aggregates whose shuffles carry (id, md5-sized key,
    count) only, then one id-keyed join back to the narrow per-row frame.
    At 100 TB every stage is embarrassingly parallel and AQE coalesces the
    small post-agg side.
    """
    from pyspark.sql import functions as F  # noqa: F811 — local for clarity

    # NULL text behaves as empty: size(NULL)=-1 under Spark's legacy
    # default would leak a negative n_words, and max_run would go NULL
    toks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
    base = df.select(F.col(id_col), toks.alias("_t"))
    t = F.col("_t")
    n = F.size(t)
    dup_frac = dup_word_frac_col(t)
    # longest consecutive same-word run: left fold carrying
    # (previous word, current run length, best run length)
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    def _step(s, w):
        run = F.when(w == s["prev"], s["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            w.alias("prev"), run.alias("run"), F.greatest(s["best"], run).alias("best")
        )
    max_run = F.aggregate(t, init, _step, lambda s: s["best"])
    per_row = base.select(
        id_col,
        n.alias("n_words"),
        dup_frac.alias("dup_word_frac"),
        max_run.alias("max_run"),
    )
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
    )
    top = (
        base.filter(n >= 2)
        .select(F.col(id_col), F.explode(bigrams).alias("_bg"))
        .groupBy(id_col, "_bg")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("top_bigram_count"))
    )
    return (
        per_row.join(top, id_col, "left")
        .select(
            id_col,
            "n_words",
            "dup_word_frac",
            "max_run",
            F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
            F.when(
                F.col("n_words") >= 2,
                F.round(F.coalesce("top_bigram_count", F.lit(0)) / (F.col("n_words") - 1), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
        )
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (lowercase, strip
    non-alphanumerics, collapse whitespace) — the content-defined identity
    used by exact dedup."""
    norm = F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")
    return F.md5(F.trim(norm))


#: winnowing rolling-hash parameters (shared with the DuckDB oracle)
WINNOW_BASE = 257
WINNOW_MOD = 1_000_003


def winnowing_fingerprints(text: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    character ``k``-gram polynomial rolling hashes → the minimum hash of
    every window of ``w`` consecutive grams → sorted distinct selections.

    The hash is pure 64-bit integer arithmetic
    (``h = (h·257 + code) mod 1000003`` over the normalized text's char
    codes), so any engine replays it exactly — no float, no engine hash
    function. Shorter-than-``k`` docs yield an empty set; fewer than ``w``
    grams collapse to the single global minimum (standard winnowing edge).
    Returns ``array<long>``, one fingerprint set per document row — a
    per-row expression: at 100 TB this is embarrassingly parallel, no
    shuffle at all until someone groups on the exploded fingerprints.
    """
    norm = F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))
    n = F.length(norm)
    # ONE split call chars-ifies the string — `norm` sits in argument
    # position, evaluated once. (Indexing it inside a per-position lambda
    # re-inlines the regexp_replace per character: measured ~90 s over the
    # sf0.01 corpus vs ~4 s for this form. The '(?!^)' pattern may emit a
    # trailing '' → ascii 0; it lands beyond every valid gram index.)
    codes = F.transform(
        F.split(norm, r"(?!^)"), lambda ch: F.ascii(ch).cast("long")
    )
    b, m = F.lit(WINNOW_BASE).cast("long"), F.lit(WINNOW_MOD).cast("long")
    # Rolling hashes via CHAINED zip_with over shifted copies — every
    # subexpression is referenced exactly once, so Spark's interpreted HOF
    # evaluator computes O(n·k) work per row. (The naive
    # transform(i, fold(j, codes[i+j])) form re-inlines `codes` per lambda
    # call — measured O(n²·k), minutes instead of seconds on this corpus.)
    # zip_with pads the shorter side with NULLs; the trailing entries stay
    # NULL-poisoned and are cut off by the final slice.
    h = codes
    for t in range(1, k):
        shifted = F.slice(codes, t + 1, F.greatest(n - t, F.lit(1)))
        h = F.zip_with(h, shifted, lambda a, c: (a * b + c) % m)
    hashes = F.when(n >= k, F.slice(h, 1, n - F.lit(k - 1))).otherwise(
        F.array().cast("array<long>")
    )
    nh = F.size(hashes)
    # window minima, same chained-zip_with shape (least of w shifted copies)
    mn = hashes
    for t in range(1, w):
        mn = F.zip_with(
            mn,
            F.slice(hashes, t + 1, F.greatest(nh - t, F.lit(1))),
            lambda a, c: F.least(a, c),
        )
    wins = (
        F.when(nh == 0, F.array().cast("array<long>"))
        .when(nh < w, F.array(F.array_min(hashes)))
        .otherwise(F.slice(mn, 1, nh - F.lit(w - 1)))
    )
    return F.array_sort(F.array_distinct(wins))


def winnowing_fingerprint_rows(
    df, text_col: str = "text", id_col: str = "doc_id", k: int = 5, w: int = 4
):
    """Winnowing fingerprints as exploded rows (id, fp) — the SCALE form.

    Same algorithm as :func:`winnowing_fingerprints`, but each intermediate
    (normalized text, char codes, gram hashes) is staged as its own column
    across SELECTs, so Catalyst materializes it once per row instead of
    re-inlining the expression per reference (the single-Column form
    references the hash array ~w+4 times; measured 31 s → 5 s over the
    sf0.1 corpus). Still zero shuffles — per-row expressions + explode.
    """
    b, m = F.lit(WINNOW_BASE).cast("long"), F.lit(WINNOW_MOD).cast("long")
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " "))
    s1 = df.select(F.col(id_col), norm.alias("_norm"))
    s2 = s1.select(
        id_col,
        F.length("_norm").alias("_n"),
        F.transform(
            F.split(F.col("_norm"), r"(?!^)"), lambda ch: F.ascii(ch).cast("long")
        ).alias("_codes"),
    )
    n = F.col("_n")
    h = F.col("_codes")
    for t in range(1, k):
        shifted = F.slice(F.col("_codes"), t + 1, F.greatest(n - t, F.lit(1)))
        h = F.zip_with(h, shifted, lambda a, c: (a * b + c) % m)
    s3 = s2.select(
        id_col,
        F.when(n >= k, F.slice(h, 1, n - F.lit(k - 1)))
        .otherwise(F.array().cast("array<long>"))
        .alias("_hashes"),
    )
    hs = F.col("_hashes")
    nh = F.size(hs)
    mn = hs
    for t in range(1, w):
        mn = F.zip_with(
            mn,
            F.slice(hs, t + 1, F.greatest(nh - t, F.lit(1))),
            lambda a, c: F.least(a, c),
        )
    wins = (
        F.when(nh == 0, F.array().cast("array<long>"))
        .when(nh < w, F.array(F.array_min(hs)))
        .otherwise(F.slice(mn, 1, nh - F.lit(w - 1)))
    )
    return s3.select(
        id_col, F.explode(F.array_sort(F.array_distinct(wins))).alias("fp")
    )

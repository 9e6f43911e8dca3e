"""PII scrubbing: redact emails / IPv4 addresses / phone numbers from a
text column and count what was redacted.

The patterns are deliberately written in the regex dialect intersection of
Java (Spark codegen) and RE2 (DuckDB, Go tooling): character classes,
bounded repetition, non-capturing groups, ``\\b`` — no lookarounds, no
backreferences — so the oracle harness replays the scrub bit-identically.

Scale shape: pure per-row ``regexp_replace`` / ``regexp_count``
expressions, whole-stage codegen'd, zero shuffles — at 100 TB this is a
map-only pass that pipelines into whatever filter or sink follows it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (kind, pattern, replacement) — applied IN ORDER. Email first (an address
#: contains digit runs a later pattern could nibble at), then IPv4, then
#: phone. The phone pattern requires a leading ``+`` country-code marker so
#: it cannot fire on arbitrary digit runs in prose.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
)


def scrub_pii(text: Column) -> Column:
    """Text with every PII match replaced by its ``<KIND>`` token, patterns
    applied in :data:`PII_PATTERNS` order (``regexp_replace`` replaces all
    occurrences in both Spark and DuckDB-with-'g')."""
    out = text
    for _, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind redaction counts, keyed ``n_<kind>``.

    Each count is taken on the text AFTER the earlier patterns have been
    scrubbed — i.e. it counts exactly the matches :func:`scrub_pii`
    replaced for that kind, so overlapping matches (an IP-looking substring
    inside an email host) are never double-counted.
    """
    counts: dict[str, Column] = {}
    staged = text
    for kind, pattern, repl in PII_PATTERNS:
        counts[f"n_{kind}"] = F.regexp_count(staged, F.lit(pattern))
        staged = F.regexp_replace(staged, pattern, repl)
    return counts


def strip_markup(text: Column) -> Column:
    """Strip HTML/XML markup from crawl-shaped text: drop ``<script>`` /
    ``<style>`` elements WITH their contents (their bodies are code, not
    prose), remove remaining tags and comments, unescape the five XML
    entities plus numeric ``&#NN;`` for the printable-ASCII range, and
    collapse the whitespace the removals leave behind.

    Same dialect contract as the PII patterns — Java∩RE2 only (bounded
    alternation, ``(?s)``/``(?i)`` inline flags, no lookarounds) — so the
    DuckDB oracle replays every step bit-identically. Entity unescape
    order matters: ``&amp;`` is LAST, so ``&amp;lt;`` decodes to the
    literal ``&lt;`` (one level, the standard single-pass rule), never to
    ``<``. Scale shape: per-row regexp chain, whole-stage codegen, zero
    shuffle — the map-only pre-clean a crawl ingest runs before quality
    scoring and dedup fingerprinting (both of which assume prose).
    """
    out = text
    # script/style elements incl. body; (?is): dot-matches-newline + case-insensitive
    out = F.regexp_replace(out, r"(?is)<script\b[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?is)<style\b[^>]*>.*?</style>", " ")
    # comments, then any remaining tag
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?s)</?[A-Za-z!][^>]*>", " ")
    # numeric entities in the printable-ASCII range → the character itself
    # is not expressible as a pure regex replacement in either engine, so
    # decode the HIGH-VALUE whitespace/punct subset explicitly
    for code, ch in (("32", " "), ("39", "'"), ("34", "\""), ("38", "&")):
        out = F.regexp_replace(out, f"&#{code};", ch)
    for ent, ch in (("lt", "<"), ("gt", ">"), ("quot", "\""), ("apos", "'"), ("nbsp", " ")):
        out = F.regexp_replace(out, f"&{ent};", ch)
    out = F.regexp_replace(out, r"&amp;", "&")
    return F.trim(F.regexp_replace(out, r"\s+", " "))

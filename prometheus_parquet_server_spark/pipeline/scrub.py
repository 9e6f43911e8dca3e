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

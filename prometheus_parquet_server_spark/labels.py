"""Label / metric-name rules and label-matcher compilation.

Reference parity:
- metric-name legalization: /root/reference/src/labels.rs:134-169
- histogram bucket-column regex: /root/reference/src/metricstore.rs:24-26
- matcher semantics (incl. absent-label behavior): /root/reference/src/labels.rs:295-314,
  /root/reference/src/query.rs:176-225
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Metric names must match this after legalization (src/labels.rs:134-140).
LEGAL_METRIC_NAME_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")

#: Histogram bucket column names, capture group 1 = the bucket bound
#: (src/metricstore.rs:24-26): Le0, Le0.5, Le1.0E-4, Le+Inf / Le+inf.
LE_COLUMN_RE = re.compile(r"^Le((\d*(\.\d*)?([eE][-+]?\d+)?)|\+[Ii]nf)$")

#: The metric name is itself a label with this name (src/labels.rs:19-22).
NAME_LABEL = "__name__"


def legalize_metric_name(name: str) -> str:
    """Port of ``make_metric_name_legal`` (src/labels.rs:142-169).

    Prefix ``_`` if the first char is a digit; replace every character
    outside ``[a-zA-Z0-9_]`` with ``_``.
    """
    if not name:
        return "_"
    out = []
    first = name[0]
    if first.isdigit():
        out.append("_")
    for ch in name:
        if ch.isascii() and (ch.isalnum() or ch == "_"):
            out.append(ch)
        else:
            out.append("_")
    return "".join(out)


def suffixed_metric_name(base: str, suffix: str) -> str:
    """Port of ``add_suffix_to_metric`` (src/labels.rs:260-265): append
    ``_<suffix>`` then re-legalize."""
    return legalize_metric_name(f"{base}_{suffix}")


def le_bound(label_value: str) -> float:
    """Parse a `Le` label value into a float bound; ``+Inf``/``+inf`` →
    infinity (src/labels.rs ``to_number_value`` usage in query.rs:306)."""
    if label_value in ("+Inf", "+inf"):
        return float("inf")
    return float(label_value)


@dataclass(frozen=True)
class LabelMatcher:
    """One PromQL label matcher, e.g. ``host=~"web.*"``.

    op ∈ {'=', '!=', '=~', '!~'} (src/query.rs:201-225).
    """

    label: str
    op: str
    value: str

    def predicate(self, labels_col: Column, name_col: Column) -> Column:
        """Compile to a Spark Column predicate over one series row.

        Absent-label semantics (src/labels.rs:300-303): a series whose label
        set lacks ``self.label`` fails EVERY matcher, including ``!=`` and
        ``!~`` — hence the explicit ``isNotNull`` conjunction rather than
        relying on SQL three-valued logic.

        Regexes are unanchored searches, matching Rust ``Regex::is_match``
        (src/query.rs:185-192) — Spark ``rlike`` has the same semantics.
        """
        v = name_col if self.label == NAME_LABEL else labels_col.getItem(self.label)
        if self.op == "=":
            test = v == F.lit(self.value)
        elif self.op == "!=":
            test = v != F.lit(self.value)
        elif self.op == "=~":
            test = v.rlike(self.value)
        elif self.op == "!~":
            test = ~v.rlike(self.value)
        else:  # pragma: no cover
            raise ValueError(f"unknown matcher op {self.op!r}")
        return v.isNotNull() & test

    def matches_value(self, value: str | None) -> bool:
        """Driver-side evaluation of the same semantics (used in tests and
        ingest-time checks)."""
        if value is None:
            return False
        if self.op == "=":
            return value == self.value
        if self.op == "!=":
            return value != self.value
        if self.op == "=~":
            return re.search(self.value, value) is not None
        if self.op == "!~":
            return re.search(self.value, value) is None
        raise ValueError(f"unknown matcher op {self.op!r}")


def matchers_predicate(
    matchers: list[LabelMatcher], labels_col: Column, name_col: Column
) -> Column:
    """Conjunction of all matchers (src/labels.rs:295-314): a series matches
    iff every matcher passes."""
    pred = F.lit(True)
    for m in matchers:
        pred = pred & m.predicate(labels_col, name_col)
    return pred

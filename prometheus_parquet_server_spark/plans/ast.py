"""PromQL AST — the subset the reference consumes from the promql crate
(/root/reference/src/query.rs:548-581 and Cargo.toml's promql v0.4.2).

Node kinds actually interpreted: scalar literals, vector selectors (with
matchers, ``[range]``, ``offset``), and function calls with an optional
``by``/``without`` aggregation modifier. Binary operators and negation parse
in the reference's grammar but error in its interpreter — our parser mirrors
that by raising at parse time with the same messages.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from prometheus_parquet_server_spark.labels import LabelMatcher


@dataclass(frozen=True)
class ScalarNode:
    value: float


@dataclass(frozen=True)
class SelectorNode:
    matchers: tuple[LabelMatcher, ...]
    range_s: int | None = None  # [5m] → 300 (integer seconds, like the promql crate)
    offset_s: int | None = None


@dataclass(frozen=True)
class AggMod:
    action: str  # 'by' | 'without'
    labels: tuple[str, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class FuncNode:
    name: str
    args: tuple["Node", ...]
    agg: AggMod | None = None


Node = ScalarNode | SelectorNode | FuncNode

"""PromQL AST — the subset the reference consumes from the promql crate
(/root/reference/src/query.rs:548-581 and Cargo.toml's promql v0.4.2),
plus binary/unary expressions.

Node kinds the reference interprets: scalar literals, vector selectors
(with matchers, ``[range]``, ``offset``), and function calls with an
optional ``by``/``without`` aggregation modifier. Binary operators and
negation parse in the reference's grammar but error in its interpreter
("Not implemented yet" / negation, src/query.rs:550-552, 577-579) — like
``sum without`` (SURVEY §2.5 A2/A3) we implement them anyway with
real-PromQL semantics (operators/binop.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from prometheus_parquet_server_spark.labels import LabelMatcher


@dataclass(frozen=True)
class ScalarNode:
    value: float


@dataclass(frozen=True)
class StringNode:
    """String literal argument (label_replace / label_join)."""

    value: str


@dataclass(frozen=True)
class SelectorNode:
    matchers: tuple[LabelMatcher, ...]
    range_s: int | None = None  # [5m] → 300 (integer seconds, like the promql crate)
    offset_s: int | None = None
    #: ``@`` modifier: a fixed unix timestamp, or "start"/"end" (resolved
    #: against the query grid at evaluation time)
    at_s: float | str | None = None


@dataclass(frozen=True)
class AggMod:
    action: str  # 'by' | 'without'
    labels: tuple[str, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class FuncNode:
    name: str
    args: tuple["Node", ...]
    agg: AggMod | None = None


@dataclass(frozen=True)
class VectorMatching:
    """``on(...)`` / ``ignoring(...)`` with optional ``group_left(...)`` /
    ``group_right(...)``."""

    on: tuple[str, ...] | None = None  # None = match on full label set
    ignoring: tuple[str, ...] = ()
    group: str | None = None  # None | 'left' | 'right'
    include: tuple[str, ...] = ()


@dataclass(frozen=True)
class BinaryNode:
    op: str  # + - * / % ^ == != > < >= <= and or unless
    lhs: "Node"
    rhs: "Node"
    bool_mode: bool = False
    matching: VectorMatching | None = None


@dataclass(frozen=True)
class UnaryNode:
    """Unary minus (the reference's Node::Negation, rejected there)."""

    operand: "Node"


@dataclass(frozen=True)
class SubqueryNode:
    """``expr[range:step]`` — evaluate ``expr`` on a finer inner grid and
    expose the aligned result as a range vector."""

    expr: "Node"
    range_s: int
    step_s: int | None = None  # None → outer grid step
    offset_s: int | None = None
    #: ``@`` modifier: pin the subquery window to one fixed instant
    #: (unix seconds, or "start"/"end" resolved against the query grid) —
    #: the consuming function then yields the same value at every step
    at_s: float | str | None = None


Node = (
    ScalarNode
    | StringNode
    | SelectorNode
    | FuncNode
    | BinaryNode
    | UnaryNode
    | SubqueryNode
)

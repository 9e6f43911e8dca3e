#!/usr/bin/env python
"""Canonical per-row dump of a graded query — Spark side, oracle side, or
both — so a DRIVER hash mismatch can be diffed offline instead of guessed
at (the round-7 verdict's prescription: events_sessionize was red in two
consecutive driver runs while bit-identical to its oracle locally; nobody
could see WHICH rows the driver's environment disagreed on).

Writes one file per engine with one line per row: columns sorted by name,
cells in the strict type-tagged canonical form of scripts/check_oracles.py
(full-repr floats, signed-zero-aware, NaN canonicalized). Lines are sorted,
so two dumps from ANY two environments diff cleanly with `diff`/`comm`.

Usage:
  python scripts/dump_graded.py <query> [sf_dir] [--spark-only|--oracle-only]
                                [--out DIR]

Typical driver-mismatch workflow: run with --spark-only in the failing
environment, fetch the dump, and `diff` it against a local oracle dump —
the differing canonical lines identify the rows and columns at fault.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_oracles import TABLES, norm_rows, norm_cell_strict  # noqa: E402


def main() -> int:
    args = list(sys.argv[1:])
    spark_only = "--spark-only" in args
    oracle_only = "--oracle-only" in args
    args = [a for a in args if a not in ("--spark-only", "--oracle-only")]
    out_dir = "."
    if "--out" in args:
        i = args.index("--out")
        out_dir = args[i + 1]
        del args[i : i + 2]
    if not args:
        print(__doc__)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if name not in queries:
        print(f"unknown query {name!r}; known: {sorted(queries)[:10]}…")
        return 2

    written = []
    if not oracle_only:
        from prometheus_parquet_server_spark import get_spark

        spark = get_spark("dump-graded")
        sdf = queries[name](spark, sf_dir)
        lines = norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()],
                          norm_cell_strict)
        path = os.path.join(out_dir, f"{name}.spark.canonical.txt")
        with open(path, "w") as f:
            f.write(f"# query={name} engine=spark sf_dir={sf_dir}\n")
            f.write(f"# cols(sorted)={sorted(sdf.columns)}\n")
            f.write("\n".join(lines) + "\n")
        written.append((path, len(lines)))

    if not spark_only:
        if name not in oracles:
            print(f"{name} has no oracle (rows-only row) — skipping oracle dump")
        else:
            import duckdb

            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')"
                )
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            lines = norm_rows(ocols, res.fetchall(), norm_cell_strict)
            path = os.path.join(out_dir, f"{name}.oracle.canonical.txt")
            with open(path, "w") as f:
                f.write(
                    f"# query={name} engine=duckdb-{duckdb.__version__} "
                    f"sf_dir={sf_dir}\n"
                )
                f.write(f"# cols(sorted)={sorted(ocols)}\n")
                f.write("\n".join(lines) + "\n")
            written.append((path, len(lines)))

    for path, n in written:
        print(f"wrote {path} ({n} rows)")
    if len(written) == 2:
        a = open(written[0][0]).read().splitlines()[2:]
        b = open(written[1][0]).read().splitlines()[2:]
        if a == b:
            print("ENGINES IDENTICAL (bit-exact)")
        else:
            sa, sb = set(a), set(b)
            print(f"DIFF: {len(sa - sb)} spark-only / {len(sb - sa)} oracle-only lines")
            for r in list(sa - sb)[:5]:
                print(f"  spark-only: {r}")
            for r in list(sb - sa)[:5]:
                print(f"  oracle-only: {r}")
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

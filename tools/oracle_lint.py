#!/usr/bin/env python3
"""Oracle-SQL width lint (round-14, VERDICT r13 item 1).

Executes (plans) every `SparkEntry.oracleSql` entry under DuckDB against a
small scale-factor directory and fails if any RESULT column has an
unnamed-width type — DuckDB silently widens `sum(BIGINT)` and any
arithmetic involving such a sum to HUGEINT, and the driver's hasher
distinguishes HUGEINT from BIGINT even when every value agrees (this
exact failure mode cost t47/u2 their green rows in round 13 and q-family
rows in round 10).  Rule: every output column must land on a named SQL
width (BIGINT/INT/DOUBLE/VARCHAR/BOOLEAN/DATE/TIMESTAMP/...) — i.e. the
oracle author must `cast(sum(x) AS bigint)` explicitly.

Usage: oracle_lint.py <oracle_sql.json> <sf_dir>
  <oracle_sql.json>  {"query_name": "SELECT ...", ...}
  <sf_dir>           directory of <table>.parquet files

Exit 0 = clean; exit 1 = violations (one JSON line per violation on
stdout); exit 3 = environment problem (caller should SKIP, not fail).

Invoked by OracleLintSpec via a python3 subprocess; the spec cancels
itself when python3/duckdb/testdata are absent so `sbt test` stays
portable.  Dev-tool only — the engine itself never imports DuckDB.
"""
import json
import os
import sys

BAD_TYPES = ("HUGEINT", "UHUGEINT")


def main() -> int:
    try:
        import duckdb  # noqa: driver-side package, probed by the caller
    except Exception as e:  # pragma: no cover
        print(json.dumps({"env_error": f"duckdb import failed: {e}"}))
        return 3

    sql_path, sf_dir = sys.argv[1], sys.argv[2]
    if not os.path.isdir(sf_dir):
        print(json.dumps({"env_error": f"no sf dir {sf_dir}"}))
        return 3
    with open(sql_path) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for fn in sorted(os.listdir(sf_dir)):
        if fn.endswith(".parquet"):
            t = fn[: -len(".parquet")]
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, fn)}')"
            )

    violations = []
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            rel = con.sql(sql)  # plans only; .types needs no execution
            cols, types = rel.columns, [str(t) for t in rel.types]
        except Exception as e:
            violations.append({"query": name, "error": str(e).splitlines()[0]})
            continue
        for c, t in zip(cols, types):
            up = t.upper()
            if any(b in up for b in BAD_TYPES):
                violations.append(
                    {"query": name, "column": c, "type": t,
                     "fix": f"cast({c} AS bigint) in the oracle SQL"})
            if "(" in c or c.strip() == "" or c.lower().startswith("unnamed"):
                violations.append(
                    {"query": name, "column": c, "type": t,
                     "fix": "alias the expression (AS <name>) in the oracle SQL"})

    for v in violations:
        print(json.dumps(v))
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())

"""Round-close full-registry oracle-parity artifact.

The driver's CORRECTNESS gate samples ~50 of the registry's queries at
sf0.01; this script runs ALL of them at sf0.01 (the driver's scale) and
writes a committed artifact next to BENCH so every round carries
driver-scale oracle evidence for the whole registry, not a sample:

    python scripts/parity_artifact.py [round_no] [sf]

writes PARITY_r{N}.json: {"sf": ..., "n_queries": ..., "n_oracle": ...,
"n_pass": ..., "n_rows_only": ..., "failures": {...}, "results":
{name: "pass" | "rows_only:<n>" | "FAIL:<reason>"}}.

Comparison mirrors tests/test_oracle_parity.py (and the driver): sort
columns by name, sort rows by all columns, exact compare with NaN/None
unified and floats compared by value.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canonical(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf) and len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf.reset_index(drop=True)


def compare(got, want):
    if list(got.columns) != list(want.columns):
        return "columns: %s != %s" % (list(got.columns), list(want.columns))
    if len(got) != len(want):
        return "rows: spark=%d duck=%d" % (len(got), len(want))
    for col in got.columns:
        for i, (gv, wv) in enumerate(zip(got[col], want[col])):
            g_nan = gv is None or (isinstance(gv, float) and math.isnan(gv))
            w_nan = wv is None or (isinstance(wv, float) and math.isnan(wv))
            if g_nan or w_nan:
                if not (g_nan and w_nan):
                    return "%s[%d]: %r != %r" % (col, i, gv, wv)
            elif isinstance(gv, float) or isinstance(wv, float):
                if float(gv) != float(wv):
                    return "%s[%d]: %r != %r" % (col, i, gv, wv)
            elif gv != wv:
                return "%s[%d]: %r != %r" % (col, i, gv, wv)
    return None


def main():
    round_no = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf = sys.argv[2] if len(sys.argv) > 2 else "sf0.01"
    sf_dir = "/root/testdata/%s" % sf

    import duckdb
    from pyspark.sql import SparkSession

    from bamboo_spark.queries import TABLES, oracle_sql, queries

    spark = (
        SparkSession.builder.master(
            "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32")
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            "create view %s as select * from '%s/%s.parquet'" % (t, sf_dir, t)
        )
    qs, oracles = queries(), oracle_sql()
    results, failures = {}, {}
    t0 = time.time()
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, sf_dir)
            got = canonical(sdf.toPandas())
            sql = oracles.get(name)
            if sql is None:
                results[name] = "rows_only:%d" % len(got)
                continue
            want = canonical(con.sql(sql).df())
            err = compare(got, want)
            if err is None:
                results[name] = "pass"
            else:
                results[name] = "FAIL:%s" % err[:200]
                failures[name] = err[:500]
        except Exception as exc:  # noqa: BLE001 — artifact must be total
            results[name] = "FAIL:exception:%s" % str(exc)[:200]
            failures[name] = str(exc)[:500]
        print("%-40s %s" % (name, results[name][:80]), flush=True)
    out = {
        "sf": sf,
        "elapsed_sec": round(time.time() - t0, 1),
        "n_queries": len(qs),
        "n_oracle": sum(1 for n in qs if n in oracles),
        "n_pass": sum(1 for v in results.values() if v == "pass"),
        "n_rows_only": sum(
            1 for v in results.values() if v.startswith("rows_only")
        ),
        "failures": failures,
        "results": results,
    }
    path = "PARITY_r%02d.json" % round_no if round_no else "PARITY.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(
        "\n%s: %d/%d pass, %d rows-only, %d FAIL (%.0fs)"
        % (
            path,
            out["n_pass"],
            out["n_oracle"],
            out["n_rows_only"],
            len(failures),
            out["elapsed_sec"],
        )
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

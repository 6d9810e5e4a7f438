"""Local twin of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle over the same
parquet, then compares row-count + column names + order-insensitive values
(exact equality — stricter than any value-hash tolerance the driver might
apply). Usage:

    python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import traceback

import duckdb
import pandas as pd


def duck_run(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types for comparison
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def dtype_kind(s: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    # Type-faithfulness guard: the driver's value hash is type-sensitive, so
    # an uncast DuckDB SUM(int) (HUGEINT -> pandas float64) vs Spark BIGINT
    # (int64) must FAIL here even though the numeric values compare equal.
    for c in sorted(sdf.columns):
        ks, ko = dtype_kind(sdf[c]), dtype_kind(odf[c])
        if ks != ko:
            problems.append(
                f"dtype kind mismatch on '{c}': spark={sdf[c].dtype}({ks}) "
                f"oracle={odf[c].dtype}({ko}) — uncast HUGEINT/DOUBLE in oracle?"
            )
    if problems:
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
    a, b = normalize(sdf), normalize(odf)
    if len(a) == len(b):
        neq = (a.fillna("<NULL>") != b.fillna("<NULL>"))
        if neq.any().any():
            bad_cols = [c for c in a.columns if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            problems.append(
                f"values differ in cols {bad_cols}; first diff row {i}: "
                f"spark={a.iloc[i].to_dict()} oracle={b.iloc[i].to_dict()}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from gmall_flink_realtime4_spark.plans.catalog import oracles, queries
    from gmall_flink_realtime4_spark.session import get_spark

    qs, os_ = queries(), oracles()
    unknown = sorted(only - set(qs))
    if unknown:  # a typo must not print '0 failures' after zero compares
        print(f"unknown query name(s): {unknown}")
        sys.exit(2)
    spark = get_spark("parity", shuffle_partitions=8)

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            failed.append(name)
            continue
        if name not in os_:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle — rows-only check)")
            continue
        try:
            odf = duck_run(sf_dir, os_[name])
        except Exception:
            print(f"FAIL  {name}: oracle raised\n{traceback.format_exc()}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems))
            failed.append(name)
        else:
            print(f"OK    {name}: {len(sdf)} rows")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

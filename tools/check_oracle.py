"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries()[k] on Spark and, where an
oracle_sql()[k] exists, the same SQL through DuckDB over the sf dir's
parquet views; compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted,
values canonicalized). Usage:

    python -m tools.check_oracle [sf_dir] [query ...]

Strictness mirrors the external driver (ADVICE r1):
  * both sides go through pandas (Spark toPandas / duckdb .df()), so
    DuckDB HUGEINT becomes float64 and renders '11.0' against Spark's
    '11' — the type drift the r1 gate caught and the old fetchall-based
    checker missed;
  * floats are canonicalized with repr() — no %.6g truncation, no
    11.0→11 integral collapse;
  * the frame is run through pandas sort_values over every column first,
    so array-typed cells crash here exactly like they crash the driver's
    canonicalizer (TypeError: unhashable type 'list').
"""

from __future__ import annotations

import hashlib
import sys


def _canon(v) -> str:
    import pandas as pd

    if v is None:
        return "∅"
    if hasattr(v, "item"):  # numpy scalar → python scalar
        v = v.item()
    try:
        if v is not None and not isinstance(v, (list, tuple, dict, set)) and pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        return repr(v)  # preserves 11.0 vs 11 — the driver does too
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def frame_hash(pdf) -> str:
    """Order-insensitive hash: columns sorted by name, canon rows sorted.

    Cell values are length-prefixed before joining: text columns carry
    real newlines (reassembled docs, extracted_text) and could carry the
    cell separator itself, so bare join/\\n-concat made two DIFFERENT
    result sets hash identically when a newline shifted across a row
    boundary — an OK verdict on a real divergence (r6 review)."""
    cols = sorted(pdf.columns)
    # driver parity: the external canonicalizer sorts with pandas, which
    # raises TypeError on list cells — surface the same failure here
    pdf.sort_values(by=cols, kind="mergesort")
    lines = sorted(
        "".join(f"{len(c)}:{c}" for c in (_canon(v) for v in row))
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(argv: list[str]) -> int:
    import os

    import duckdb

    import __spark_entry__ as entrymod
    from pdf_to_text_spark.config import build_spark
    from pdf_to_text_spark.sources.catalog import TABLES

    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    # VALUES-style oracles precompute from the parquet they'll be checked
    # against — point them at the same sf dir we're running
    os.environ["PTS_ORACLE_SF_DIR"] = sf_dir

    qs = entrymod.queries()
    unknown = only - qs.keys()
    if unknown:
        # a typo'd name silently filtering every query out would print
        # 'ALL OK' having checked NOTHING (r3 review) — fail loud, and
        # BEFORE the ~15s JVM launch the error makes pointless (r6 review)
        print(f"ERROR: unknown queries: {sorted(unknown)}")
        return 2

    spark = build_spark("check-oracle", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    # _only skips building the expensive VALUES oracles we won't compare.
    # A single broken oracle BUILD must surface as that query's FAIL, not
    # crash the whole gate before any per-query report (r3 review) —
    # fall back to per-query builds when the batch build raises.
    broken: dict[str, Exception] = {}
    try:
        oracles = entrymod.oracle_sql(_only=only or None)
    except Exception:
        oracles = {}
        for name in (only or qs.keys()):
            try:
                oracles.update(entrymod.oracle_sql(_only={name}))
            except Exception as e:
                broken[name] = e
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in broken:
            print(f"FAIL  {name}: oracle build error: {broken[name]}")
            failures += 1
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            try:
                frame_hash(spdf)  # crash-probe only; nothing to compare
            # ndarray cells raise ValueError ('truth value is ambiguous'),
            # list cells TypeError — both are driver-canonicalizer crashes
            except (TypeError, ValueError) as e:
                print(f"FAIL  {name}: driver-canonicalizer crash: {e}")
                failures += 1
                continue
            print(f"rows  {name}: {len(spdf)} rows (no oracle — rows-only)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rowcount spark={len(spdf)} duckdb={len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(
                f"cols spark={sorted(spdf.columns)} duckdb={sorted(opdf.columns)}"
            )
        else:
            try:
                hs, ho = frame_hash(spdf), frame_hash(opdf)
            except (TypeError, ValueError) as e:
                problems.append(f"driver-canonicalizer crash: {e}")
            else:
                if hs != ho:
                    problems.append(f"valuehash spark={hs} duckdb={ho}")
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(spdf)} rows")
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views over
<sfDir>/*.parquet, loads the Spark result parquet from <verifyOutDir>/<name>/,
normalizes both (columns sorted by name, rows sorted by all columns), and
compares values. Exit code 1 on any mismatch.
"""
import decimal
import glob
import json
import math
import sys

import duckdb
import pandas as pd


def _decimals(s: pd.Series):
    """Non-null decimal.Decimal values of an object-dtype column.

    SAMPLED: only the first 1000 rows per column are inspected — a wide
    decimal past row 1000 escapes the lint (the gate's value compare
    still covers every row; only the float64-width early warning is
    sampled).
    """
    if s.dtype != object:
        return []
    return [v for v in s.dropna().head(1000)
            if isinstance(v, decimal.Decimal)]


def _too_wide(vals) -> bool:
    """True if any Decimal needs more than 18 significant digits.

    float64's 53-bit mantissa carries ~15.95 decimal digits (integers are
    exact only up to 2^53 ≈ 9.0e15), so any wider decimal that ANY pipeline
    stage renders through float64 (DuckDB→pandas does this for wide
    DECIMALs) silently loses low digits. 18 digits is the repo's safe
    DECIMAL width; beyond it the only hash-stable carrier is a string.
    Width is counted in SIGNIFICANT DIGITS of the exact representation
    (1234567890.123456789 is 19 digits wide despite abs < 1e18), not
    magnitude.
    """
    for v in vals:
        # normalize() strips stored trailing zeros first, so a
        # decimal(38,18) carrying 1.500000000000000000 counts as 2
        # significant digits, not 19. The magnitude check stays as an OR:
        # at abs >= 1e18 even 16-18 significant digits round in float64
        # (2^53 ~ 9.0e15), so neither test alone covers both failure
        # shapes.
        if v != 0 and (len(v.normalize().as_tuple().digits) > 18
                       or abs(v) >= decimal.Decimal(10) ** 18):
            return True
    return False

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf  # exact: queries are engineered for determinism
    return a == b or str(a) == str(b)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            expected = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {out_dir}/{name}")
            failures += 1
            continue
        got = normalize(pd.concat([pd.read_parquet(p) for p in sorted(files)]))
        if list(got.columns) != list(expected.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(expected.columns)}")
            failures += 1
            continue
        if len(got) != len(expected):
            print(f"FAIL {name}: rows {len(got)} != {len(expected)}")
            failures += 1
            continue
        # The driver hashes rendered values, so an int64 Spark column vs a
        # float64 oracle column fails there ("1" vs "1.0") even when the
        # values compare equal numerically. DuckDB sum(BIGINT) -> HUGEINT
        # -> float64 in pandas is the classic cause; the fix is
        # CAST(sum(...) AS BIGINT) in the oracle SQL.
        dtype_bad = None
        for c in got.columns:
            gi = pd.api.types.is_integer_dtype(got[c])
            ei = pd.api.types.is_integer_dtype(expected[c])
            gf = pd.api.types.is_float_dtype(got[c])
            ef = pd.api.types.is_float_dtype(expected[c])
            if (gi and ef) or (gf and ei):
                dtype_bad = (c, got[c].dtype, expected[c].dtype,
                             "CAST the oracle aggregate")
                break
            # Decimal-object vs float64: the round-6 o_table_digest trap.
            # Spark's parquet keeps an exact Decimal object while DuckDB's
            # pandas bridge renders wide DECIMALs as float64 — the values
            # compare equal numerically but the driver hashes RENDERED
            # strings ("345...23" vs "3.45...e+22"), so the row is red on
            # the gate even when the math is right.
            gdec = _decimals(got[c])
            edec = _decimals(expected[c])
            if (gdec and ef) or (gf and edec):
                dtype_bad = (c, got[c].dtype, expected[c].dtype,
                             "Decimal vs float64 render — emit VARCHAR on "
                             "both sides")
                break
            # any DECIMAL wider than 18 digits is float64-unsafe (2^53 ≈
            # 9.0e15: only ~16 digits survive) on ANY render path — the
            # driver, a dashboard, a JSON export. Stringify it in-engine.
            if _too_wide(gdec) or _too_wide(edec):
                dtype_bad = (c, got[c].dtype, expected[c].dtype,
                             "DECIMAL wider than 18 digits cannot survive "
                             "float64 — emit VARCHAR on both sides")
                break
        if dtype_bad:
            c, gd, ed, why = dtype_bad
            print(f"FAIL {name}: dtype mismatch col={c}: spark={gd} oracle={ed}"
                  f" (driver hash would differ; {why})")
            failures += 1
            continue
        bad = None
        for c in got.columns:
            ga, ea = got[c].tolist(), expected[c].tolist()
            for i, (g, e) in enumerate(zip(ga, ea)):
                if not values_equal(g, e):
                    bad = (c, i, g, e)
                    break
            if bad:
                break
        if bad:
            c, i, g, e = bad
            print(f"FAIL {name}: value mismatch col={c} row={i}: spark={g!r} oracle={e!r}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows x {len(got.columns)} cols")
    # queries with no oracle: report rows-only status
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(p)) for p in files) if files else 0
            print(f"INFO {name}: no oracle, rows={n}")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {len(oracle) - failures}/{len(oracle)} oracle matches")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

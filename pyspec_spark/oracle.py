"""Local Spark-vs-DuckDB comparison harness, mimicking the driver's
correctness gate (row-count + schema + order-insensitive value hash,
columns sorted by name).  Used by tests and by ``tools/check.py`` so every
declared query is validated before the driver ever sees it.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from pyspec_spark.tables import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize values for order-insensitive
    comparison: timestamps -> ms-truncated ISO strings, floats -> repr of
    float64, ints -> int64, None/NaN -> sentinel."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.floor("ms").astype("datetime64[ms]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.map(_canon_obj)
    return df


def _canon_obj(v):
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(timespec="milliseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_obj(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(_canon_obj(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return v.item()
    except ImportError:
        pass
    return v


def _row_key(row) -> tuple:
    out = []
    for v in row:
        if isinstance(v, float):
            if math.isnan(v):
                out.append(("nan",))
            else:
                # round-trip via repr so -0.0 == 0.0 distinctions don't flake
                out.append(("f", repr(v + 0.0)))
        elif v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            out.append(("null",))
        else:
            out.append(("v", str(type(v).__name__), str(v)))
    return tuple(out)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        s = "OK " if self.ok else "FAIL"
        msg = f"[{s}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for i in self.issues[:5]:
            msg += f"\n       - {i}"
        return msg


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    issues: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        issues.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return CompareResult(name, False, len(spark_pdf), len(oracle_pdf), issues)
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    if len(a) != len(b):
        issues.append("row count mismatch")
    ka = sorted(_row_key(r) for r in a.itertuples(index=False, name=None))
    kb = sorted(_row_key(r) for r in b.itertuples(index=False, name=None))
    if ka != kb:
        only_a = [r for r in ka if r not in set(kb)][:3]
        only_b = [r for r in kb if r not in set(ka)][:3]
        issues.append(f"value mismatch; spark-only sample: {only_a}")
        issues.append(f"oracle-only sample: {only_b}")
    return CompareResult(name, not issues, len(a), len(b), issues)


def check_query(spark, con, name: str, sf_dir: str) -> CompareResult:
    from pyspec_spark.registry import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if name not in ORACLES:
        ok = True  # rows-only: driver checks rows>=0 and stable schema
        return CompareResult(name, ok, len(spark_pdf), -1, ["rows-only (no oracle)"])
    oracle_pdf = con.execute(ORACLES[name]).fetchdf()
    return compare_frames(name, spark_pdf, oracle_pdf)

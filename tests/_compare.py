"""Order-insensitive DataFrame-vs-oracle comparison (the driver's contract).

Sorts columns by name, canonicalizes values, hashes sorted rows — a Spark
result and a DuckDB result match iff (row count, column names, value hash)
all agree.
"""

from __future__ import annotations

import datetime
import hashlib
import math


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if hasattr(v, "asDict"):  # pyspark Row (struct) — compare key-sorted
        v = v.asDict()
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def assert_matches_oracle(sdf, ddb, sql: str, min_rows: int = 0) -> None:
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]
    res = ddb.execute(sql)
    ocols = [d[0].lower() for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows), f"row count {len(srows)} != oracle {len(orows)}"
    assert len(srows) >= min_rows, f"only {len(srows)} rows (< {min_rows}) — vacuous test"
    assert sorted(scols) == sorted(ocols), f"schema {sorted(scols)} != {sorted(ocols)}"
    sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
    assert sh == oh, f"value hash {sh} != oracle {oh}"

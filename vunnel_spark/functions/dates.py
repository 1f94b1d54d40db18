"""Multi-format date normalization.

The reference funnels every date through dateutil -> '%Y-%m-%d'
(/root/reference/src/vunnel/utils/date.py:6-12).  Spark-first version:
a coalesce over try_to_timestamp with the formats actually seen in the
corpus — stays in codegen for every common format; an Arrow-batched
dateutil UDF is the last-resort fallback (SURVEY §2.11 F8).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# formats observed across the reference's providers (ISO, RFC-ish, compact)
_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "dd MMM yyyy",
    # NOTE: RFC-2822 ("EEE, dd MMM yyyy HH:mm:ss zzz") is deliberately NOT in
    # this list — Spark >=3 rejects textual day-of-week patterns at analysis
    # time (DATETIME_PATTERN_RECOGNITION), which would fail the whole chain.
    # RFC-2822 and other exotic formats go through the dateutil fallback UDF.
]


@F.pandas_udf(T.DateType())
def _dateutil_fallback(s: pd.Series) -> pd.Series:
    from dateutil import parser as du

    def parse(v):
        if v is None:
            return None
        try:
            return du.parse(v).date()
        except (ValueError, OverflowError):
            return None

    return s.map(parse)


def normalize_date(col: Column, with_fallback: bool = False) -> Column:
    """Any supported date string -> DateType (None if unparseable).

    ``try_to_timestamp`` returns NULL instead of raising on mismatch, so a
    coalesce chain implements "first format that parses" — all JVM-side.
    """
    attempts = [F.try_to_timestamp(col, F.lit(fmt)).cast("date") for fmt in _FORMATS]
    if with_fallback:
        attempts.append(_dateutil_fallback(col))
    return F.coalesce(*attempts)

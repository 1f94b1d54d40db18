"""Result sinks: envelope writer, dedup-on-write modes, incremental
first-observed merge, checksum listings.

Spark-first restatement of the reference's result stores
(/root/reference/src/vunnel/result.py:86-302 flat-file + SQLite upsert):
a partitioned Parquet table keyed on ``identifier``, with dedup-on-write
replacing INSERT OR IGNORE/REPLACE and an atomic staged-directory swap
replacing the tmp-file + rename publish.
"""

from vunnel_spark.sinks.writers import (  # noqa: F401
    EnvelopeWriter,
    first_observed_merge,
    write_checksum_listing,
)

"""SLES release-name resolution (SURVEY §2 provider-family proof).

Reference: /root/reference/src/vunnel/providers/sles/parser.py:197-246
``_release_resolver`` — the same SLES version can appear under multiple
release names ('sles-release', 'sles-ltss-release', others), each with
its own vulnerability object, but namespaces key on the VERSION alone,
so exactly one object must win per version:

    one release name for the version          -> it wins, whatever it is
    multiple, one of them 'sles-release'      -> that one (the container
                                                 image channel)
    multiple, one 'sles-ltss-release'         -> that one
    multiple, all unrecognized                -> the version is SKIPPED
                                                 whole for this vuln

The reference walks a {version: {release: vuln}} dict per vulnerability;
here the pick is one aggregation over (vuln_id, version): count + best
priority rank decide, min_by carries the winning payload — one shuffle
on the namespace key, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: recognized release names, in pick priority order (parser.py:229-237)
_RELEASE_PRIORITY = ("sles-release", "sles-ltss-release")


def release_resolver(
    df: DataFrame,
    keys: list[str] | None = None,
    release_col: str = "release",
) -> DataFrame:
    """One row per (vuln, version): the reference's condensing pick.

    ``df`` carries one row per (keys..., release) — release names are
    unique within a group by construction (the reference's inner dict
    keys on them).  Output drops the release column and the
    all-unrecognized multi-release groups.
    """
    if keys is None:
        keys = ["vuln_id", "version"]
    rk = (
        F.when(F.col(release_col) == _RELEASE_PRIORITY[0], F.lit(0))
        .when(F.col(release_col) == _RELEASE_PRIORITY[1], F.lit(1))
        .otherwise(F.lit(2))
    )
    payload = [c for c in df.columns if c not in (*keys, release_col)]
    agg = (
        df.withColumn("_rk", rk)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min("_rk").alias("_best"),
            F.min_by(F.struct(*payload), F.col("_rk")).alias("_pick"),
        )
    )
    return (
        agg
        # single-release versions keep their row whatever the name;
        # multi-release versions need a recognized winner
        .filter((F.col("_n") == 1) | (F.col("_best") <= 1))
        .select(*keys, *[F.col("_pick")[c].alias(c) for c in payload])
    )


def with_sles_cvss(df, vector, out="cvss_obj"):
    """SLES ``_make_cvss`` (sles/parser.py:171-194) appended as struct
    column ``out``: the third CVSS-envelope flavor in the reference,
    distinct from BOTH gated siblings —

    * unlike github's ``_make_legacy_cvss`` (parser.py:604-628) there is
      NO trailing-slash ``removesuffix``: the raw vector feeds CVSS3(),
      so a trailing '/' is a parse error and the object is None;
    * unlike rhel's ``RHELCVSS3`` (parser.py:1155-1176) the base_score
      IS the library-computed score quantized to 0.1 (:179) — no feed
      passthrough — alongside esc/isc quantized the same way and
      ``severities()[0]``; ``status`` is the literal "N/A" (:184).

    Pure composition of the shared functions/cvss.py builders, each
    already oracle-gated (e17 covers computed+strip, rhel2 covers
    no-strip+feed-score; this is computed+no-strip), unit-pinned in
    tests/test_landing.py-style branch tests.  DataFrame form since r14
    (layered one-evaluation projections — see with_rhel_cvss3's note);
    ``vector`` should be an attribute reference on ``df``.
    """
    from vunnel_spark.functions.cvss import cvss3_eval_cols, with_cvss3_eval

    p = "_sc3"
    df = with_cvss3_eval(df, vector, p)
    ok = vector.isNotNull() & F.col(f"{p}_ok")
    obj = F.when(
        ok,
        F.struct(
            F.col(f"{p}_ver").alias("version"),
            vector.alias("vector_string"),
            F.struct(
                F.col(f"{p}_base").alias("base_score"),
                F.col(f"{p}_esc").alias("exploitability_score"),
                F.col(f"{p}_isc").alias("impact_score"),
                F.col(f"{p}_sev").alias("base_severity"),
            ).alias("base_metrics"),
            F.lit("N/A").alias("status"),
        ),
    )
    return df.withColumn(out, obj).drop(*cvss3_eval_cols(p))

"""Audio query (multimodal family; registered in a tail module so the
pinned gate-window composition is untouched): REAL WAV round-trip —
stdlib ``wave`` writes honest RIFF/PCM payloads into a binary column,
Arrow-batched mapInPandas decodes them back and extracts features.

The oracle recomputes every PCM sample analytically (the synth's sine is
closed-form in the doc id, trunc matching trunc), so the decode path is
VALUE-verified end-to-end, not rows-only — the same discipline that
gives the PPM image queries exact oracles.
"""

from __future__ import annotations

from vunnel_spark.queries._util import t
from vunnel_spark.registry import register

_MAX_N = 160 + 49 * 8  # longest clip the synth emits


@register(
    "m4_audio_features",
    f"""
    WITH p AS (
      SELECT doc_id,
             160 + (doc_id % 50) * 8 AS n,
             100 + (doc_id % 400) AS f,
             1000 + (doc_id % 9000) AS a
      FROM documents
    ), s AS (
      SELECT doc_id, n,
             trunc(a * sin(2 * pi() * f * g.t / 8000)) AS v
      FROM p, generate_series(0, {_MAX_N - 1}) AS g(t)
      WHERE g.t < n
    )
    SELECT doc_id AS media_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(n AS INTEGER) AS n_samples,
           CAST(n // 8 AS INTEGER) AS duration_ms,
           CAST(max(abs(v)) AS INTEGER) AS peak_amplitude,
           round(sqrt(avg(v * v)), 4) AS rms
    FROM s GROUP BY doc_id, n
    """,
    doc="Real-WAV audio feature extraction (operators/multimodal.py "
        "synthesize_wav_table + audio_features): honest RIFF/PCM payloads "
        "written and parsed by the stdlib wave codec, features (peak, "
        "RMS, duration) computed from the decoded 16-bit frames in one "
        "Arrow batch hop.  The oracle regenerates every sample "
        "analytically — sine closed-form in the doc id, trunc-for-trunc — "
        "so the whole decode path is value-verified, not rows-only",
    tags=("multimodal", "audio"),
)
def m4(spark, sf_dir):
    from vunnel_spark.operators.multimodal import audio_features, synthesize_wav_table

    docs = t(spark, sf_dir, "documents")
    return audio_features(synthesize_wav_table(docs))


@register(
    "m5_audio_windowed_energy",
    f"""
    WITH p AS (
      SELECT doc_id,
             160 + (doc_id % 50) * 8 AS n,
             100 + (doc_id % 400) AS f,
             1000 + (doc_id % 9000) AS a
      FROM documents
    ), s AS (
      SELECT doc_id, g.t // 80 AS window_idx,
             trunc(a * sin(2 * pi() * f * g.t / 8000)) AS v
      FROM p, generate_series(0, {_MAX_N - 1}) AS g(t)
      WHERE g.t < (n // 80) * 80
    )
    SELECT doc_id AS media_id, CAST(window_idx AS INTEGER) AS window_idx,
           round(sqrt(avg(v * v)), 4) AS rms
    FROM s GROUP BY doc_id, window_idx
    """,
    doc="Windowed audio energy track (operators/multimodal.py "
        "audio_windowed_energy): each decoded clip reshapes into 80-sample "
        "(10 ms) blocks, one RMS row per complete window — the audio "
        "analogue of video frame sampling, and the front end of audio "
        "dedup/quality filters.  Value-verified: the oracle regenerates "
        "every windowed sample analytically",
    tags=("multimodal", "audio"),
)
def m5(spark, sf_dir):
    from vunnel_spark.operators.multimodal import (
        audio_windowed_energy,
        synthesize_wav_table,
    )

    docs = t(spark, sf_dir, "documents")
    return audio_windowed_energy(synthesize_wav_table(docs))


#: multiple of lcm(50, 400, 9000) = 18000 — the synth parameters (and so
#: the payload BYTES) of doc_id and doc_id + _DUP_OFFSET are identical
_DUP_OFFSET = 1_800_000


@register(
    "m6_audio_exact_dedup",
    f"""
    SELECT doc_id + {_DUP_OFFSET} AS dup_id, doc_id AS canonical_id
    FROM documents WHERE doc_id % 5 = 0
    """,
    doc="Exact media dedup by payload digest (the d1 discipline on a "
        "BINARY column — the standard first pass of any media pipeline): "
        "clips synthesized for doc ∪ (every-5th doc + 1.8M, a parameter-"
        "colliding offset, so the planted copies are byte-identical), "
        "grouped on sha2(payload), lowest id canonical.  Raw payloads "
        "never shuffle — only the 32-byte digest does.  The oracle "
        "derives the planted pair set analytically (valid while the "
        "corpus is smaller than the synth's 18000-id parameter period, "
        "i.e. through sf0.1 — beyond that the synth itself repeats "
        "payloads organically and the pair set grows)",
    tags=("multimodal", "audio", "dedup"),
)
def m6(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vunnel_spark.operators.multimodal import synthesize_wav_table

    docs = t(spark, sf_dir, "documents").select("doc_id")
    # The analytic oracle enumerates ONLY the planted pairs, which is the
    # complete duplicate set iff no two organic ids share synth
    # parameters — true while every doc_id is below the synth's 18000-id
    # parameter period (holds through sf0.1).  Past that the operator is
    # still correct but the oracle is stale, so fail loudly instead of
    # letting the gate go red with no hint of which side is wrong.  The
    # guard is a per-row assert EMBEDDED IN THE PLAN (a filter can't be
    # pruned away), so building the query stays a pure plan construction
    # — no eager driver-side scan before .explain() or the action.
    docs = docs.filter(
        F.assert_true(
            F.col("doc_id") < 18_000,
            F.lit(
                "m6's planted-pair oracle is only valid while doc_id < "
                "18000 (the wav synth's parameter period); at this scale "
                "organic payload repeats add pairs the oracle does not "
                "list — regenerate the oracle instead of trusting it"
            ),
        ).isNull()
    )
    planted = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + _DUP_OFFSET).alias("doc_id")
    )
    media = synthesize_wav_table(docs.unionByName(planted))
    digests = media.select(
        "media_id", F.sha2(F.col("payload"), 256).alias("_digest")
    )
    w = Window.partitionBy("_digest")
    return (
        digests.withColumn("canonical_id", F.min("media_id").over(w))
        .filter(F.col("media_id") != F.col("canonical_id"))
        .select(F.col("media_id").alias("dup_id"), "canonical_id")
    )


@register(
    "m17_flac_audio_features",
    f"""
    WITH p AS (
      SELECT doc_id,
             168 + (doc_id % 40) * 8 AS n,
             120 + (doc_id % 350) AS f,
             900 + (doc_id % 8000) AS a
      FROM documents
    ), s AS (
      SELECT doc_id, n,
             trunc(a * sin(2 * pi() * f * g.t / 8000)) AS v
      FROM p, generate_series(0, {_MAX_N - 1}) AS g(t)
      WHERE g.t < n
    )
    SELECT doc_id AS media_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(n AS INTEGER) AS n_samples,
           CAST(n // 8 AS INTEGER) AS duration_ms,
           CAST(max(abs(v)) AS INTEGER) AS peak_amplitude,
           round(sqrt(avg(v * v)), 4) AS rms
    FROM s GROUP BY doc_id, n
    """,
    doc="REAL-FLAC audio feature extraction (operators/multimodal.py "
        "encode_flac/decode_flac + synthesize_flac_table): honest FLAC "
        "payloads — STREAMINFO with the audio MD5, FIXED-predictor "
        "subframes, rice-coded residuals, CRC-8/CRC-16 checks — decoded "
        "back to bit-exact PCM inside audio_features' Arrow batch hop.  "
        "FLAC is lossless, so the oracle regenerates every sample "
        "analytically like m4 and the whole compressed-audio decode "
        "path is value-verified, not rows-only",
    tags=("multimodal", "audio"),
)
def m17(spark, sf_dir):
    from vunnel_spark.operators.multimodal import audio_features, synthesize_flac_table

    docs = t(spark, sf_dir, "documents")
    return audio_features(synthesize_flac_table(docs))


@register(
    "m18_stereo_flac_features",
    f"""
    WITH p AS (
      SELECT doc_id,
             160 + (doc_id % 36) * 8 AS n,
             110 + (doc_id % 300) AS fl,
             130 + (doc_id % 320) AS fr,
             800 + (doc_id % 7000) AS a
      FROM documents
    ), s AS (
      SELECT doc_id, n,
             trunc(a * sin(2 * pi() * fl * g.t / 8000)) AS l,
             trunc(a * sin(2 * pi() * fr * g.t / 8000)) AS r
      FROM p, generate_series(0, {_MAX_N - 1}) AS g(t)
      WHERE g.t < n
    )
    SELECT doc_id AS media_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(n AS INTEGER) AS n_samples,
           CAST(max(abs(l)) AS INTEGER) AS peak_left,
           CAST(max(abs(r)) AS INTEGER) AS peak_right,
           round(sqrt(avg(l * l)), 4) AS rms_left,
           round(sqrt(avg(r * r)), 4) AS rms_right,
           CAST(sum(CAST(l AS BIGINT) * CAST(r AS BIGINT)) AS BIGINT) AS lr_dot
    FROM s GROUP BY doc_id, n
    """,
    doc="REAL stereo-FLAC decode with channel decorrelation "
        "(operators/multimodal.py encode_flac_stereo/decode_flac + "
        "synthesize_stereo_flac_table): all four spec channel "
        "assignments — independent L/R, left-side, right-side, and "
        "mid-side with the parity-bit reconstruction — rotate through "
        "the corpus by id, alternating FIXED and LPC subframes, with "
        "the side channel carried at the spec's 17 bits.  FLAC is "
        "lossless, so both channels regenerate analytically in the "
        "oracle and the decorrelation math is value-verified; lr_dot "
        "(exact integer sum of L_t*R_t) is the statistic any "
        "reconstruction slip would move",
    tags=("multimodal", "audio"),
)
def m18(spark, sf_dir):
    from vunnel_spark.operators.multimodal import (
        stereo_audio_features,
        synthesize_stereo_flac_table,
    )

    docs = t(spark, sf_dir, "documents")
    return stereo_audio_features(synthesize_stereo_flac_table(docs))

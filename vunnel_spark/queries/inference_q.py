"""Batch model-inference query (LLM-pipeline surface, extends the
x-family): score every document with an EXPORTED quality classifier.

The production curation step this models: a lightweight quality model
(fastText/CCNet-style logistic over surface features) scores the whole
corpus and gates what enters training.  A linear/logistic model exports
as plain arithmetic — weights become plan literals and the entire
inference pipelines into the scan's codegen span, zero Python, zero
shuffle, exactly reproducible in any engine (hence the exact oracle).
That is the preferred deployment shape at 100 TB; models that cannot
export to expressions (a real fastText binary, a small transformer)
instead ship through the Arrow mapInPandas pattern the multimodal
family demonstrates (operators/multimodal.py): broadcast the model
bytes, score per Arrow batch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.queries._util import t
from vunnel_spark.registry import register

# exported model: hand-pinned stand-ins for trained logistic weights
# (swap for the real export; the PLUMBING — literal weights, expression
# scoring, threshold gate — is the operator)
_W_LOGLEN = 0.35      # longer docs score higher...
_W_LOGTOK = 0.25      # ...and so do more tokens
_W_PUNCT = -6.0       # punctuation floods are spam signals
_W_DIGIT = -3.0       # digit floods are boilerplate/id dumps
_BIAS = -2.2
_THRESHOLD = 0.5


@register(
    "x15_quality_inference",
    f"""
    WITH feats AS (
      SELECT doc_id,
             ln(1 + length(trim(text))) AS f_loglen,
             ln(1 + len(regexp_split_to_array(trim(text), '\\s+'))) AS f_logtok,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                       / CAST(length(text) AS DOUBLE) END AS f_punct,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[^0-9]', '', 'g'))
                       / CAST(length(text) AS DOUBLE) END AS f_digit
      FROM documents
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-({_BIAS} + {_W_LOGLEN} * f_loglen
                 + {_W_LOGTOK} * f_logtok + {_W_PUNCT} * f_punct
                 + {_W_DIGIT} * f_digit))), 6) AS quality,
           (1.0 / (1.0 + exp(-({_BIAS} + {_W_LOGLEN} * f_loglen
                 + {_W_LOGTOK} * f_logtok + {_W_PUNCT} * f_punct
                 + {_W_DIGIT} * f_digit)))) >= {_THRESHOLD} AS kept
    FROM feats
    """,
    doc="Exported-model batch inference: a logistic quality classifier "
        "over surface features (log length/tokens, punctuation and digit "
        "ratios) scores every document.  Weights are plan literals, the "
        "sigmoid is a scan-fused expression — zero Python, zero shuffle, "
        "bit-reproducible (exact oracle).  Non-exportable models take "
        "the multimodal family's broadcast + Arrow mapInPandas path "
        "instead",
    tags=("text", "inference"),
)
def x15(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    txt = F.col("text")
    trimmed = F.trim(txt)
    ln_len = F.log(F.lit(1.0) + F.length(trimmed))
    ln_tok = F.log(F.lit(1.0) + F.size(F.split(trimmed, r"\s+")))
    denom = F.length(txt).cast("double")
    punct = F.when(F.length(txt) == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(txt, r"[^.,!?;:]", "")) / denom
    )
    digit = F.when(F.length(txt) == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(txt, r"[^0-9]", "")) / denom
    )
    z = (
        F.lit(_BIAS)
        + F.lit(_W_LOGLEN) * ln_len
        + F.lit(_W_LOGTOK) * ln_tok
        + F.lit(_W_PUNCT) * punct
        + F.lit(_W_DIGIT) * digit
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return docs.select(
        "doc_id",
        F.round(score, 6).alias("quality"),
        (score >= F.lit(_THRESHOLD)).alias("kept"),
    )

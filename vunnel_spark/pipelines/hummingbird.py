"""Hummingbird CSAF-VEX subsetting pipeline (second CSAF consumer).

Reference flow (/root/reference/src/vunnel/providers/hummingbird/
parser.py:86-138 ``_subset_document`` and helpers 143-252):

    1. platform ids = product-tree branches whose CPE starts with
       'cpe:/a:redhat:hummingbird'
    2. keep relationships whose relates_to_product_reference is a
       hummingbird platform; their composite ids + package refs survive
    3. filter_ids = platform ids ∪ composite ids
    4. per vulnerability: product_status / remediations / scores keep
       only filter_ids members; a CVE with no surviving status drops

The reference walks one CSAF JSON document at a time with Python sets;
here each layer is a DataFrame and the set-membership tests become
joins: the platform dimension is broadcast (it is tiny by construction
— one row per hummingbird platform), composite membership is the
equi-join against the kept relationships, and every per-vulnerability
filter is a semi-join.  Nothing is per-document; one plan subsets the
whole advisory corpus.

MODELING ASSUMPTION (corpus-level joins vs the reference's per-file
sets): CSAF product ids are document-scoped identifiers in general,
but Red Hat's VEX generator derives them deterministically from the
product CPE/purl, so the same id string denotes the same product in
every document — which is exactly what makes the corpus-level join
equal to the per-document subset.  Feeding this pipeline CSAF from a
publisher whose ids are NOT globally consistent requires adding the
document key to branches/relationships and to every join below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HUMMINGBIRD_CPE_PREFIX = "cpe:/a:redhat:hummingbird"


def platform_ids(branches: DataFrame) -> DataFrame:
    """(platform_id) — branches CPE-matched to the hummingbird prefix
    (parser.py:32-35, 100-105)."""
    return (
        branches.filter(
            F.col("cpe").startswith(HUMMINGBIRD_CPE_PREFIX)
            & F.col("product_id").isNotNull()
        )
        .select(F.col("product_id").alias("platform_id"))
        .distinct()
    )


def kept_relationships(relationships: DataFrame, platforms: DataFrame) -> DataFrame:
    """(composite_id, package, platform_id) — relationships whose
    relates_to is a hummingbird platform (parser.py:143-160)."""
    return relationships.join(
        F.broadcast(platforms),
        relationships["relates_to"] == platforms["platform_id"],
    ).select("composite_id", F.col("product_reference").alias("package"), "platform_id")


def hummingbird_pipeline(
    branches: DataFrame,
    relationships: DataFrame,
    product_status: DataFrame,
    scores: DataFrame,
    remediations: DataFrame,
) -> DataFrame:
    """One row per surviving (cve_id, product_id) status entry, with the
    package/platform resolved for composite products (platform-level
    entries keep package null) and the CVE's filtered score/remediation
    attached when one names the same product."""
    plats = platform_ids(branches)
    rels = kept_relationships(relationships, plats)

    # filter_ids membership, split by kind so the platform side stays a
    # broadcast and the composite side is a plain equi-join on the kept
    # relationship frame (no unioned id set to materialize):
    status_platform = product_status.join(
        F.broadcast(plats),
        product_status["product_id"] == plats["platform_id"],
    ).select(
        "cve_id",
        "product_id",
        "status",
        F.lit(None).cast("string").alias("package"),
        F.col("platform_id").alias("platform"),
    )
    status_composite = product_status.join(
        rels, product_status["product_id"] == rels["composite_id"]
    ).select(
        "cve_id",
        "product_id",
        "status",
        "package",
        F.col("platform_id").alias("platform"),
    )
    status = status_platform.unionByName(status_composite)

    surviving_scores = (
        scores.join(F.broadcast(plats), scores["product_id"] == plats["platform_id"])
        .select("cve_id", "product_id", "score")
        .unionByName(
            scores.join(rels, scores["product_id"] == rels["composite_id"]).select(
                "cve_id", "product_id", "score"
            )
        )
        .groupBy("cve_id", "product_id")
        .agg(F.min("score").alias("score"))
    )
    surviving_rems = (
        remediations.join(
            F.broadcast(plats), remediations["product_id"] == plats["platform_id"]
        )
        .select("cve_id", "product_id", "category")
        .unionByName(
            remediations.join(
                rels, remediations["product_id"] == rels["composite_id"]
            ).select("cve_id", "product_id", "category")
        )
        .groupBy("cve_id", "product_id")
        .agg(F.min("category").alias("category"))
    )
    return (
        status.join(surviving_scores, ["cve_id", "product_id"], "left")
        .join(surviving_rems, ["cve_id", "product_id"], "left")
        .select(
            "cve_id", "product_id", "status", "package", "platform",
            "score", "category",
        )
    )

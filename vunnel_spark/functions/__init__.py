"""Scalar/column function library.

Modules:
    versions   rpm/dpkg/apk version total orderings as order-preserving
               sortable keys (pandas UDFs) — SURVEY §2.11 F1/F2, §4.3(1)
    severity   severity normalization + ranking — SURVEY §2.2 P8, §2.5 A2
    dates      multi-format date normalization — SURVEY §2.2 P13, §2.11 F8
    text       language-ID, quality scoring, token counting, fingerprints
    vectors    cosine similarity / dot products over array<float> columns
"""

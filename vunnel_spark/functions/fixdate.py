"""Fix-date store key normalization (reference tool/fixdate).

The reference's fix-date lookups never probe with raw keys: finder.best
normalizes the ECOSYSTEM first (finder.py:109-115, applied at :147
before any store is consulted), and the store itself normalizes the
PACKAGE NAME both at write and at lookup
(vunnel_first_observed.py:81/:128 via ecosystem.py
``normalize_package_name``), so the store's key space is normalized on
both sides.  Any Spark model that joins a store dim on raw (pkg, eco)
misses where the reference hits (e.g. a GHSA 'java' ecosystem is stored
and probed as 'java-archive'; a PyPI 'foo_bar' as 'foo-bar').

Dim contract: a reference-built store carries NORMALIZED keys, so dims
fed to the pipelines here must too; the probe side applies these same
functions (r13 fidelity find).

The CPE dispatch branch (vunnel_first_observed.py:75-79/:122-126:
probes starting with 'cpe:' case-insensitively match ``full_cpe`` with
an empty package name instead) is not needed by the gated providers —
osv (utils/osv.py) and github (_fixedin) always probe with package
names — and is documented rather than modeled; rhel's full_cpe probes
would need it if a rhel store dim is ever wired in.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: finder.py:12-29 — GHSA-style ecosystems -> syft package types
ECOSYSTEM_MAPPING = {
    "composer": "php-composer",
    "php": "php-composer",
    "rust": "rust-crate",
    "cargo": "rust-crate",
    "dart": "dart-pub",
    "nuget": "dotnet",
    ".net": "dotnet",
    "go": "go-module",
    "golang": "go-module",
    "maven": "java-archive",
    "java": "java-archive",
    "javascript": "npm",
    "pypi": "python",
    "pip": "python",
    "rubygems": "gem",
    "ruby": "gem",
}


def normalize_fixdate_ecosystem(eco: Column) -> Column:
    """_normalize_ecosystem (finder.py:109-115): falsy (NULL or '')
    passes through unchanged; otherwise lowercase then the mapping with
    identity fallback.

    Map-literal lookup instead of a 16-branch ``when`` chain (the r14
    CVSS ``_vocab_map`` lesson, guide §1.2 per-task work): one
    constant-map probe per row replaces 16 sequential string compares,
    and the expression tree is ~16x smaller — which matters because
    Catalyst duplicates this tree into pushed-down ``isnotnull``
    filters and join keys (ghsa1/osv1 dim builds evaluate it 2-3x per
    row).  Missing keys return NULL from the map probe; ``coalesce``
    restores the identity fallback — same mapping, keys are distinct.
    """
    lowered = F.lower(eco)
    m = F.create_map(
        *[F.lit(x) for kv in ECOSYSTEM_MAPPING.items() for x in kv]
    )
    mapped = F.coalesce(m[lowered], lowered)
    return F.when(eco.isNull() | (eco == ""), eco).otherwise(mapped)


def normalize_fixdate_package(pkg: Column, norm_eco: Column) -> Column:
    """normalize_package_name (tool/fixdate/ecosystem.py): strip, then
    for the python family ('pypi'/'python' — post-finder-normalization
    only 'python' is reachable, but the source keeps both) the PEP-503
    substitutions '_'->'-' and '.'->'-'."""
    stripped = F.trim(pkg)
    return F.when(
        F.coalesce(norm_eco, F.lit("")).isin("pypi", "python"),
        F.translate(stripped, "_.", "--"),
    ).otherwise(stripped)

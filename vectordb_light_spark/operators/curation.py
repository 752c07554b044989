"""URL/domain curation — the pre-text crawl-curation tier.

RefinedWeb (Penedo et al. 2023) and every serious crawl pipeline
dedupe and cap by URL BEFORE touching document text: URL
normalization folds trivially-distinct spellings of the same resource
together, URL-exact dedup then removes refetches for the price of a
string groupBy (no shingles, no MinHash), and per-domain frequency
caps stop a single host from dominating the corpus. All three
operators here are pure JVM builtins (regexp chains + window/groupBy)
— zero UDFs, so the whole tier rides codegen over a 100 TB scan and
its only shuffles are the dedup/cap groupings themselves.

Normalization contract (each step also has a DuckDB twin in the
``pipe_url_dedup`` oracle, so the exact semantics are driver-verified):

1. trim; strip ``#fragment``
2. lowercase the scheme and authority (path/query case preserved)
3. drop a leading ``www.``
4. drop default ports (``http…:80``, ``https…:443``)
5. strip ``utm_*`` tracking params (repairing the ``?``/``&``
   structure; other params keep their order; the repair only promotes
   an ``&`` that introduces a ``key=value`` param, so a literal ``&``
   in a query-less path is left alone)
6. strip one trailing ``/``

Reference parity: the reference ingests local files only (SURVEY
§2.1) — this tier comes from the public corpus-curation literature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "normalize_url",
    "url_domain",
    "url_exact_dedup",
    "domain_frequency_cap",
]


def normalize_url(col: Column | str) -> Column:
    """Canonical URL spelling (steps in the module docstring). Pure
    builtin regexp chain — every step is either start/end-anchored
    (at most one match in both engines) or explicitly global, so the
    DuckDB twin in queries.py matches byte-for-byte."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    # fragment off first so later $-anchors see the real end
    u = F.regexp_replace(u, r"#.*$", "")
    # lowercase scheme+authority only: lower() the extracted prefix,
    # keep the path/query byte-identical
    prefix = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*", 0)
    u = F.concat(F.lower(prefix), F.substring(u, F.length(prefix) + 1, 1 << 30))
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://)www\.", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?#]|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?#]|$)", r"$1$2")
    # utm_* params out with '?'-preserving rules (r6 ADVICE — the old
    # single strip could delete the leading '?' and needed a repair
    # step that mis-fired on '&...=' literals in query-less paths):
    # 1. every non-leading '&utm_...' param (global);
    # 2. a leading '?utm_...' with more params after it keeps the '?'
    #    (after step 1 at most one utm param remains, so one match);
    # 3. a query that was ONLY utm params disappears.
    # '?' occurs at most once in a URL, so steps 2-3 match at most
    # once in both engines and the path is never touched.
    u = F.regexp_replace(u, r"&utm_[^&]*", "")
    u = F.regexp_replace(u, r"\?utm_[^&]*&", "?")
    u = F.regexp_replace(u, r"\?utm_[^&]*$", "")
    u = F.regexp_replace(u, r"\?$", "")
    u = F.regexp_replace(u, r"/$", "")
    return u


def url_domain(col: Column | str) -> Column:
    """Registrable host of an (already normalized) URL — the
    authority minus any port/userinfo."""
    u = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(u, r"^[^:/?#]+://(?:[^/?#@]*@)?([^/:?#]+)", 1)


def url_exact_dedup(
    df: DataFrame,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    out_col: str = "url_norm",
) -> DataFrame:
    """URL-exact dedup on the NORMALIZED url: adds ``out_col`` plus
    ``keep`` marking each normalized url's min-``id_col`` survivor —
    the deterministic-survivor convention shared with
    :func:`~vectordb_light_spark.operators.dedup.exact_dedup`, which
    this tier runs BEFORE (dropping refetches for the price of one
    string groupBy, no text shuffled at all).

    Scale shape: one shuffle on the normalized url; the aggregate
    carries (url, min_id) only. Feed ``keep = true`` rows to the
    text tiers."""
    normed = df.withColumn(out_col, normalize_url(url_col))
    survivors = normed.groupBy(out_col).agg(
        F.min(id_col).alias("__survivor")
    )
    return (
        normed.join(survivors, out_col)
        .withColumn("keep", F.col(id_col) == F.col("__survivor"))
        .drop("__survivor")
    )


def domain_frequency_cap(
    df: DataFrame,
    max_per_domain: int,
    *,
    url_col: str = "url_norm",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """Per-domain frequency cap: adds ``domain_col`` and ``keep`` —
    true for each domain's ``max_per_domain`` lowest-``id_col`` rows
    (deterministic, rerun-stable). The RefinedWeb-style guard against
    one host dominating the mixture.

    Scale shape: one shuffle on the domain; the window is a sort-based
    ``row_number`` (streaming rank, spill-safe — no per-domain
    buffering). A pathologically hot domain concentrates its rows in
    one sort partition; at crawl scale cap FIRST on the (cheaper,
    already-deduped) URL tier, and note the output per domain is
    bounded by the cap itself, so downstream never sees the skew."""
    w = Window.partitionBy(domain_col).orderBy(F.col(id_col).asc())
    return (
        df.withColumn(domain_col, url_domain(url_col))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("keep", F.col("__rn") <= F.lit(max_per_domain))
        .drop("__rn")
    )

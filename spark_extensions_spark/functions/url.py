"""URL canonicalization for crawl deduplication.

Web-crawl corpora carry the same page under many URL spellings —
mixed-case scheme/host, tracking query parameters (utm_*, fbclid, …),
reordered query strings, trailing slashes, fragments. Canonicalizing
before URL-level dedup collapses those variants; it is the first, and
cheapest, dedup pass of a crawl pipeline (before any content hashing).

Everything is built from codegen-friendly built-ins (``parse_url``,
``split``/``filter``/``sort_array``/``array_join``): row-local, zero
shuffle, no UDF. The DuckDB oracle fragment reproduces the transform
with regexes (DuckDB has no parse_url), kept adjacent here so both
sides evolve together.

Canonical form: ``lower(scheme)://lower(host)<path-sans-trailing-/>``
plus ``?<kept params sorted>`` when any non-tracking parameter
survives. Fragments drop (parse_url never returns them). Default-port
stripping is out of scope (the fixture URLs carry no ports).

Reference scope note: the reference has no URL surface — this is part
of the LLM-data-pipeline extension layer (SURVEY.md §7 M5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# prefix match for utm_*; exact match for the rest
TRACKING_PREFIXES = ("utm_",)
TRACKING_EXACT = ("fbclid", "gclid", "msclkid", "mc_eid")


def _keep_param_pred_sql(p: str) -> str:
    """SQL boolean: query param ``p`` (as 'k=v' string) is NOT tracking."""
    conds = [f"NOT startswith({p}, '{pre}')" for pre in TRACKING_PREFIXES]
    conds += [
        f"NOT startswith({p}, '{name}=')" for name in TRACKING_EXACT
    ]
    conds.append(f"{p} != ''")
    return " AND ".join(conds)


def url_canonicalize_sql(url_col: str) -> str:
    """Spark-SQL text computing the canonical URL (single expression —
    also consumed verbatim by the SQL-UDF registry)."""
    scheme = f"lower(regexp_extract({url_col}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    host = f"lower(parse_url({url_col}, 'HOST'))"
    path = (
        f"regexp_replace(coalesce(parse_url({url_col}, 'PATH'), ''), '/+$', '')"
    )
    kept = (
        f"array_join(array_sort(filter(split("
        f"coalesce(parse_url({url_col}, 'QUERY'), ''), '&'), "
        f"p -> {_keep_param_pred_sql('p')})), '&')"
    )
    return (
        f"concat({scheme}, '://', {host}, {path}, "
        f"if({kept} = '', '', concat('?', {kept})))"
    )


def url_canonicalize(url_col: str) -> Column:
    """Canonical URL string (see module docstring for the form)."""
    return F.expr(url_canonicalize_sql(url_col))


def url_canonicalize_duck(url_col: str) -> str:
    """DuckDB SQL fragment computing exactly :func:`url_canonicalize`."""
    scheme = f"lower(regexp_extract({url_col}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    host = f"lower(regexp_extract({url_col}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    path = (
        f"regexp_replace(regexp_extract({url_col}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '')"
    )
    keep = _keep_param_pred_sql("p").replace("startswith", "starts_with")
    # array_to_string([]) is NULL in DuckDB (Spark's array_join gives '')
    kept = (
        f"coalesce(array_to_string(list_sort(list_filter(string_split("
        f"coalesce(regexp_extract({url_col}, '\\?([^#]*)', 1), ''),"
        f" '&'), p -> {keep})), '&'), '')"
    )
    return (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {kept} = '' THEN '' ELSE '?' || {kept} END"
    )


# ---------------------------------------------------------------------
# Domain-suffix blocklist filtering
# ---------------------------------------------------------------------


def host_suffix_expr(host_col: str, lvl: int) -> str:
    """Spark SQL fragment: the last ``lvl`` dot-labels of a hostname
    ('a.b.example.com', lvl=2 → 'example.com'); NULL when the host has
    fewer labels."""
    parts = f"split({host_col}, '\\\\.')"
    return (
        f"if(size({parts}) >= {lvl}, "
        f"array_join(slice({parts}, size({parts}) - {lvl} + 1, {lvl}), '.'), "
        f"cast(null as string))"
    )


def url_blocklist_filter(
    df,
    url_col: str,
    blocklist,
    domain_col: str = "domain",
    max_labels: int = 4,
):
    """Drop rows whose URL host matches a blocked domain by dot-suffix
    (the standard crawl-cleaning step: blocking ``example.com`` also
    blocks ``cdn.example.com`` but NOT ``badexample.com``).

    100 TB shape: the naive formulation — an ``ends_with(host,
    '.'||domain)`` theta join — is a broadcast NESTED-LOOP over the
    whole blocklist (n×B comparisons). Instead the blocklist is split
    by label count and each level becomes one broadcast HASH equi-join
    on the host's suffix at that level: ``max_labels`` hash joins,
    zero shuffles, row count unchanged (each level's domains are
    distinct, so a host matches ≤ 1 per level). Blocked domains with
    more than ``max_labels`` labels are rejected up front rather than
    silently ignored.

    Returns the kept rows with the original columns plus ``__host``
    dropped.
    """
    host_sql = f"lower(parse_url({url_col}, 'HOST'))"
    out = df.withColumn("__host", F.expr(host_sql))
    blocklist = blocklist.select(
        F.lower(F.col(domain_col)).alias("__dom")
    ).distinct()
    too_deep = blocklist.filter(
        F.size(F.split(F.col("__dom"), r"\.")) > max_labels
    )
    if not too_deep.isEmpty():  # tiny action on the (small) blocklist
        sample = [r["__dom"] for r in too_deep.limit(3).collect()]
        raise ValueError(
            f"blocklist domains exceed max_labels={max_labels}: {sample}; "
            "raise max_labels to match the deepest blocked domain"
        )
    markers = []
    for lvl in range(1, max_labels + 1):
        b = blocklist.filter(
            F.size(F.split(F.col("__dom"), r"\.")) == lvl
        ).withColumnRenamed("__dom", f"__b{lvl}")
        out = out.join(
            F.broadcast(b),
            F.expr(host_suffix_expr("__host", lvl)) == F.col(f"__b{lvl}"),
            "left",
        )
        markers.append(F.col(f"__b{lvl}").isNotNull())
    blocked = markers[0]
    for m in markers[1:]:
        blocked = blocked | m
    keep = out.filter(~blocked)
    for lvl in range(1, max_labels + 1):
        keep = keep.drop(f"__b{lvl}")
    return keep.drop("__host")

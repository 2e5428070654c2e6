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

"""Scalar cleaning/typing helpers, all pure Column expressions
(whole-stage-codegen'd; no Python UDFs).

Reference parity (file:line into /root/reference/):
    clean_email              graph_transformer.py:580-584
    clean_domain             graph_transformer.py:586-593
    parse_date_lenient       graph_transformer.py:595-612
    safe_int / safe_float    graph_transformer.py:614-630
    extract_email_from_values extractors/form_submissions.py:213-231
    name_concat              reporting/queries.py:24
    truncate_value           reporting/neo4j_reporter.py:289-293
    property_hash            utils/change_detector.py:22-41
    deterministic_event_id   replaces the sequential counter at
                             graph_transformer.py:29,393-395 (content
                             hash → stable across partitions/runs)

Null conventions match the reference: missing string → '', unparseable
numeric → 0/0.0. Dates normalize to TimestampType (UTC) instead of the
reference's ISO strings — typed columns are strictly better for query
predicates; tests assert the same instants.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_FIELD_NAMES = ("email", "e_mail", "email_address", "emailaddress", "work_email")


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def clean_email(col: str | Column) -> Column:
    """lower+trim; null → '' (reference null convention)."""
    return F.coalesce(F.lower(F.trim(_c(col))), F.lit(""))


def clean_domain(col: str | Column) -> Column:
    """lower+trim, strip one leading 'www.'; null → ''."""
    return F.coalesce(
        F.regexp_replace(F.lower(F.trim(_c(col))), r"^www\.", ""), F.lit("")
    )


def parse_date_lenient(col: str | Column) -> Column:
    """Lenient multi-format date parse → TimestampType.

    Accepts epoch-millis (digits), ISO-8601 with 'T' (Z or offset),
    and date-only strings; unparseable → null (the reference falls
    back to the raw string — we keep the column typed instead).
    """
    c = _c(col).cast("string")
    as_millis = F.when(
        c.rlike(r"^-?\d{11,}$"), F.timestamp_millis(c.try_cast("long"))
    )
    iso = F.coalesce(
        F.try_to_timestamp(F.regexp_replace(c, r"Z$", "+00:00")),
        F.try_to_timestamp(c),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
    )
    return F.when(c.isNull() | (c == ""), F.lit(None).cast("timestamp")).otherwise(
        F.coalesce(as_millis, iso)
    )


def safe_int(col: str | Column) -> Column:
    """Lenient int cast; null/''/garbage → 0 (graph_transformer.py:614-621).

    try_cast, not cast: Spark 4 ANSI mode makes plain cast THROW on
    malformed input — try_cast restores the reference's null-→-0
    semantics.
    """
    return F.coalesce(_c(col).cast("string").try_cast("int"), F.lit(0))


def safe_float(col: str | Column) -> Column:
    """Lenient float cast; null/''/garbage → 0.0 (graph_transformer.py:623-630)."""
    return F.coalesce(_c(col).cast("string").try_cast("double"), F.lit(0.0))


def extract_email_from_values(values: str | Column) -> Column:
    """First valid email from a form `values` array<struct<name,value>>.

    Field name must be an email synonym and the value must contain '@'
    (extractors/form_submissions.py:213-231); result lower+trimmed,
    null if absent.
    """
    hits = F.filter(
        _c(values),
        lambda v: F.lower(v["name"]).isin(*EMAIL_FIELD_NAMES)
        & v["value"].contains("@"),
    )
    return F.when(
        F.size(hits) > 0, F.lower(F.trim(F.element_at(hits, 1)["value"]))
    ).otherwise(F.lit(None).cast("string"))


def name_concat(first: str | Column, last: str | Column) -> Column:
    """'first last' display name (skips null parts)."""
    return F.concat_ws(" ", _c(first), _c(last))


def truncate_value(col: str | Column, max_width: int = 50) -> Column:
    """Table-formatter truncation: 'xxx…' beyond max_width."""
    c = _c(col).cast("string")
    return F.when(
        F.length(c) > max_width,
        F.concat(F.substring(c, 1, max_width - 3), F.lit("...")),
    ).otherwise(c)


def property_hash(*cols: str | Column) -> Column:
    """sha256 over the canonical JSON of the given columns.

    Columns are sorted by name and nulls are omitted by to_json —
    mirroring json.dumps(sort_keys=True) over non-null props
    (change_detector.py:22-41). Stable across partitions and runs;
    callers must exclude temporal/bookkeeping columns.
    """
    named = sorted(
        (c if isinstance(c, str) else c._jc.toString(), _c(c)) for c in cols
    )
    return F.sha2(
        F.to_json(F.struct(*[col.alias(name) for name, col in named])), 256
    )


def deterministic_event_id(prefix: str, *cols: str | Column) -> Column:
    """Content-hashed event id replacing the reference's sequential
    counter (graph_transformer.py:29) — reproducible across runs and
    partition orders."""
    return F.concat(
        F.lit(f"{prefix}_"),
        F.sha2(F.concat_ws("|", *[_c(c).cast("string") for c in cols]), 256).substr(
            1, 16
        ),
    )

"""Unit tests for the column-function library (F1-F10), mirroring the
reference's null/garbage conventions (graph_transformer.py:580-630)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from hubspot_neo4j_pipeline_spark.functions import (
    clean_domain,
    clean_email,
    deterministic_event_id,
    extract_email_from_values,
    name_concat,
    parse_date_lenient,
    property_hash,
    safe_float,
    safe_int,
    truncate_value,
)


def _one(spark, col, **data):
    keys = sorted(data)
    schema = ", ".join(
        f"{k} {'string' if data[k] is None or isinstance(data[k], str) else 'bigint'}"
        for k in keys
    )
    df = spark.createDataFrame([tuple(data[k] for k in keys)], schema)
    return df.select(col.alias("out")).collect()[0]["out"]


def test_clean_email(spark):
    assert _one(spark, clean_email("x"), x="  Foo@Bar.COM ") == "foo@bar.com"
    assert _one(spark, clean_email("x"), x=None) == ""


def test_clean_domain(spark):
    assert _one(spark, clean_domain("x"), x=" WWW.Example.com ") == "example.com"
    assert _one(spark, clean_domain("x"), x="example.com") == "example.com"
    assert _one(spark, clean_domain("x"), x=None) == ""


def test_safe_int_and_float(spark):
    assert _one(spark, safe_int("x"), x="42") == 42
    assert _one(spark, safe_int("x"), x="garbage") == 0
    assert _one(spark, safe_int("x"), x=None) == 0
    assert _one(spark, safe_float("x"), x="3.5") == 3.5
    assert _one(spark, safe_float("x"), x="") == 0.0


def test_parse_date_lenient(spark):
    iso = _one(spark, parse_date_lenient("x"), x="2024-03-01T12:30:00Z")
    assert iso == datetime.datetime(2024, 3, 1, 12, 30)
    millis = _one(spark, parse_date_lenient("x"), x="1704067200123")
    assert millis == datetime.datetime(2024, 1, 1, 0, 0, 0, 123000)
    assert _one(spark, parse_date_lenient("x"), x="2024-03-01") == datetime.datetime(
        2024, 3, 1
    )
    assert _one(spark, parse_date_lenient("x"), x="not a date") is None
    assert _one(spark, parse_date_lenient("x"), x=None) is None


def test_extract_email_from_values(spark):
    df = spark.createDataFrame(
        [
            ([{"name": "email", "value": " A@B.com "}],),
            ([{"name": "phone", "value": "123"}],),
            ([{"name": "E_MAIL", "value": "c@d.com"}, {"name": "email", "value": "x@y.z"}],),
            ([{"name": "email", "value": "notanemail"}],),
        ],
        "values array<struct<name:string,value:string>>",
    )
    out = [r["out"] for r in df.select(extract_email_from_values("values").alias("out")).collect()]
    assert out == ["a@b.com", None, "c@d.com", None]


def test_name_concat_and_truncate(spark):
    assert _one(spark, name_concat("a", "b"), a="Ada", b="Lovelace") == "Ada Lovelace"
    assert _one(spark, truncate_value("x", 10), x="0123456789ABC") == "0123456..."
    assert _one(spark, truncate_value("x", 10), x="short") == "short"


def test_property_hash_stable_and_order_insensitive(spark):
    h1 = _one(spark, property_hash("a", "b"), a="x", b="y")
    h2 = _one(spark, property_hash("b", "a"), a="x", b="y")
    h3 = _one(spark, property_hash("a", "b"), a="x", b="z")
    assert h1 == h2  # column order canonicalized
    assert h1 != h3
    assert len(h1) == 64


def test_property_hash_null_invariance(spark):
    # nulls are omitted from the canonical JSON (reference drops None)
    h_null = _one(spark, property_hash("a", "b"), a="x", b=None)
    h_only_a = _one(spark, property_hash(F.col("a")), a="x", b="ignored")
    assert h_null == h_only_a


def test_deterministic_event_id(spark):
    i1 = _one(spark, deterministic_event_id("evt", "a", "b"), a="x", b="1")
    i2 = _one(spark, deterministic_event_id("evt", "a", "b"), a="x", b="1")
    i3 = _one(spark, deterministic_event_id("evt", "a", "b"), a="x", b="2")
    assert i1 == i2 and i1 != i3 and i1.startswith("evt_")

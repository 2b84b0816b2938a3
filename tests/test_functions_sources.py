"""Function-surface and source-provider tests: color scales, properties,
date_bin, CSV/JSON providers, SQL-registered function spellings."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from micromegas_spark.functions import color as C
from micromegas_spark.functions import datetime_fns as DT
from micromegas_spark.functions import properties as P
from micromegas_spark.functions import register_all
from micromegas_spark.sources import readers


def test_rgba_pack_clamp(spark):
    df = spark.range(1)
    row = df.select(
        C.rgba(F.lit(1.0), F.lit(0.0), F.lit(0.0), F.lit(1.0)).alias("red"),
        C.rgba(F.lit(2.0), F.lit(-1.0), F.lit(0.5), F.lit(1.0)).alias("clamped"),
    ).collect()[0]
    assert row.red == 0xFF0000FF
    # r clamps to 1→255, g clamps to 0, b 0.5→128 (round half up)
    assert row.clamped == (255 << 24) + (0 << 16) + (128 << 8) + 255


def test_lerp_color_midpoint(spark):
    df = spark.range(1)
    row = df.select(
        C.lerp_color(F.lit(0x00000000), F.lit(0xFFFFFFFF), F.lit(0.5)).alias("mid"),
        C.lerp_color(F.lit(0x00000000), F.lit(0xFFFFFFFF), F.lit(2.0)).alias("hi"),  # t clamps
    ).collect()[0]
    # each channel: 0 + (255-0)*0.5 = 127.5 → 128
    assert row.mid == (128 << 24) + (128 << 16) + (128 << 8) + 128
    assert row.hi == 0xFFFFFFFF


def test_color_scale_endpoints(spark):
    df = spark.range(1)
    row = df.select(
        C.color_scale("viridis", F.lit(0.0)).alias("lo"),
        C.color_scale("viridis", F.lit(1.0)).alias("hi"),
    ).collect()[0]
    # endpoints hit the first/last anchors exactly (alpha 255)
    assert row.lo == (68 << 24) + (1 << 16) + (84 << 8) + 255
    assert row.hi == (253 << 24) + (231 << 16) + (37 << 8) + 255


def test_properties_functions(spark):
    df = spark.createDataFrame(
        [({"env": "prod", "region": "eu"}, '{"env":"prod","region":"eu"}')],
        ["props", "props_json"],
    )
    row = df.select(
        P.property_get(F.col("props"), "env").alias("env"),
        P.property_get(F.col("props"), "missing").alias("missing"),
        P.property_get(F.col("props_json"), "region", is_json=True).alias("region"),
        P.properties_length(F.col("props")).alias("n"),
        P.properties_to_jsonb(F.col("props")).alias("jsonb"),
        P.properties_to_array(F.col("props")).alias("arr"),
    ).collect()[0]
    assert row.env == "prod" and row.missing is None and row.region == "eu"
    assert row.n == 2
    assert row.jsonb == '{"env":"prod","region":"eu"}'
    assert [tuple(e) for e in row.arr] == [("env", "prod"), ("region", "eu")]
    back = df.select(P.json_properties_to_map(F.col("props_json")).alias("m")).collect()[0]
    assert dict(back.m) == {"env": "prod", "region": "eu"}


def test_date_bin(spark):
    ts = datetime.datetime(2024, 1, 1, 10, 17, 45)
    df = spark.createDataFrame([(ts,)], ["t"])
    row = df.select(
        DT.date_bin(900, F.col("t")).alias("q"),  # 15-minute stride
        DT.date_bin(3600, F.col("t")).alias("h"),
    ).collect()[0]
    assert row.q.minute == 15 and row.q.second == 0
    assert row.h.hour == 10 and row.h.minute == 0


def test_sql_function_registration(spark):
    register_all(spark)
    row = spark.sql(
        """SELECT rgba(1.0d, 0.0d, 0.0d, 1.0d) AS red,
                  lerp(0d, 10d, 0.5d) AS l,
                  bin_center(12.3d, 5d) AS bc,
                  jsonb_get('{"a": 5}', 'a') AS a,
                  jsonb_as_i64('5') AS i,
                  property_get(map('k', 'v'), 'k') AS pv,
                  date_bin_s(60, timestamp'2024-01-01 10:17:45') AS db,
                  jsonb_path_query('[{"f":"x"},{"f":"y"}]', '$[*] ? (@.f == "x")') AS pq
        """
    ).collect()[0]
    assert row.red == 0xFF0000FF and row.l == 5.0 and row.bc == 10.0
    assert row.a == "5" and row.i == 5 and row.pv == "v"
    assert row.db.second == 0 and row.db.minute == 17
    assert row.pq == '[{"f":"x"}]'


def test_csv_json_providers(spark, tmp_path):
    csv = tmp_path / "t.csv"
    csv.write_text("a,b\n1,x\n2,y\n")
    df = readers.register_csv(spark, "csv_t", str(csv))
    assert spark.sql("SELECT SUM(a) AS s FROM csv_t").collect()[0].s == 3
    jsonl = tmp_path / "t.jsonl"
    jsonl.write_text('{"a": 1, "b": "x"}\n{"a": 5, "b": "y"}\n')
    readers.register_json(spark, "json_t", str(jsonl))
    assert spark.sql("SELECT SUM(a) AS s FROM json_t WHERE b = 'y'").collect()[0].s == 5
    readers.register_static_tables(spark, {"csv2": str(csv), "json2": str(jsonl)})
    assert spark.table("csv2").count() == 2 and spark.table("json2").count() == 2

"""IO / conform / graceful-degradation tests (SURVEY.md §2.1, §2.11)."""

from __future__ import annotations

from pyspark.sql import types as T

from ucl_data_pipeline_spark.schemas import TEAMS_MASTER, TESTDATA_SCHEMAS
from ucl_data_pipeline_spark.sources import (
    conform,
    empty_df,
    read_table,
    safe_read_csv,
)


def test_read_table_schema(spark, sf_dir):
    for name in ("lineitem", "orders", "embeddings"):
        df = read_table(spark, sf_dir, name)
        expect = {f.name for f in TESTDATA_SCHEMAS[name].fields}
        assert {f.name for f in df.schema.fields} == expect


def test_safe_read_missing_file_is_empty_typed(spark, tmp_path):
    # reference safe_read (scripts/enrich_features.py:17-18): missing
    # file → empty frame with the right schema, downstream joins no-op.
    df = safe_read_csv(spark, str(tmp_path / "nope.csv"), TEAMS_MASTER)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "team", "gk_rating", "setpiece_rating", "crowd_index"]


def test_empty_df_survives_union_and_join(spark):
    # graceful-degradation contract V3: empty-but-valid tables flow
    # through the relational ops without error.
    e = empty_df(spark, TEAMS_MASTER)
    full = spark.createDataFrame([("Liverpool", 0.7, 0.6, 0.7)], TEAMS_MASTER)
    assert full.unionByName(e).count() == 1
    assert full.join(e.select("team"), "team", "left").count() == 1


def test_conform_adds_defaults_and_orders(spark):
    target = T.StructType([
        T.StructField("a", T.IntegerType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.DoubleType()),
    ])
    src = spark.createDataFrame([("x", 1)], "b: string, a: int")
    out = conform(src, target, defaults={"c": 9.5})
    assert out.columns == ["a", "b", "c"]
    row = out.collect()[0]
    assert (row.a, row.b, row.c) == (1, "x", 9.5)


def test_conform_casts_types(spark):
    target = T.StructType([T.StructField("v", T.DoubleType())])
    src = spark.createDataFrame([("3.5",), ("bad",)], "v: string")
    vals = [r.v for r in conform(src, target).collect()]
    assert vals[0] == 3.5 and vals[1] is None  # coerce-to-null (F7)


def test_multi_format_roundtrip_fidelity(spark, sf_dir, tmp_path):
    # Interchange formats (S5/S2 generalized): the same table written
    # to parquet, orc, json-lines and csv must read back identically
    # under an explicit schema (csv/json need one — they don't carry
    # types).
    from pyspark.sql import functions as F

    from ucl_data_pipeline_spark.sources.io import read_table

    src = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    want_rows = src.count()
    want_sum = src.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
    ).collect()[0][0]
    schema = src.schema

    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / fmt)
        w = src.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", True)
        w.format(fmt).save(path)
        r = spark.read.format(fmt)
        if fmt in ("json", "csv"):
            r = r.schema(schema)
        if fmt == "csv":
            r = r.option("header", True)
        got = r.load(path)
        assert got.schema == schema, fmt
        assert got.count() == want_rows, fmt
        got_sum = got.agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
        ).collect()[0][0]
        assert got_sum == want_sum, fmt


def test_orc_and_jsonl_helper_roundtrip(spark, sf_dir, tmp_path):
    from ucl_data_pipeline_spark.sources.io import (
        read_jsonl,
        read_orc,
        read_table,
        write_jsonl,
        write_orc,
    )

    src = read_table(spark, sf_dir, "nation")
    orc_path = str(tmp_path / "nation_orc")
    jl_path = str(tmp_path / "nation_jsonl")
    write_orc(src, orc_path)
    write_jsonl(src, jl_path)
    got_orc = read_orc(spark, orc_path)
    got_jl = read_jsonl(spark, jl_path, schema=src.schema)
    want = sorted(map(tuple, src.collect()))
    assert got_orc.schema == src.schema
    assert sorted(map(tuple, got_orc.collect())) == want
    assert got_jl.schema == src.schema
    assert sorted(map(tuple, got_jl.collect())) == want

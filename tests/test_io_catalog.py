from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from prox_spark.catalog import Catalog
from prox_spark.catalog import testdata_catalog as make_testdata_catalog
from prox_spark.io import read_csv, read_parquet, write_parquet
from prox_spark.table import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_read_csv_multiline_and_embedded_json(spark, tmp_path):
    """S9: the reference's seed CSVs carry quoted multiline text and
    embedded JSON (reference dummy_data_v2/services.csv row 1)."""
    csv = tmp_path / "services.csv"
    csv.write_text(
        'service_id,availability,notes\n'
        '1,"{""mon"": ""9-5"", ""tue"": ""9-5""}","plain"\n'
        '2,"{""wed"": ""10-2""}","line one\nline two"\n'
    )
    schema = StructType([
        StructField("service_id", IntegerType()),
        StructField("availability", StringType()),
        StructField("notes", StringType()),
    ])
    df = read_csv(spark, str(csv), schema)
    rows = {r.service_id: r for r in df.collect()}
    assert len(rows) == 2
    assert '"mon": "9-5"' in rows[1].availability
    assert "\n" in rows[2].notes
    # the embedded JSON parses with from_json (the §2.8 extension)
    parsed = df.select(
        F.from_json("availability", "map<string,string>").alias("m")
    ).collect()
    assert parsed[0].m["mon"] == "9-5"


def test_partitioned_parquet_roundtrip_prunes(spark, tmp_path):
    """S5: partitioned writes must yield partition-pruned scans."""
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 3).alias("year"),
    )
    out = str(tmp_path / "part")
    write_parquet(df, out, partition_by=["year"])
    back = read_parquet(spark, out).filter(F.col("year") == 1)
    assert back.count() == sum(1 for i in range(100) if i % 3 == 1)
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    # partition filter is applied at file listing, not post-scan
    assert "PartitionFilters" in buf.getvalue()


def test_orc_roundtrip_pushdown_and_partition_pruning(spark, tmp_path):
    """ORC source/sink: values roundtrip, predicate pushdown reaches the
    ORC scan, and partitioned layouts prune like parquet."""
    from prox_spark.io import read_orc, write_orc

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 3).alias("year"),
        (F.col("id") * 2).alias("v"),
    )
    out = str(tmp_path / "orc")
    write_orc(df, out, partition_by=["year"])
    back = read_orc(spark, out).filter((F.col("year") == 1) & (F.col("v") > 50))
    assert back.count() == sum(1 for i in range(100) if i % 3 == 1 and i * 2 > 50)

    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "PushedFilters: [IsNotNull(v), GreaterThan(v,50)]" in plan


def test_catalog_register_views_and_sql(spark):
    cat = make_testdata_catalog(spark, SF_DIR)
    assert set(cat.paths) >= {"region", "nation", "lineitem", "documents"}
    assert cat.table("region").count() == 5
    cat.create_views()
    n = spark.sql(
        "SELECT count(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey"
    ).first().n
    assert n == 25


def test_catalog_unknown_table_raises(spark):
    cat = Catalog(spark)
    try:
        cat.table("ghost")
    except KeyError as e:
        assert "ghost" in str(e)
    else:
        raise AssertionError("expected KeyError")


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Same-key/same-count bucketed tables must SortMergeJoin with ZERO
    exchanges — the pay-once co-location strategy for repeated joins."""
    from prox_spark.io import write_bucketed

    a = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v1"))
    b = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v2"))
    write_bucketed(a, "bt_a", str(tmp_path / "bt_a"), ["k"], n_buckets=4)
    write_bucketed(b, "bt_b", str(tmp_path / "bt_b"), ["k"], n_buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bt_a").join(spark.table("bt_b"), "k")
        import contextlib
        import io as _io

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert plan.count("Bucketed: true") == 2
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_compact_parquet_reduces_files(spark, tmp_path):
    from prox_spark.io import compact_parquet

    src = str(tmp_path / "shattered")
    dst = str(tmp_path / "compacted")
    # 64 tiny files
    spark.range(0, 10_000).repartition(64).write.parquet(src)
    import os

    n_src = sum(f.endswith(".parquet") for f in os.listdir(src))
    assert n_src >= 32
    n_dst = compact_parquet(spark, src, dst, target_file_mb=128)
    assert n_dst == 1  # tiny data -> single right-sized file
    assert spark.read.parquet(dst).count() == 10_000
    got = {r[0] for r in spark.read.parquet(dst).collect()}
    assert got == set(range(10_000))


def test_jsonl_roundtrip(spark, tmp_path):
    from prox_spark.io import read_jsonl, write_jsonl

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, docs.schema)
    assert back.count() == docs.count()
    a = sorted(docs.collect(), key=lambda r: r.doc_id)
    b = sorted(back.collect(), key=lambda r: r.doc_id)
    assert a == b


def test_upsert_parquet_merges_by_key(spark, tmp_path):
    from prox_spark.upsert import upsert_parquet

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, v long"
    )
    upsert_parquet(spark, path, base, ["id"])          # create
    updates = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], "id long, name string, v long"
    )
    upsert_parquet(spark, path, updates, ["id"])       # merge
    got = {r.id: (r.name, r.v) for r in read_table(spark, path).collect()}
    assert got == {1: ("a", 10), 2: ("B", 200), 3: ("c", 30), 4: ("d", 40)}
    # idempotent re-apply
    upsert_parquet(spark, path, updates, ["id"])
    assert read_table(spark, path).count() == 4


def test_upsert_scd2_keeps_history(spark, tmp_path):
    from prox_spark.upsert import upsert_scd2

    path = str(tmp_path / "dim")
    t = lambda s: f"{s} 00:00:00"  # noqa: E731
    v1 = spark.createDataFrame(
        [(1, "bronze", t("2024-01-01")), (2, "silver", t("2024-01-01"))],
        "id long, tier string, eff string",
    )
    upsert_scd2(spark, path, v1, ["id"], "eff")
    # key 1 changes tier on Feb 1; key 2 untouched
    v2 = spark.createDataFrame([(1, "gold", t("2024-02-01"))], "id long, tier string, eff string")
    upsert_scd2(spark, path, v2, ["id"], "eff")
    rows = {
        (r.id, r.tier): (str(r.valid_from), str(r.valid_to), r.is_current)
        for r in read_table(spark, path).collect()
    }
    assert rows[(1, "bronze")] == ("2024-01-01 00:00:00", "2024-02-01 00:00:00", False)
    assert rows[(1, "gold")] == ("2024-02-01 00:00:00", "9999-12-31 00:00:00", True)
    assert rows[(2, "silver")][2] is True
    # point-in-time join: as of Jan 15 key 1 is still bronze
    asof = (
        read_table(spark, path)
        .filter(
            (F.col("valid_from") <= "2024-01-15") & (F.col("valid_to") > "2024-01-15")
        )
        .filter(F.col("id") == 1)
        .collect()
    )
    assert [r.tier for r in asof] == ["bronze"]
    # a third version closes gold, history now 3 rows for key 1
    v3 = spark.createDataFrame([(1, "plat", t("2024-03-01"))], "id long, tier string, eff string")
    upsert_scd2(spark, path, v3, ["id"], "eff")
    hist = read_table(spark, path).filter(F.col("id") == 1)
    assert hist.count() == 3
    assert hist.filter(F.col("is_current")).count() == 1


def test_upsert_keep_max_is_order_independent(spark, tmp_path):
    from prox_spark.upsert import upsert_keep_max

    schema = "id long, ts long, v string"
    newer = spark.createDataFrame([(1, 20, "new"), (2, 5, "x")], schema)
    older = spark.createDataFrame([(1, 10, "old")], schema)
    a, b = str(tmp_path / "ab"), str(tmp_path / "ba")
    for path, batches in ((a, (newer, older)), (b, (older, newer))):
        for batch in batches:
            upsert_keep_max(spark, path, batch, ["id"], ["ts"])
    got_a = {(r.id, r.ts, r.v) for r in read_table(spark, a).collect()}
    got_b = {(r.id, r.ts, r.v) for r in read_table(spark, b).collect()}
    assert got_a == got_b == {(1, 20, "new"), (2, 5, "x")}


def test_upsert_rejects_schema_drift(spark, tmp_path):
    import pytest

    from prox_spark.upsert import upsert_parquet

    path = str(tmp_path / "tbl2")
    upsert_parquet(spark, path, spark.createDataFrame([(1, "a")], "id long, name string"), ["id"])
    bad = spark.createDataFrame([(1, 5.0)], "id long, score double")
    with pytest.raises(ValueError, match="schema mismatch"):
        upsert_parquet(spark, path, bad, ["id"])


def test_write_sorted_files_have_disjoint_ranges(spark, tmp_path):
    """write_sorted must produce range-clustered files: per-file
    [min, max] key intervals are pairwise disjoint, so parquet footer
    stats let a range predicate skip non-matching files entirely."""
    from prox_spark.io import write_sorted

    df = spark.range(10_000).select(
        (F.col("id") * 7919 % 10_000).alias("k"),  # shuffled keys
        F.col("id").alias("v"),
    )
    out = str(tmp_path / "sorted")
    write_sorted(df, out, ["k"], n_files=8)

    back = read_parquet(spark, out)
    assert back.count() == 10_000
    ranges = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    assert len(ranges) == 8
    spans = sorted((r.lo, r.hi) for r in ranges)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next, f"overlapping file ranges: {spans}"


def test_read_parquet_evolved_merges_appended_schema(spark, tmp_path):
    """A column added mid-table must be readable across old+new files:
    old rows surface NULL for the new column, new rows keep it."""
    from prox_spark.io import read_parquet_evolved

    out = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
        "overwrite"
    ).parquet(out)
    spark.createDataFrame(
        [(2, "b", 0.5)], "id long, name string, score double"
    ).write.mode("append").parquet(out)

    df = read_parquet_evolved(spark, out)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows == {1: None, 2: 0.5}


def test_bloom_filter_write_lands_in_footers(spark, tmp_path):
    """The bloom filter must actually be written: parquet stores it as
    an extra structure the footer points at, observable via pyarrow's
    bloom_filter_offset (and as a strictly larger file for the same
    rows)."""
    import glob

    import pyarrow.parquet as pq

    from prox_spark.io import write_parquet_bloom

    df = spark.range(20_000).selectExpr("id", "md5(cast(id as string)) AS digest")
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    df.coalesce(1).write.parquet(plain)
    write_parquet_bloom(df.coalesce(1), bloomed, ["digest"], expected_ndv=20_000)

    def info(d):
        f = glob.glob(f"{d}/*.parquet")[0]
        md = pq.ParquetFile(f).metadata
        col_idx = md.schema.names.index("digest")
        col = md.row_group(0).column(col_idx)
        import os

        return os.path.getsize(f), getattr(col, "bloom_filter_offset", None)

    p_size, p_off = info(plain)
    b_size, b_off = info(bloomed)
    assert b_off is not None and (p_off is None or b_off != p_off) or b_size > p_size
    assert b_size > p_size  # the filter occupies real bytes
    # content identical either way
    assert sorted(spark.read.parquet(bloomed).collect(), key=str) == sorted(
        df.collect(), key=str
    )

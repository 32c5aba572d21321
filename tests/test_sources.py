"""Source/sink round-trips (SURVEY.md §2.1 S2/S3/S5) and the multimodal
decode stub — side-effecting paths the oracle can't check.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_for_ebook_classification_spark.operators.multimodal import _fake_decode
from pyspark_for_ebook_classification_spark.sources.io import (
    load,
    read_csv,
    read_jsonl,
    write_parquet,
)


def test_parquet_sink_partitioned_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = load(spark, sf_dir, "orders")
    write_parquet(orders, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # partition pruning: reading one partition must not scan the others
    one = back.filter(F.col("o_orderstatus") == "F")
    plan = one.queryExecution if hasattr(one, "queryExecution") else None
    assert one.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_csv_roundtrip_explicit_schema(spark, sf_dir, tmp_path):
    out = str(tmp_path / "customer_csv")
    customer = load(spark, sf_dir, "customer")
    customer.write.mode("overwrite").option("header", True).csv(out)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    back = read_csv(spark, out, schema)
    assert back.count() == customer.count()
    assert back.schema == schema
    a = {r.c_custkey: r.c_acctbal for r in back.collect()}
    b = {r.c_custkey: r.c_acctbal for r in customer.collect()}
    assert a == b


def test_jsonl_roundtrip_explicit_schema(spark, sf_dir, tmp_path):
    out = str(tmp_path / "nation_json")
    nation = load(spark, sf_dir, "nation")
    nation.write.mode("overwrite").json(out)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back = read_jsonl(spark, out, schema)
    assert back.count() == nation.count()
    assert {r.n_name for r in back.collect()} == {r.n_name for r in nation.collect()}


def test_multimodal_decode_deterministic(spark, sf_dir):
    from pyspark_for_ebook_classification_spark.operators.multimodal import (
        multimodal_decode_stub,
    )

    a = multimodal_decode_stub(spark, sf_dir).toPandas().sort_values("doc_id")
    b = multimodal_decode_stub(spark, sf_dir).toPandas().sort_values("doc_id")
    assert len(a) > 0
    assert (a.reset_index(drop=True) == b.reset_index(drop=True)).all().all()
    # byte_len must equal the text length it was encoded from
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    lens = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    got = dict(zip(a["doc_id"], a["byte_len"]))
    assert got == {k: v for k, v in lens.items() if k in got}


def test_fake_decode_rejects_empty_payload():
    with pytest.raises(ValueError, match="empty media payload"):
        _fake_decode(b"")
    # real media bytes (JPEG magic) are not UTF-8: must surface as the
    # codec's ValueError, not an unhandled UnicodeDecodeError in a worker
    with pytest.raises(ValueError, match="undecodable media payload"):
        _fake_decode(b"\xff\xd8\xff\xe0")
    w, h, f = _fake_decode(b"some media bytes")
    assert 64 <= w < 256 and 64 <= h < 256 and 1 <= f <= 7
    # non-ASCII: dims come from code points (ascii()-portable), not raw
    # UTF-8 bytes — 'é' is code point 233, bytes C3 A9
    w2, h2, _ = _fake_decode("émeuté".encode())
    assert w2 == 64 + 233 % 192 and h2 == 64 + 233 % 192


def test_merge_schema_reads_evolved_layout(spark, sf_dir, tmp_path):
    """Schema evolution across parquet batches (the normal state of a
    long-lived 100 TB corpus store): an early batch without a column and
    a later batch with it must read back as one table under
    mergeSchema=true, with NULLs filling the pre-evolution rows."""
    from pyspark.sql import functions as F

    from pyspark_for_ebook_classification_spark.sources.io import load

    path = str(tmp_path / "evolved")
    d = load(spark, sf_dir, "documents")
    v1 = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    v2 = (
        d.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "lang", F.length("text").alias("text_len"))
    )
    v1.write.mode("overwrite").parquet(path)
    v2.write.mode("append").parquet(path)

    back = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(back.columns) == {"doc_id", "lang", "text_len"}
    assert back.count() == d.count()
    # pre-evolution rows surface the new column as NULL
    assert (
        back.filter(F.col("doc_id") % 2 == 0)
        .filter(F.col("text_len").isNotNull())
        .count()
        == 0
    )
    assert (
        back.filter(F.col("doc_id") % 2 == 1)
        .filter(F.col("text_len").isNull())
        .count()
        == 0
    )


def test_arrow_table_interchange_roundtrip(spark, sf_dir):
    """S4 Arrow path both directions: DataFrame → pa.Table via toArrow()
    and pa.Table → DataFrame via createDataFrame must preserve rows and
    types exactly (this is the zero-copy boundary pandas/numpy tooling
    plugs into at the driver — small frames only; big data never
    collects)."""
    import pyarrow as pa

    from pyspark_for_ebook_classification_spark.sources.io import load

    n = load(spark, sf_dir, "nation")
    tbl = n.toArrow()
    assert isinstance(tbl, pa.Table)
    assert tbl.num_rows == 25
    back = spark.createDataFrame(tbl)
    assert back.schema == n.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, n.collect()))


def test_python_datasource_jsonl_sink_roundtrip(spark, sf_dir, tmp_path):
    """Write half of the custom Python Data Source connector: the nation
    dim goes out through the partition-parallel jsonl_sink (per-task part
    files + publish-on-commit manifest) and must read back exactly."""
    import json
    import os

    from pyspark_for_ebook_classification_spark.sources.io import load
    from pyspark_for_ebook_classification_spark.sources.pyds import register

    register(spark)
    out = str(tmp_path / "jsonl_out")
    n = load(spark, sf_dir, "nation")
    n.write.format("jsonl_sink").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["rows"] == 25
    assert all(os.path.exists(p) for p in manifest["parts"])
    back = spark.read.json(out, schema=n.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, n.collect()))


def test_python_datasource_jsonl_sink_overwrite_and_append(spark, sf_dir, tmp_path):
    """mode('overwrite') must replace the committed dataset (no stale
    parts for directory-globbing readers, manifest rewritten), and a
    subsequent mode('append') must extend BOTH the directory and the
    cumulative manifest. Prior data is cleared only at commit time, so a
    failed overwrite cannot destroy the old dataset."""
    import glob
    import json
    import os

    from pyspark_for_ebook_classification_spark.sources.io import load
    from pyspark_for_ebook_classification_spark.sources.pyds import register

    register(spark)
    out = str(tmp_path / "jsonl_over")
    n = load(spark, sf_dir, "nation")
    n.write.format("jsonl_sink").option("path", out).mode("append").save()

    small = n.filter("n_regionkey = 0")
    n_small = small.count()
    small.write.format("jsonl_sink").option("path", out).mode("overwrite").save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["rows"] == n_small
    on_disk = set(glob.glob(os.path.join(out, "part-*.jsonl")))
    assert on_disk == set(manifest["parts"])  # stale parts gone
    assert spark.read.json(out, schema=n.schema).count() == n_small

    small.write.format("jsonl_sink").option("path", out).mode("append").save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["rows"] == 2 * n_small  # cumulative across jobs
    assert len(set(manifest["parts"])) == len(manifest["parts"])
    assert spark.read.json(out, schema=n.schema).count() == 2 * n_small


def test_sql_ddl_dml_surface(spark, sf_dir, tmp_path):
    """Catalog DDL/DML path: CTAS into a parquet-backed managed location,
    INSERT INTO ... SELECT appends atomically, DESCRIBE sees the schema,
    CACHE pins it. This is the spark-sql entry surface a warehouse user
    drives the engine through."""
    from pyspark.sql import functions as F

    from pyspark_for_ebook_classification_spark.sources.io import load

    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    spark.sql("DROP TABLE IF EXISTS nation_ddl")
    spark.sql(
        f"CREATE TABLE nation_ddl USING parquet LOCATION '{tmp_path}/nation_ddl' "
        "AS SELECT n_nationkey, n_name, n_regionkey FROM nation_v"
    )
    assert spark.table("nation_ddl").count() == 25

    spark.sql(
        "INSERT INTO nation_ddl "
        "SELECT n_nationkey + 100, concat('COPY_', n_name), n_regionkey "
        "FROM nation_v WHERE n_regionkey = 0"
    )
    t = spark.table("nation_ddl")
    assert t.count() == 30
    assert t.filter(F.col("n_name").startswith("COPY_")).count() == 5

    cols = {r["col_name"] for r in spark.sql("DESCRIBE TABLE nation_ddl").collect()}
    assert {"n_nationkey", "n_name", "n_regionkey"} <= cols

    spark.sql("CACHE TABLE nation_ddl")
    assert spark.catalog.isCached("nation_ddl")
    spark.sql("UNCACHE TABLE nation_ddl")
    assert not spark.catalog.isCached("nation_ddl")
    spark.sql("DROP TABLE nation_ddl")


def test_json_corrupt_record_modes(spark, tmp_path):
    """Malformed-ingest policy — the difference between a 100 TB load
    that quarantines bad rows and one that dies at hour 9: PERMISSIVE
    captures the raw line in _corrupt_record, DROPMALFORMED silently
    drops it, FAILFAST raises."""
    import pytest
    from pyspark.sql import functions as F

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        "{bad json here}\n"
        '{"id": 2, "v": "also ok"}\n'
    )
    schema = "id BIGINT, v STRING, _corrupt_record STRING"

    perm = spark.read.schema(schema).json(str(p)).cache()
    try:
        assert perm.count() == 3
        bad = perm.filter(F.col("_corrupt_record").isNotNull())
        assert bad.count() == 1
        assert bad.first()["_corrupt_record"].startswith("{bad")
    finally:
        perm.unpersist()

    dropped = spark.read.schema("id BIGINT, v STRING").option(
        "mode", "DROPMALFORMED"
    ).json(str(p))
    assert sorted(r["id"] for r in dropped.collect()) == [1, 2]

    with pytest.raises(Exception):
        spark.read.schema("id BIGINT, v STRING").option("mode", "FAILFAST").json(
            str(p)
        ).collect()


def test_binaryfile_source_feeds_decode_kernel(spark, tmp_path):
    """L5 ingest path: the binaryFile source mounts raw media blobs as
    (path, length, content) rows — exactly what the multimodal decode
    kernel consumes. Three fake payloads in, three decoded metadata rows
    out, dims matching the deterministic codec math."""
    from pyspark.sql import functions as F

    from pyspark_for_ebook_classification_spark.operators.multimodal import (
        DECODE_SCHEMA,
        _fake_decode,
        _make_decode_kernel,
    )

    payloads = {0: b"aaa-media-bytes", 1: b"bb", 2: b"c" * 301}
    for i, blob in payloads.items():
        (tmp_path / f"{i}.bin").write_bytes(blob)

    files = spark.read.format("binaryFile").load(str(tmp_path / "*.bin"))
    media = files.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1).cast("long").alias("doc_id"),
        F.lit("image").alias("media_type"),
        F.col("content").alias("payload"),
    )
    out = {
        r["doc_id"]: r
        for r in media.mapInPandas(_make_decode_kernel(), schema=DECODE_SCHEMA).collect()
    }
    assert len(out) == 3
    for i, blob in payloads.items():
        w, h, nf = _fake_decode(blob)
        assert (out[i]["width"], out[i]["height"], out[i]["n_frames"]) == (w, h, nf)
        assert out[i]["byte_len"] == len(blob)


def test_sink_codecs_and_file_sizing(spark, sf_dir, tmp_path):
    """S5 sink tuning knobs that matter at 100 TB: compression codec
    (zstd/snappy both round-trip losslessly) and maxRecordsPerFile
    (bounds file size so downstream scans parallelize — one giant file
    is as bad as a million tiny ones)."""
    import glob

    from pyspark_for_ebook_classification_spark.sources.io import load

    c = load(spark, sf_dir, "customer")
    n = c.count()
    for codec in ("zstd", "snappy"):
        path = str(tmp_path / f"cust_{codec}")
        c.write.mode("overwrite").option("compression", codec).parquet(path)
        back = spark.read.parquet(path)
        assert back.count() == n
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, c.collect()))

    sized = str(tmp_path / "cust_sized")
    c.coalesce(1).write.mode("overwrite").option("maxRecordsPerFile", 400).parquet(
        sized
    )
    parts = glob.glob(sized + "/part-*.parquet")
    assert len(parts) >= n // 400, parts  # 1500 rows / 400 → ≥ 3 files
    assert spark.read.parquet(sized).count() == n


def test_pandas_on_spark_api_delegates(spark, sf_dir):
    """The pandas-API-on-Spark surface (pyspark.pandas): a user can drive
    the same engine through pandas idioms — groupby/size here — and get
    the identical distributed result the SQL path computes (it compiles
    to the same Catalyst plans; no data leaves the cluster)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pyspark.pandas as ps

        pdf = ps.read_parquet(f"{sf_dir}/documents.parquet")
        got = pdf.groupby("lang").size().to_dict()
    want = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert got == want


def test_python_ds_pushdown_prunes_and_strides(spark):
    """Filter pushdown must (a) return only unhandled filters, (b) clip
    the split plan to the pushed id range, (c) generate only matching
    rows, and (d) produce the same result Spark computes without any
    pushdown (semantics preserved)."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
    )

    from pyspark_for_ebook_classification_spark.sources.pyds import (
        SynthCorpusReader,
        register,
    )

    r = SynthCorpusReader({"rows": "5000", "parts": "8"})
    left = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("id",), 1200),
                LessThan(("id",), 3800),
                EqualTo(("bucket",), 7),
            ]
        )
    )
    assert left == []  # all three handled by the source
    splits = r.partitions()
    assert min(p.start for p in splits) >= 1200
    assert max(p.end for p in splits) <= 3800
    rows = [row for p in splits for row in r.read(p)]
    assert len(rows) == 260  # generated exactly the matching rows
    assert all(1200 <= i < 3800 and i % 10 == 7 for i, _, _ in rows)

    register(spark)
    pushed = (
        spark.read.format("synth_corpus")
        .option("rows", 5000)
        .option("parts", 8)
        .load()
        .filter("id >= 1200 and id < 3800 and bucket = 7")
    )
    expected = {(i, i % 10, (i * 2654435761) % 1000003) for i in range(1207, 3800, 10)}
    assert {tuple(r) for r in pushed.collect()} == expected


def test_csv_permissive_mode_captures_corrupt_rows(spark, tmp_path):
    """S2 robustness: PERMISSIVE mode must load every parseable row and
    route malformed ones into the _corrupt_record column instead of
    failing the job — the only viable semantics for dirty data at scale
    (FAILFAST on row 10^12 of a crawl is not an option)."""
    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,qty,price\n"
        "1,5,10.5\n"
        "2,not_a_number,20.0\n"
        "3,7,30.25\n"
        "broken row without commas\n"
    )
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema("id INT, qty INT, price DOUBLE, _corrupt_record STRING")
        .csv(str(p))
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["qty"] == 5 and rows[1]["_corrupt_record"] is None
    assert rows[3]["price"] == 30.25
    # malformed rows survive WITH their raw text attached
    bad = [r for r in rows.values() if r["_corrupt_record"] is not None]
    assert len(bad) == 2
    assert any("not_a_number" in r["_corrupt_record"] for r in bad)
    assert all(r["qty"] is None for r in bad)


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """S5 evolution: two parquet generations with different columns read
    back as ONE table under mergeSchema — old rows surface NULL for new
    columns. This is how a 100 TB dataset adds a column without
    rewriting history."""
    v1 = spark.createDataFrame([(1, "a")], "id BIGINT, name STRING")
    v2 = spark.createDataFrame(
        [(2, "b", 0.5)], "id BIGINT, name STRING, score DOUBLE"
    )
    v1.write.parquet(str(tmp_path / "t" / "gen=1"))
    v2.write.parquet(str(tmp_path / "t" / "gen=2"))
    merged = spark.read.option("mergeSchema", True).parquet(str(tmp_path / "t"))
    assert set(merged.columns) == {"id", "name", "score", "gen"}
    got = {r["id"]: r for r in merged.collect()}
    assert got[1]["score"] is None and got[1]["gen"] == 1
    assert got[2]["score"] == 0.5 and got[2]["gen"] == 2

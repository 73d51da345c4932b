"""Source-format breadth: ORC with pushdown/pruning parity, XML with
explicit schemas, binaryFile as the REAL arrival path for multimodal
payloads, and fixed-width text projections."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cig_etl_s3_to_sql_data_ingestor_spark.sources import formats as FM


def test_orc_roundtrip_with_pushdown_and_pruning(spark, sf_dir, tmp_path):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem").limit(2000)
    FM.write_orc(li, str(tmp_path / "li_orc"))
    back = FM.read_orc_table(spark, str(tmp_path / "li_orc"))
    assert back.count() == 2000

    q = back.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = q._jdf.queryExecution().explainString(mode)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any("l_quantity" in ln for ln in pushed), plan
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert reads and "l_extendedprice" not in reads[0], reads


def test_xml_reader_with_explicit_schema(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    df = spark.createDataFrame([(1, "alpha"), (2, "beta")], schema)
    df.write.format("xml").option("rootTag", "rows").option(
        "rowTag", "row"
    ).save(str(tmp_path / "x"))
    back = FM.read_xml_records(spark, str(tmp_path / "x"), "row", schema)
    assert sorted((r.id, r.name) for r in back.collect()) == [
        (1, "alpha"),
        (2, "beta"),
    ]


def test_binary_assets_feed_the_real_image_codec(spark, tmp_path):
    """The production path: PNG files on disk -> binaryFile rows ->
    the SAME decode the fixture-based operators use. Stats from the
    file-sourced payloads must equal stats computed from the generative
    formula, proving codec and source compose byte-identically."""
    import numpy as np

    from cig_etl_s3_to_sql_data_ingestor_spark.operators.multimodal import (
        make_png_codec,
    )

    encode_png, _ = make_png_codec()
    adir = tmp_path / "assets"
    adir.mkdir()
    expected = {}
    for did in range(4):
        w, h = 8 + did, 5 + did
        xs = np.arange(w, dtype=np.int64)
        ys = np.arange(h, dtype=np.int64)
        px = ((did * 31 + 7 * xs[None, :] + 13 * ys[:, None]) % 256).astype(
            np.uint8
        )
        (adir / f"img_{did}.png").write_bytes(encode_png(px))
        expected[f"img_{did}.png"] = int(px.sum())
    # A non-matching file the glob must prune before any bytes move.
    (adir / "notes.txt").write_text("not an image")

    assets = FM.read_binary_assets(spark, str(adir), glob="*.png")
    assert assets.count() == 4

    codec = make_png_codec()

    def stats(batches):
        import pandas as pd

        _, decode_png = codec
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_name": pdf["asset_name"],
                    "pixel_sum": [
                        int(decode_png(p).astype("int64").sum())
                        for p in pdf["payload"]
                    ],
                }
            )

    got = {
        r.asset_name: r.pixel_sum
        for r in assets.mapInPandas(
            stats, "asset_name string, pixel_sum long"
        ).collect()
    }
    assert got == expected


def test_fixed_width_projection_and_types(spark, tmp_path):
    lines = [
        "0001  alice   19.50",
        "0002  bob       oops",   # corrupt numeric -> NULL, row survives
        "0003  carol  100.00",
    ]
    p = tmp_path / "fw.txt"
    p.write_text("\n".join(lines))
    cols = [
        ("id", 1, 4, "bigint"),
        ("name", 7, 7, "string"),
        ("amount", 14, 7, "double"),
    ]
    df = FM.read_fixed_width(spark, str(p), cols)
    rows = {r.id: (r.name, r.amount) for r in df.collect()}
    assert rows[1] == ("alice", 19.50)
    assert rows[2][0] == "bob" and rows[2][1] is None
    assert rows[3] == ("carol", 100.00)

    with pytest.raises(ValueError, match="overlap"):
        FM.fixed_width_schema([("a", 1, 4, "string"), ("b", 3, 2, "string")])

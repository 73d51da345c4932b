"""CSV / JSON-lines sources: explicit schema, corrupt-record quarantine."""

from __future__ import annotations

from pyspark.sql import types as T

from cig_etl_s3_to_sql_data_ingestor_spark.sources import delimited as D

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("amount", T.DoubleType(), True),
    ]
)


def test_csv_clean_and_quarantine_split(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text(
        "id,name,amount\n"
        "1,alpha,10.5\n"
        "not_a_number,beta,2.0\n"  # uncastable id -> quarantine
        "3,gamma,7.25\n"
    )
    clean, quarantine = D.read_with_quarantine(spark, str(p), SCHEMA)
    assert [r.id for r in clean.orderBy("id").collect()] == [1, 3]
    assert D.CORRUPT_COL not in clean.columns
    assert clean.count() == 2  # pruned count must not trip the
    # corrupt-only-column restriction (the reason for the two-scan shape)
    q = quarantine.collect()
    assert len(q) == 1
    assert "not_a_number" in q[0].raw_record
    assert q[0].source_file.endswith("feed.csv")


def test_json_lines_quarantine(spark, tmp_path):
    p = tmp_path / "events.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "amount": 1.0}\n'
        "{broken json\n"
        '{"id": 2, "name": "b", "amount": 2.0}\n'
    )
    clean, quarantine = D.read_with_quarantine(spark, str(p), SCHEMA, fmt="json")
    assert sorted(r.id for r in clean.collect()) == [1, 2]
    assert quarantine.count() == 1
    assert "{broken json" in quarantine.collect()[0].raw_record


def test_csv_well_formed_has_empty_quarantine(spark, tmp_path):
    p = tmp_path / "ok.csv"
    p.write_text("id,name,amount\n1,a,1.0\n2,b,2.0\n")
    clean, quarantine = D.read_with_quarantine(spark, str(p), SCHEMA)
    assert clean.count() == 2
    assert quarantine.isEmpty()


def test_rejects_unknown_format(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="xml"):
        D.read_with_quarantine(spark, str(tmp_path), SCHEMA, fmt="xml")


def test_schema_already_containing_capture_column_is_untouched(spark, tmp_path):
    schema = D._with_corrupt_field(SCHEMA)
    assert D._with_corrupt_field(schema) is schema


def test_quarantine_keeps_partially_parsed_cells(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text("id,name,amount\n1,a,1.0\nbad_id,beta,2.0\n")
    _, quarantine = D.read_with_quarantine(spark, str(p), SCHEMA)
    row = quarantine.collect()[0]
    # PERMISSIVE decoded name before id failed; both survive as evidence.
    assert row.id is None and row.name == "beta"


def test_counts_stable_under_pruning(spark, tmp_path):
    # The silent DROPMALFORMED quirk this module refuses: a pruned count
    # must agree with a full materialization on BOTH split sides.
    p = tmp_path / "feed.csv"
    p.write_text("id,name,amount\n1,a,1.0\nbad,beta,2.0\n3,c,3.0\n")
    clean, quarantine = D.read_with_quarantine(spark, str(p), SCHEMA)
    assert clean.count() == len(clean.collect()) == 2
    assert quarantine.count() == len(quarantine.collect()) == 1
    assert not quarantine.isEmpty()

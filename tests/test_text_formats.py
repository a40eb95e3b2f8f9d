"""JSON-lines / CSV source adapters: schema-pinned round-trips must be
value-exact against the parquet registry scan, including timestamps."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.sources import text_formats as tf
from pdf_parse_vector_db_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


@pytest.mark.parametrize("fmt", ["jsonl", "csv", "orc"])
def test_events_round_trip(spark, tmp_path, fmt):
    src = load_table(spark, SF, "events")
    path = str(tmp_path / fmt)
    write = {"jsonl": tf.write_jsonl, "csv": tf.write_csv, "orc": tf.write_orc}[fmt]
    read = {"jsonl": tf.read_jsonl, "csv": tf.read_csv, "orc": tf.read_orc}[fmt]
    write(src, path)
    back = read(spark, path, "events")
    assert back.schema == src.schema
    assert _sorted_rows(back, "event_id") == _sorted_rows(src, "event_id")


def test_documents_csv_survives_embedded_delimiters(spark, tmp_path):
    # quoting must protect commas/newlines if they ever appear in text
    docs = load_table(spark, SF, "documents").withColumn(
        "text", F.concat(F.col("text"), F.lit(', "quoted", and more'))
    )
    path = str(tmp_path / "docs_csv")
    tf.write_csv(docs, path)
    back = tf.read_csv(spark, path, "documents")
    assert _sorted_rows(back, "doc_id") == _sorted_rows(docs, "doc_id")


def test_failfast_rejects_corrupt_jsonl(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"event_id": 1, "ts": "2024-01-01T00:00:00.000000", "user_id": 2, '
        '"event_type": "view", "value": 1.5, "props": "{}"}\n'
        "{not json at all\n"
    )
    with pytest.raises(Exception, match="(?i)malformed|failfast|corrupt"):
        tf.read_jsonl(spark, str(p), "events").collect()

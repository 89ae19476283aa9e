"""Generic source/sink round-trips for csv/json/orc alongside parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_copy_spark.sources.catalog import (
    load_table,
    read_source,
    write_sink,
)


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(200)
        .cache()
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, sample, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_sink(sample, path, fmt=fmt)
    back = read_source(spark, path, fmt=fmt, schema=sample.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sample.collect()))


def test_csv_infers_header(spark, sample, tmp_path):
    path = str(tmp_path / "c")
    write_sink(sample, path, fmt="csv")
    back = read_source(spark, path, fmt="csv")
    assert set(back.columns) == set(sample.columns)
    assert back.count() == sample.count()


def test_partitioned_sink(spark, sample, tmp_path):
    path = str(tmp_path / "p")
    write_sink(sample, path, fmt="parquet", partition_by=["o_orderstatus"])
    back = read_source(spark, path)
    assert back.count() == sample.count()
    # partition pruning: filter on the partition column prunes directories
    one = back.filter(F.col("o_orderstatus") == "F")
    assert one.count() == sample.filter(F.col("o_orderstatus") == "F").count()


class TestTextCorpusIngestion:
    """JSONL(.gz) -> documents-schema ingestion (load_text_corpus)."""

    @pytest.fixture(scope="class")
    def docs(self, spark, sf_dir):
        return load_table(spark, sf_dir, "documents").cache()

    @pytest.mark.parametrize("compression", [None, "gzip"])
    def test_jsonl_roundtrip(self, spark, docs, tmp_path, compression):
        from data_warehouse_copy_spark.sources.catalog import load_text_corpus

        path = str(tmp_path / (compression or "plain"))
        w = docs.write
        if compression:
            w = w.option("compression", compression)
        w.json(path)
        back = load_text_corpus(spark, path)
        assert back.columns == ["doc_id", "text", "lang", "source", "n_chars"]
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, docs.collect())
        )

    def test_missing_fields_are_backfilled(self, spark, tmp_path):
        from data_warehouse_copy_spark.sources.catalog import load_text_corpus

        p = tmp_path / "sparse"
        p.mkdir()
        (p / "part-0.jsonl").write_text(
            '{"doc_id": 1, "text": "hello world"}\n'
            '{"doc_id": 2, "text": "abc", "lang": "en", "n_chars": 3}\n'
        )
        got = {r.doc_id: r for r in load_text_corpus(spark, str(p)).collect()}
        assert got[1].n_chars == 11  # recomputed from text
        assert got[1].source is None and got[1].lang is None
        assert got[2].n_chars == 3  # provided value wins

    def test_training_prep_off_jsonl_matches_parquet(
        self, spark, docs, sf_dir, tmp_path
    ):
        """The composed training-prep pipeline must produce the identical
        (oracle-pinned) result whether the corpus arrives as the parquet
        fixture or as a gzipped JSONL drop."""
        from data_warehouse_copy_spark.queries import (
            training_data_prep,
            training_prep_pipeline,
        )
        from data_warehouse_copy_spark.sources.catalog import load_text_corpus

        path = str(tmp_path / "corpus")
        docs.write.option("compression", "gzip").json(path)
        via_jsonl = training_prep_pipeline(load_text_corpus(spark, path))
        via_parquet = training_data_prep(spark, sf_dir)
        assert sorted(map(tuple, via_jsonl.collect())) == sorted(
            map(tuple, via_parquet.collect())
        )


def test_write_text_corpus_roundtrip(spark, tmp_path, sf_dir):
    """Sharded JSONL.gz emission round-trips through load_text_corpus
    value-exactly, and the shard count controls the output file count
    (gzip shards = downstream read parallelism)."""
    from data_warehouse_copy_spark.sources.catalog import (
        load_text_corpus,
        write_text_corpus,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "corpus_out")
    write_text_corpus(docs, out, shards=4)
    import glob

    files = glob.glob(f"{out}/part-*.json.gz")
    assert len(files) == 4
    back = load_text_corpus(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.select(*back.columns).collect())
    )

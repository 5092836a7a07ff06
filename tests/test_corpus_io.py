"""Corpus format ingestion (sources/corpus.py)."""

from __future__ import annotations

import econdatapipeline_spark.sources.corpus as C

DOC_SCHEMA = "doc_id long, text string, lang string"


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    src = tmp_path / "docs.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en"}\n'
        '{"doc_id": 2, "text": "hola", "lang": "es"}\n'
        "not json at all\n"
        '{"doc_id": 3, "text": "ok"}\n'   # missing field -> null, not corrupt
    )
    df = C.read_jsonl(spark, str(src), DOC_SCHEMA)
    clean, bad = C.split_corrupt(df)
    rows = {r["doc_id"]: (r["text"], r["lang"]) for r in clean.collect()}
    assert rows == {1: ("hello", "en"), 2: ("hola", "es"), 3: ("ok", None)}
    assert [r["_corrupt_record"] for r in bad.collect()] == ["not json at all"]

    out = tmp_path / "out"
    C.write_jsonl(clean, str(out))
    back, bad2 = C.split_corrupt(C.read_jsonl(spark, str(out), DOC_SCHEMA))
    assert back.count() == 3 and bad2.count() == 0


def test_csv_with_header_and_bad_row(spark, tmp_path):
    src = tmp_path / "docs.csv"
    src.write_text(
        "doc_id,text,lang\n"
        "1,hello,en\n"
        "oops,not-a-long,xx\n"
    )
    clean, bad = C.split_corrupt(C.read_csv(spark, str(src), DOC_SCHEMA))
    assert [(r["doc_id"], r["text"]) for r in clean.collect()] == [(1, "hello")]
    assert bad.count() == 1


def test_orc_roundtrip_and_parquet_landing(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", "en"), (2, "b", "de")], DOC_SCHEMA)
    C.write_orc(df, str(tmp_path / "o"))
    got = C.read_orc(spark, str(tmp_path / "o"))
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 2]
    C.to_parquet_landing(got, str(tmp_path / "p"))
    assert spark.read.parquet(str(tmp_path / "p")).count() == 2

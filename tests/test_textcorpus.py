"""JSONL/CSV corpus source tests: schema discipline, corrupt-record
quarantine, round-trip, and compressed multi-shard reads."""

import pytest

import gzip
import json

from pyspark.sql import functions as F

from vectra_py_spark.sources.textcorpus import (
    DOCUMENTS_SCHEMA,
    corrupt_splitout,
    read_csv_documents,
    read_jsonl_documents,
    write_jsonl,
)

ROWS = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web",
     "n_chars": 10},
    {"doc_id": 2, "text": "gamma", "lang": "de", "source": "web",
     "n_chars": 5},
    {"doc_id": 3, "text": "delta epsilon", "lang": "en", "source": "book",
     "n_chars": 13},
]


def test_jsonl_read_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "corpus"
    p.mkdir()
    lines = [json.dumps(r) for r in ROWS[:2]]
    lines.insert(1, '{"doc_id": 99, "text": "truncated...')  # malformed
    (p / "part-0.jsonl").write_text("\n".join(lines) + "\n")

    df = read_jsonl_documents(spark, str(p))
    clean, bad = corrupt_splitout(df)
    assert clean.columns == DOCUMENTS_SCHEMA.fieldNames()
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert bad.count() == 1  # aggregates on the quarantine stream work
    bad_row = bad.collect()[0]
    assert "truncated" in bad_row._corrupt        # raw line preserved
    assert bad_row._file.endswith("part-0.jsonl")  # shard provenance


def test_jsonl_gzip_shards_and_roundtrip(spark, tmp_path):
    p = tmp_path / "gz_corpus"
    p.mkdir()
    for i, r in enumerate(ROWS):
        with gzip.open(p / f"shard-{i}.jsonl.gz", "wt") as f:
            f.write(json.dumps(r) + "\n")
    df = read_jsonl_documents(spark, str(p))
    clean, bad = corrupt_splitout(df)
    assert bad.count() == 0
    assert clean.count() == 3

    out = tmp_path / "rt"
    write_jsonl(clean, str(out), compression="gzip", shards=2)
    back, bad2 = corrupt_splitout(read_jsonl_documents(spark, str(out)))
    assert bad2.count() == 0
    assert sorted(r.doc_id for r in back.collect()) == [1, 2, 3]


def test_csv_read_drops_per_shard_headers_and_quarantines(spark, tmp_path):
    p = tmp_path / "csv_corpus"
    p.mkdir()
    (p / "part-0.csv").write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,alpha beta,en,web,10\n"
        "not_a_number,gamma,de,web,5\n"  # doc_id fails the LongType
        "3,delta epsilon,en,book,13\n"
    )
    (p / "part-1.csv").write_text(  # second shard: own header line
        "doc_id,text,lang,source,n_chars\n"
        "4,zeta,fr,web,4\n"
    )
    clean, bad = corrupt_splitout(read_csv_documents(spark, str(p)))
    assert {r.doc_id for r in clean.collect()} == {1, 3, 4}
    assert bad.count() == 1


def test_blank_lines_skipped_and_parse_is_narrow(spark, tmp_path):
    p = tmp_path / "plan_corpus"
    p.mkdir()
    body = "\n\n".join(json.dumps(r) for r in ROWS)  # blank line gaps
    (p / "a.jsonl").write_text(body + "\n")
    clean, bad = corrupt_splitout(read_jsonl_documents(spark, str(p)))
    assert bad.count() == 0  # blank lines are skipped, not corrupt
    assert clean.count() == 3
    narrow = clean.select("doc_id", "source").filter(
        F.col("source") == "web"
    )
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    # parse + project + filter fuse into one codegen'd map: no
    # shuffle, no Python evaluation anywhere in the read path
    assert "Exchange" not in plan
    assert plan.startswith("*(1)")  # fused into one codegen stage
    assert "Python" not in plan


@pytest.mark.slow  # heavyweight e2e/equivalence — full-suite tier
def test_jsonl_dump_to_retrieval_end_to_end(spark, tmp_path):
    """The full bulk path: JSONL dump → quarantine split → DataFrame
    bulk ingest → vector retrieval, nothing driver-side in between."""
    import json as _json

    from pyspark.sql import functions as F
    from vectra_py_spark.document_index import SparkDocumentIndex

    p = tmp_path / "dump"
    p.mkdir()
    rows = [
        {"doc_id": 1, "text": "alpha retrieval subject body", "lang": "en",
         "source": "web", "n_chars": 28},
        {"doc_id": 2, "text": "beta unrelated content words", "lang": "en",
         "source": "web", "n_chars": 28},
    ]
    lines = [_json.dumps(r) for r in rows] + ['{"doc_id": broken']
    (p / "part-0.jsonl").write_text("\n".join(lines) + "\n")

    clean, bad = corrupt_splitout(read_jsonl_documents(spark, str(p)))
    assert bad.count() == 1

    idx = SparkDocumentIndex(spark, str(tmp_path / "e2e_idx"), vector_dim=16)
    idx.create()
    idx.upsert_documents_df(
        clean.select(
            F.concat(F.lit("dump://"), F.col("doc_id")).alias("uri"),
            "text",
            "source",
        ),
        metadata_cols=("source",),
    )
    assert idx.get_catalog_stats()["documents"] == 2
    hits = idx.query_documents("alpha retrieval", max_documents=1).collect()
    assert len(hits) == 1

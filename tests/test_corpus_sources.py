"""S1/S3: format-dispatched corpus readers (parquet / jsonl / csv)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dedup_ray.sources.corpus import infer_format, read_corpus

ROWS = [
    {"doc_id": 0, "text": "alpha beta gamma", "lang": "en"},
    {"doc_id": 1, "text": "delta epsilon", "lang": "en"},
    {"doc_id": 2, "text": "zeta eta theta iota", "lang": "zh"},
]


@pytest.fixture(scope="module")
def corpus_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    t = pa.Table.from_pylist(ROWS)
    pq.write_table(t, d / "docs.parquet")
    with open(d / "docs.jsonl", "w") as f:
        import json

        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    with open(d / "docs.csv", "w") as f:
        f.write("doc_id,text,lang\n")
        for r in ROWS:
            f.write(f"{r['doc_id']},{r['text']},{r['lang']}\n")
    return d


def test_infer_format(corpus_files):
    assert infer_format(str(corpus_files / "docs.parquet")) == "parquet"
    assert infer_format(str(corpus_files / "docs.jsonl")) == "json"
    assert infer_format(str(corpus_files / "docs.csv")) == "csv"
    with pytest.raises(ValueError):
        infer_format(str(corpus_files / "docs.xml"))


@pytest.mark.parametrize("name", ["docs.parquet", "docs.jsonl", "docs.csv"])
def test_read_corpus_all_formats_agree(corpus_files, name):
    df = (
        read_corpus(str(corpus_files / name), columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(df.columns) == ["doc_id", "text"]
    assert df["text"].tolist() == [r["text"] for r in ROWS]


def test_partitioned_write_pruned_read(tmp_path):
    import pyarrow as pa
    import ray.data

    t = pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "lang": pa.array((["en", "de", "fr"] * 4)),
        "n_chars": pa.array(range(12), pa.int64()),
    })
    out = str(tmp_path / "part")
    ray.data.from_arrow(t).write_parquet(out, partition_cols=["lang"])
    import os

    assert sorted(os.listdir(out)) == ["lang=de", "lang=en", "lang=fr"]
    # pruned read opens ONLY the en directory; fr/de bytes stay on disk
    en = ray.data.read_parquet(f"{out}/lang=en").to_pandas()
    assert sorted(en["doc_id"]) == [0, 3, 6, 9]
    assert set(en["lang"]) == {"en"}  # hive key reconstructed from path

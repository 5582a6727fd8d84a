"""The end-to-end pipeline CLI: stage composition + artifact shapes."""

import json

from pyspark.sql import functions as F


# a long shared body so near-clones share nearly all 8-word shingles
# (the MinHash gate needs >= 57/64 equal signature bytes ~ jaccard .9)
_BASE = " ".join(f"word{j} common body token{j}" for j in range(60))


def _write_corpus(spark, tmp_path, n=40):
    rows = []
    for i in range(n):
        if i % 13 == 0:
            text = _BASE + f" tail{i}"          # near-duplicate family
        else:
            text = f"document {i} body with words number {i * 13} " \
                   f"alpha beta gamma delta {i}"
        rows.append((i, text, f"src{i % 3}"))
    # a too-short doc and an exact duplicate pair
    rows.append((n, "tiny", "src0"))
    rows.append((n + 1, rows[1][1], "src1"))
    p = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, source string") \
         .write.mode("overwrite").parquet(p)
    return p, len(rows)


def test_pipeline_cli_stages_and_store(spark, tmp_path, capsys):
    from main import main

    docs_path, n_in = _write_corpus(spark, tmp_path)
    wd = str(tmp_path / "wd")
    main(["--cores", "8", "pipeline", "--docs", docs_path,
          "--workdir", wd, "--min-tokens", "3",
          "--lm-quantile", "0.99", "--build-index"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert out["input_docs"] == n_in
    # curation drops the exact duplicate and the too-short doc
    assert out["after_curation"] <= n_in - 2
    # near-dup keep-first collapses the _BASE+tail clone family to one
    # (exact dups are already gone — curation's sha gate owns those)
    assert out["after_near_dup"] < out["after_curation"]
    assert out["after_lm_gate"] <= out["after_near_dup"]
    assert sum(out["by_split"].values()) == out["final_docs"]
    assert out["index_chunks"] >= 1

    # stage relations exist and the final relation carries splits
    final = spark.read.parquet(f"{wd}/documents")
    assert set(final.columns) == {"doc_id", "text", "source", "split"}
    assert final.count() == out["final_docs"]
    # manifest on disk matches stdout
    assert json.load(open(f"{wd}/pipeline.json")) == out

    # the produced store serves queries
    from index_spark.operators.query import search
    from index_spark.plans.checkpoint import load_docs, load_index, load_stats

    idx = load_index(spark, f"{wd}/index_store")
    stats = load_stats(f"{wd}/index_store")
    docs = load_docs(spark, f"{wd}/index_store")
    hits = search(idx, docs, stats, "body words", k=3).collect()
    assert len(hits) > 0


def test_pipeline_cli_near_dup_is_transitive(spark, tmp_path, capsys):
    # three clones of one body: pairwise LSH may emit any pair subset
    # covering them; the cluster stage must still keep exactly one
    from main import main

    rows = [(i, _BASE + f" tail{i}", "s") for i in range(3)]
    rows += [(10, "completely different content about other things "
                  "unrelated entirely separate material", "s")]
    p = str(tmp_path / "docs2")
    spark.createDataFrame(rows, "doc_id long, text string, source string") \
         .write.mode("overwrite").parquet(p)
    wd = str(tmp_path / "wd2")
    main(["--cores", "8", "pipeline", "--docs", p, "--workdir", wd,
          "--min-tokens", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["after_near_dup"] == 2  # one clone survives + the other doc

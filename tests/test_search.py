from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bm25_index_prunes_files(spark):
    """A term probe against the term-clustered postings table must be
    served from a strict subset of the table's files (manifest min/max
    pruning — the index access path q200's flag pins)."""
    from prox_spark.queries.search import _bm25_index
    from prox_spark.table import point_lookup_files, read_manifest

    postings, _, _ = _bm25_index(spark, SF)
    total = len(read_manifest(spark, postings)["files"])
    assert total > 1
    for term in ("dup", "hash", "window"):
        touched = point_lookup_files(spark, postings, {"term": term})
        assert 0 < len(touched) < total


def test_bm25_probe_matches_full_scan(spark):
    """Postings served through the pruned probe equal the unpruned
    table filtered the slow way — a mis-pruned file would drop rows."""
    from prox_spark.queries.search import _bm25_index
    from prox_spark.table import read_table, read_table_point

    postings, _, _ = _bm25_index(spark, SF)
    probe = read_table_point(spark, postings, {"term": "merge"})
    full = read_table(spark, postings).filter(F.col("term") == "merge")
    assert sorted(map(tuple, probe.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_bm25_scores_rank_rare_term_docs_first(spark):
    """Docs hitting the rare query term ('dup', df≈5% of the corpus)
    must outrank common-term-only docs for the query that includes it:
    the rational IDF keeps BM25's rarity ordering."""
    from prox_spark.queries.search import q200_bm25_search

    out = q200_bm25_search(spark, SF).filter(F.col("query_id") == 1)
    rows = out.orderBy("rnk").collect()
    assert rows, "query 1 returned no hits"
    # top hit for ['dup', 'hash'] must have matched both terms
    assert rows[0]["n_terms_hit"] == 2
    assert all(r["files_pruned"] for r in rows)
    assert all(r["score_micro"] > 0 for r in rows)

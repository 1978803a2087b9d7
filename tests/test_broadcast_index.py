"""candidate_pairs_broadcast_index must produce EXACTLY the same rows as
the shuffle-join candidate_pairs (scores bit-identical, ranks equal)."""

from ontoemma_spark.datagen import synthetic_kb
from ontoemma_spark.operators.blocking import (
    candidate_pairs,
    candidate_pairs_broadcast_index,
    entity_tokens,
)


def _rows(df):
    return {
        (r["s_id"], r["t_id"]): (r["cand_score"], r["rank"]) for r in df.collect()
    }


def test_broadcast_index_equals_shuffle_plan(spark):
    s_ents, _ = synthetic_kb(spark, "SRC", n_entities=50, id_offset=0)
    t_ents, _ = synthetic_kb(spark, "TGT", n_entities=40, id_offset=15)
    s_tok, t_tok = entity_tokens(s_ents), entity_tokens(t_ents)
    a = _rows(candidate_pairs(s_tok, t_tok, 50, 40, top_k=7))
    b = _rows(candidate_pairs_broadcast_index(s_tok, t_tok, 50, 40, top_k=7))
    assert set(a) == set(b)
    for k in a:
        assert a[k][1] == b[k][1], k  # ranks equal
        assert abs(a[k][0] - b[k][0]) < 1e-12, k  # scores equal


def test_broadcast_index_no_wide_shuffle(spark):
    s_ents, _ = synthetic_kb(spark, "SRC", n_entities=20)
    t_ents, _ = synthetic_kb(spark, "TGT", n_entities=20, id_offset=5)
    df = candidate_pairs_broadcast_index(
        entity_tokens(s_ents), entity_tokens(t_ents), 20, 20, top_k=5
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # no join node: the pair table is never materialized relationally
    assert "Join" not in plan.split("FlatMapGroupsInPandas")[0] if "FlatMapGroups" in plan else True
    assert df.count() > 0


def test_broadcast_jaccard_equals_relational(spark):
    from ontoemma_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_broadcast,
        word_shingles,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rel = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(word_shingles(docs, w=2), min_jaccard=0.3).collect()
    }
    fast = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs_broadcast(docs, w=2, min_jaccard=0.3).collect()
    }
    assert set(rel) == set(fast)
    for k in rel:
        assert abs(rel[k] - fast[k]) < 1e-12, k


def test_prefix_jaccard_equals_relational(spark):
    """ngram_jaccard_pairs_prefix (the distributed scale-safe default)
    is EXACT: identical pairs + values to the relational self-join."""
    from ontoemma_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
        word_shingles,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for t in (0.3, 0.5, 0.8):
        rel = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(word_shingles(docs, w=2), min_jaccard=t).collect()
        }
        pfx = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs_prefix(docs, w=2, min_jaccard=t).collect()
        }
        assert set(rel) == set(pfx), t
        for k in rel:
            assert abs(rel[k] - pfx[k]) < 1e-12, (t, k)


def test_prefix_jaccard_no_collect_in_plan(spark):
    """The prefix plan is pure relational algebra — no Python stage, no
    broadcast of corpus-derived state (scan-side broadcasts of the tiny
    df table by AQE are fine; asserted: no mapInPandas node)."""
    from ontoemma_spark.operators.dedup import ngram_jaccard_pairs_prefix

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = ngram_jaccard_pairs_prefix(docs, w=2)._jdf.queryExecution().optimizedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan and "MapInPandas" not in plan
    assert "PythonUDF" not in plan


def test_broadcast_jaccard_guard_falls_back(spark):
    """With max_index_rows=0 the broadcast kernel must refuse to collect
    and route through the distributed prefix plan — output identical."""
    from ontoemma_spark.operators.dedup import ngram_jaccard_pairs_broadcast

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    guarded = ngram_jaccard_pairs_broadcast(docs, w=2, min_jaccard=0.3, max_index_rows=0)
    plan = guarded._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInPandas" not in plan  # fell back to the relational plan
    fast = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_pairs_broadcast(docs, w=2, min_jaccard=0.3).collect()
    }
    assert {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9) for r in guarded.collect()
    } == fast


def test_auto_jaccard_all_regimes_identical(spark):
    """ngram_jaccard_pairs_auto must return the same rows whichever
    physical strategy its thresholds select."""
    from ontoemma_spark.operators.dedup import ngram_jaccard_pairs_auto

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def rows(df):
        return {(r["doc_a"], r["doc_b"]): round(r["jaccard"], 9) for r in df.collect()}

    kernel = rows(ngram_jaccard_pairs_auto(docs, w=2, min_jaccard=0.3))
    prefix = rows(ngram_jaccard_pairs_auto(
        docs, w=2, min_jaccard=0.3, max_index_entries=0, zipf_mean_df=1e9))
    relational = rows(ngram_jaccard_pairs_auto(
        docs, w=2, min_jaccard=0.3, max_index_entries=0, zipf_mean_df=0.0))
    assert kernel == prefix == relational
    assert len(kernel) > 0


def test_broadcast_index_guard_falls_back(spark):
    """candidate_pairs_broadcast_index with max_index_rows=0 must fall
    back to the relational candidate_pairs plan with identical output."""
    s_ents, _ = synthetic_kb(spark, "SRC", n_entities=30, id_offset=0)
    t_ents, _ = synthetic_kb(spark, "TGT", n_entities=25, id_offset=10)
    s_tok, t_tok = entity_tokens(s_ents), entity_tokens(t_ents)
    guarded = candidate_pairs_broadcast_index(
        s_tok, t_tok, 30, 25, top_k=5, max_index_rows=0
    )
    plan = guarded._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInPandas" not in plan
    assert _rows(guarded) == _rows(candidate_pairs(s_tok, t_tok, 30, 25, top_k=5))


def test_r5_review_dedup_guards(spark):
    """Round-5 review regressions: (1) the broadcast jaccard kernel
    skips docs shorter than w instead of KeyError; (2) the prefix plan
    refuses min_jaccard=0 and the auto router sends t=0 to the
    relational plan; (3) band_hashes refuses indivisible num_hashes;
    (4) exact_duplicates excludes null-text docs instead of collapsing
    them into one phantom group; (5) bloom_gated_dedup keeps null-key
    rows (is_dup false) instead of dropping them from both branches."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ontoemma_spark.operators.dedup import (
        band_hashes,
        bloom_gated_dedup,
        exact_duplicates,
        minhash_signatures,
        ngram_jaccard_pairs_auto,
        ngram_jaccard_pairs_broadcast,
        ngram_jaccard_pairs_prefix,
        word_shingles,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x"), (4, None)],
        "doc_id bigint, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"])
             for r in ngram_jaccard_pairs_broadcast(docs, w=3).collect()}
    assert pairs == {(1, 2)}  # short/null docs skipped, no KeyError

    with _pytest.raises(ValueError, match="min_jaccard"):
        ngram_jaccard_pairs_prefix(docs, min_jaccard=0.0)
    zero = {(r["doc_a"], r["doc_b"])
            for r in ngram_jaccard_pairs_auto(
                docs, min_jaccard=0.0, max_index_entries=1).collect()}
    assert zero == {(1, 2)}  # t=0 routed to the relational plan

    sigs = minhash_signatures(word_shingles(docs.filter("doc_id = 1")), num_hashes=8)
    with _pytest.raises(ValueError, match="not divisible"):
        band_hashes(sigs, num_hashes=8, bands=3)

    dups = exact_duplicates(docs).collect()
    assert sorted((r["rep_doc_id"], r["dup_count"]) for r in dups) == [
        (1, 2), (3, 1)]  # null-text doc 4 excluded

    corpus = spark.createDataFrame([("k1",)], "key string")
    batch = spark.createDataFrame(
        [(10, "k1"), (11, "k2"), (12, None)], "doc_id bigint, key string")
    out = {r["doc_id"]: r["is_dup"]
           for r in bloom_gated_dedup(batch, corpus).collect()}
    assert out == {10: True, 11: False, 12: False}  # null key kept


def test_broadcast_index_class_dedup_with_ties(spark):
    """r6 class-dedup probe: entities with IDENTICAL token sets (the
    memo/class path) and score ties across classes must rank exactly as
    the relational plan — tied scores break by t_id ascending, merged
    across classes."""
    # 6 targets in 3 classes: {a,b} twice, {a} twice, {b,c} twice;
    # 4 sources, two sharing a token set (memo hit)
    t_rows = [
        (101, "a"), (101, "b"), (104, "a"), (104, "b"),
        (102, "a"), (105, "a"),
        (103, "b"), (103, "c"), (106, "b"), (106, "c"),
    ]
    s_rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),   # identical set to s=1 → memoized result
        (3, "b"), (3, "c"),
        (4, "a"),
    ]
    s_tok = spark.createDataFrame(s_rows, "entity_id bigint, token string")
    t_tok = spark.createDataFrame(t_rows, "entity_id bigint, token string")
    a = _rows(candidate_pairs(s_tok, t_tok, 4, 6, idf_limit=0.0, top_k=3))
    b = _rows(
        candidate_pairs_broadcast_index(s_tok, t_tok, 4, 6, idf_limit=0.0, top_k=3)
    )
    assert set(a) == set(b)
    for k in a:
        assert a[k][1] == b[k][1], k
        assert abs(a[k][0] - b[k][0]) < 1e-12, k

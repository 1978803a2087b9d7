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

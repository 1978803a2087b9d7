"""Physical-plan assertions: the optimizations we rely on at 100 TB must
actually appear in the plan — filter/column pushdown to the parquet
scan, broadcast of KB-side joins, whole-stage codegen around the hot
expressions, and no Python eval in native paths."""

import pytest
from pyspark.sql import functions as F

from ontoemma_spark.operators.features import entity_feature_table, featurize_pairs
from ontoemma_spark.plans import demo_queries as dq

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_and_column_pushdown_reach_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/part.parquet")
        .filter(F.col("p_partkey") % 2 == 0)
        .filter(F.col("p_size") > 3)
        .select("p_partkey", "p_name")
    )
    scan_plan = _plan(df)
    # p_size > 3 is pushable; ReadSchema must be pruned to the 3 used cols
    assert "PushedFilters" in scan_plan and "GreaterThan(p_size,3)" in scan_plan
    assert "ReadSchema" in scan_plan
    read_schema = scan_plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "p_name" in read_schema and "p_retailprice" not in read_schema


def _relational_blocking(spark):
    from ontoemma_spark.datagen import synthetic_kb
    from ontoemma_spark.operators.blocking import candidate_pairs, entity_tokens

    s_ents, _ = synthetic_kb(spark, "S", n_entities=20)
    t_ents, _ = synthetic_kb(spark, "T", n_entities=20, id_offset=5)
    return candidate_pairs(entity_tokens(s_ents), entity_tokens(t_ents), 20, 20, top_k=5)


def test_blocking_join_plan_shape(spark):
    """The pure-relational blocking plan (both-sides-big regime)."""
    plan = _plan(_relational_blocking(spark))
    # the tiny IDF vocabulary must be broadcast, not shuffled
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # no Python evaluation anywhere in the hot path (all-native exprs)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the shuffle join on token must be a hash/SMJ equi-join, never a
    # nested-loop product
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_best_match_uses_rank_limit_pushdown(spark):
    plan = _plan(_relational_blocking(spark))
    # Spark 3.5+/4.x WindowGroupLimit prunes per-group rows before the
    # full window sort — essential when top-K covers 10^12 pairs
    assert "WindowGroupLimit" in plan


def test_demo_blocking_uses_broadcast_index_kernel(spark):
    """The demo/driver query uses the broadcast-index kernel: one Arrow
    stage (FlatMapGroupsInPandas), no relational join of the pair table."""
    df = dq._blocking_candidates_df(spark, SF)
    plan = _plan(df)
    assert "MapInPandas" in plan
    # the huge (s, t) pair table is never materialized relationally
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_featurize_pairs_is_python_free(spark):
    ents = spark.createDataFrame(
        [("E:1", "alpha beta", ["alpha beta"], "d", [], None, [], None)],
        "research_entity_id string, canonical_name string, aliases array<string>,"
        " definition string, source_urls array<string>, category string,"
        " other_contexts array<string>, additional_details map<string,array<string>>",
    )
    feats = entity_feature_table(ents)
    pairs = spark.createDataFrame([("E:1", "E:1")], "s_id string, t_id string")
    out = featurize_pairs(pairs, feats, feats)
    plan = _optimized(out)
    # the per-entity table uses pandas UDFs (stemmer) ONCE per entity;
    # the pairwise feature block itself must contain no Python at all:
    # project the 32 features and check the pair-side expressions
    pairwise_exprs = plan.split("Join")[0]
    assert "pythonUDF" not in pairwise_exprs.lower()


def test_extract_stage_is_narrow(spark):
    from ontoemma_spark.datagen import synthetic_pages
    from ontoemma_spark.extract.triples import extract_triples

    pages = synthetic_pages(spark, n_pages=5)
    plan = _plan(extract_triples(pages))
    # pages → triples must not shuffle (embarrassingly parallel at 10^12 pages)
    assert "Exchange" not in plan


def test_sessionize_batch_single_exchange(spark):
    """The three window steps (lag, running sum, groupBy) all partition
    by user_id — Spark must plan exactly ONE shuffle for the whole
    sessionization."""
    from ontoemma_spark.streaming.sessions import sessionize_batch

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(sessionize_batch(ev, gap_seconds=3600))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_ann_lsh_bucket_is_narrow_and_python_free(spark):
    """The LSH bucket probe is a pure column-expression filter over the
    scan: no shuffle, no Python eval — at 10^12 rows the signature
    becomes the partition key and this plan prunes instead of scanning."""
    from ontoemma_spark.operators.ann import lsh_bucket_candidates

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(i % 7 - 3) / 3.0 for i in range(64)]
    plan = _plan(lsh_bucket_candidates(emb, q))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_ann_topk_plans_take_ordered(spark):
    """orderBy().limit(k) must plan TakeOrderedAndProject (per-partition
    local top-k), not a global single-task row_number window."""
    from ontoemma_spark.operators.ann import brute_force_topk, lsh_bucket_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(i % 7 - 3) / 3.0 for i in range(64)]
    for fn in (brute_force_topk, lsh_bucket_topk):
        plan = _plan(fn(emb, q, k=5))
        assert "TakeOrderedAndProject" in plan, plan


def test_easy_negatives_no_cartesian(spark):
    """The index-sample rewrite must never plan a cartesian product
    (the r1 crossJoin was the repo's one scale-killer)."""
    from ontoemma_spark.operators.training import easy_negatives

    pos = spark.createDataFrame(
        [(f"s{i}", f"t{i}") for i in range(50)], "s_id string, t_id string"
    )
    t = spark.createDataFrame(
        [(f"t{i}",) for i in range(2000)], "research_entity_id string"
    )
    plan = _plan(easy_negatives(pos, t, per_positive=2))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_event_window_counts_single_exchange(spark):
    from ontoemma_spark.streaming.events import windowed_event_counts

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(windowed_event_counts(ev, window="1 hour"))
    # partial agg map-side, one shuffle to final agg
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial" in plan.lower(), plan


def test_embedding_neardup_lsh_plans_equi_join(spark):
    """The near-dup scale path must plan a signature EQUI-join (hash or
    sort-merge), never an all-pairs nested-loop product."""
    from ontoemma_spark.operators.ann import embedding_neardup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(embedding_neardup_pairs(emb, 0.95))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan


def test_decontaminate_probe_is_broadcast(spark):
    """The benchmark-gram probe must be a broadcast join (the corpus
    gram stream never shuffles) and nothing may go cartesian."""
    df = dq.QUERIES["decontaminate"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_repetition_and_rollup_aggregate_map_side(spark):
    """Both chained-aggregation ops must keep partial (map-side)
    aggregation and avoid any join blowup."""
    for name in ["repetition_scores", "source_rollup"]:
        df = dq.QUERIES[name](spark, "/root/testdata/sf0.001")
        plan = _plan(df)
        assert "partial_count" in plan or "partial count" in plan, name
        assert "CartesianProduct" not in plan, name


def test_substring_dup_pairs_banded_not_allpairs(spark):
    """The substring-dedup pair step must be an EQUI-self-join on the
    gram hash (banded), never a cartesian; gram extraction must not
    shuffle (no exchange before the join's own hashpartitioning); and
    the hot-gram guard must plan a broadcast anti-join."""
    from ontoemma_spark.operators.dedup import substring_dup_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(substring_dup_pairs(docs, w=20))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan

    guarded = _plan(substring_dup_pairs(docs, w=20, max_gram_df=100))
    assert "CartesianProduct" not in guarded, guarded
    assert "LeftAnti, BuildRight" in guarded or "BroadcastHashJoin" in guarded, guarded


def test_lsh_hot_band_cap_plans_broadcast_anti(spark):
    """The LSH hot-band guard (drop_hot_bands) must plan a broadcast
    ANTI-join in front of the band self-join — the same shape as
    substring_dup_pairs' max_gram_df guard — and never a cartesian."""
    from ontoemma_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures_narrow,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sig = minhash_signatures_narrow(docs)
    guarded = _plan(lsh_candidate_pairs(sig, max_band_df=100))
    assert "CartesianProduct" not in guarded and "BroadcastNestedLoopJoin" not in guarded, guarded
    assert "LeftAnti, BuildRight" in guarded or (
        "LeftAnti" in guarded and "BroadcastExchange" in guarded
    ), guarded


def test_extract_triples_single_scan(spark):
    """The multi-pattern extractor must read the source ONCE: a
    per-pattern union re-scans the corpus once per pattern (6x read
    amplification at 10^12 pages)."""
    from ontoemma_spark.extract.triples import extract_triples

    pages = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "CAST(doc_id AS STRING) AS url", "text"
    )
    plan = _plan(extract_triples(pages))
    assert plan.count("Scan parquet") == 1, plan
    assert "Union" not in plan, plan


def test_paragraph_dedup_no_window(spark):
    """First-occurrence selection must be the combinable min-struct
    aggregation, never a row_number window (a hyper-common paragraph
    would sort its entire occurrence list in one task), and the
    per-hash agg must have a map-side partial."""
    from ontoemma_spark.operators.dedup import paragraph_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(paragraph_dedup(docs))
    assert "Window" not in plan, plan
    assert "partial" in plan.lower(), plan


def test_exact_substring_removal_no_window_no_cartesian(spark):
    """ExactSubstr removal: first-occurrence is the combinable
    min-struct agg (no row_number window over a hot gram's occurrence
    list), the mark-back is an equi hash join (never cartesian), and
    the per-hash agg has a map-side partial. The interval merge and
    rebuild are in-row folds — no extra exchange beyond the per-doc
    groupBy."""
    from ontoemma_spark.operators.dedup import exact_substring_removal

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(exact_substring_removal(docs, w=20))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan
    assert "partial" in plan.lower(), plan


def test_incremental_dedup_probe_shapes(spark):
    """Batch-vs-corpus probes must be equi hash joins (no cartesian /
    nested loop) and the near probe a LeftSemi — the |batch|-sized
    probe shape the docstring promises."""
    from ontoemma_spark.operators.dedup import dedup_state, incremental_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    prior = docs.filter("doc_id < 250").select("doc_id", "text")
    batch = docs.filter("doc_id >= 250").select("doc_id", "text")
    hashes, bands_tbl = dedup_state(prior)
    plan = _plan(incremental_dedup(batch, hashes, bands_tbl))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert "LeftSemi" in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_curate_stage0_no_window_map_side(spark):
    """Stage 0 + gate: paragraph first-occurrence and the repetition
    aggregation must be combinable aggs (no row_number window anywhere
    in the chain), and no cartesian appears in the rebuild joins."""
    from ontoemma_spark.operators.curation import (
        gate_quality_repetition,
        pre_dedup_paragraph_stage,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    plan = _plan(gate_quality_repetition(pre_dedup_paragraph_stage(docs)))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_chunk_and_line_stats_are_narrow(spark):
    """chunk_documents and line_stats advertise ZERO shuffle — the
    plans must contain no Exchange and no Python eval."""
    from ontoemma_spark.operators.curation import chunk_documents
    from ontoemma_spark.operators.textstats import line_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df in (chunk_documents(docs, max_tokens=32, overlap=8),
               line_stats(docs)):
        plan = _plan(df)
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_key_skew_uses_take_ordered(spark):
    """The heavy-hitter report must plan TakeOrderedAndProject (local
    per-partition top-n), never a global sort, and broadcast the 1-row
    total."""
    from ontoemma_spark.operators.textstats import key_skew_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(key_skew_stats(docs, "source", top_n=5))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_weighted_edges_partial_agg_no_window(spark):
    """Edge consolidation must partial-aggregate map-side (support/min/
    max combine in the scan stage) and never fall back to a window —
    a head triple's emissions must not serialize on one reducer."""
    from ontoemma_spark.operators.graph import weighted_edges

    edges = spark.range(1000).select(
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("subject_id"),
        F.lit("is_a").alias("relation_type"),
        F.concat(F.lit("o"), (F.col("id") % 7).cast("string")).alias("object_id"),
        F.concat(F.lit("u"), (F.col("id") % 50).cast("string")).alias("url"),
        (F.col("id") % 37).alias("ts"),
    )
    plan = _plan(weighted_edges(edges, ts_col="ts"))
    assert "Window" not in plan, plan
    assert "partial" in plan.lower(), plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_entity_pmi_broadcast_marginals_no_cartesian(spark):
    """The pair table joins marginals + the scalar N via broadcast;
    the only wide joins are the doc-keyed self-join (equi) and the
    aggregations. No cartesian anywhere despite the crossJoin(N):
    a broadcast 1-row side plans as BroadcastNestedLoop at worst —
    assert it is exactly the 1-row N side if present."""
    from ontoemma_spark.operators.graph import entity_cooccurrence_pmi

    m = spark.range(2000).select(
        (F.col("id") % 100).alias("doc_id"),
        F.concat(F.lit("e"), (F.col("id") % 23).cast("string")).alias("entity"),
    )
    out = entity_cooccurrence_pmi(m, max_per_doc=8, min_pair_count=2)
    plan = _plan(out)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan  # only the 1-row N
    assert "BroadcastHashJoin" in plan, plan  # marginals


def test_anchor_profile_counts_before_window(spark):
    """The top-k window must run AFTER the (dst, token) aggregation —
    windowing the raw exploded link-token stream would sort the full
    link table per dst. Assert the plan has a partial hash aggregate
    and exactly one window, and the window's child is the aggregate
    side (no window directly over the generator)."""
    from ontoemma_spark.operators.textstats import anchor_text_profile

    links = spark.range(500).select(
        F.concat(F.lit("h"), (F.col("id") % 11).cast("string")).alias("dst_host"),
        F.lit("alpha beta gamma").alias("anchor_text"),
    )
    plan = _plan(anchor_text_profile(links))
    assert plan.count("Window [") == 1, plan
    assert "partial_count" in plan, plan
    gen_pos = plan.find("Generate")
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window [")
    # executed plans print top-down: Window above the aggregate, which
    # is above the explode Generate
    assert win_pos < agg_pos < gen_pos, plan
    # bonus shape Spark gives row_number()<=k: a PARTIAL WindowGroupLimit
    # below the exchange — the per-dst top-k truncates map-side too
    assert "WindowGroupLimit" in plan, plan


def test_bloom_gated_dedup_fresh_branch_skips_corpus_join(spark):
    """The union's fresh branch must contain NO join against the corpus
    key table — only the maybe_seen branch pays the exact confirm. The
    plan therefore has exactly one join keyed on the dedup key column;
    everything else is the (broadcastable) bloom word-table join."""
    from ontoemma_spark.operators.dedup import bloom_gated_dedup

    key = F.concat(F.lit("k"), F.col("id").cast("string")).alias("key")
    corpus = spark.range(100).select(key)
    batch = spark.range(50).select(F.col("id").alias("doc_id"), key)
    plan = _plan(bloom_gated_dedup(batch, corpus))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    # joins keyed on the string dedup key: exactly the ONE confirm join
    # (word_idx joins are bigint-keyed and don't mention [key)
    n_key_joins = sum(
        1 for line in plan.splitlines()
        if "Join" in line and "key#" in line and "word_idx" not in line
    )
    assert n_key_joins == 1, plan


def test_canonicalize_predicates_is_narrow(spark):
    """Predicate canonicalization is per-row (literal map lookups +
    regexp) — NO exchange, no join, no Python eval may appear."""
    from ontoemma_spark.operators.graph import canonicalize_predicates

    t = spark.range(1000).select(
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("subj"),
        F.concat(F.lit("rel "), (F.col("id") % 3).cast("string")).alias("pred"),
        F.concat(F.lit("o"), (F.col("id") % 7).cast("string")).alias("obj"),
    )
    plan = _plan(canonicalize_predicates(t))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_upsert_edges_single_full_outer_join_no_window(spark):
    """The incremental merge is ONE full-outer equi join — never a
    union-regroup over the standing table's history, never a window."""
    from ontoemma_spark.operators.graph import upsert_edges

    def side(n):
        return spark.range(n).select(
            F.concat(F.lit("s"), (F.col("id") % 11).cast("string")).alias("subj"),
            F.lit("is_a").alias("pred"),
            F.concat(F.lit("o"), (F.col("id") % 13).cast("string")).alias("obj"),
            (F.col("id") % 9 + 1).alias("support"),
            (F.col("id") % 5 + 1).alias("n_pages"),
            F.lit("2024-01-01").cast("date").alias("first_seen"),
            F.lit("2024-02-01").cast("date").alias("last_seen"),
        ).groupBy("subj", "pred", "obj").agg(
            F.sum("support").alias("support"),
            F.sum("n_pages").alias("n_pages"),
            F.min("first_seen").alias("first_seen"),
            F.max("last_seen").alias("last_seen"),
        )

    plan = _plan(upsert_edges(side(1000), side(300)))
    assert plan.count("FullOuter") == 1, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_hits_round_is_two_equi_joins_partial_aggs(spark):
    """One HITS round = hubs⋈edges + map-side-combinable sum for
    authorities, then the mirror pair — equi joins only, partial
    aggregation present, no window, no cartesian."""
    from ontoemma_spark.operators.graph import hits

    e = spark.range(2000).select(
        F.concat(F.lit("c"), (F.col("id") % 40).cast("string")).alias("src"),
        F.concat(F.lit("s"), (F.col("id") % 60).cast("string")).alias("dst"),
    )
    df = hits(e, iterations=2)
    # the returned table is checkpointed (composed DAG already ran);
    # assert on the shape of a single un-checkpointed round instead
    from pyspark import StorageLevel

    ed = e.distinct()
    nodes = (
        ed.select(F.col("src").alias("node"))
        .union(ed.select(F.col("dst").alias("node")))
        .distinct()
    )
    hubs = nodes.withColumn("hub", F.lit(1.0))
    a = (
        ed.join(hubs, ed["src"] == hubs["node"])
        .groupBy("dst").agg(F.sum("hub").alias("s"))
    )
    auths = nodes.join(a, nodes["node"] == a["dst"], "left").select(
        "node", F.coalesce(F.col("s"), F.lit(0.0)).alias("authority")
    )
    plan = _plan(auths)
    assert "partial" in plan.lower(), plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert df.count() > 0  # the operator itself executed fine


def test_label_propagation_round_no_window_partial_agg(spark):
    """LPA's per-round argmax is min(struct(-cnt,label)) — a grouped
    aggregate (map-side combinable), NOT a row_number window."""
    from ontoemma_spark.operators.graph import label_propagation

    e = spark.range(2000).select(
        F.concat(F.lit("n"), (F.col("id") % 50).cast("string")).alias("src"),
        F.concat(F.lit("n"), ((F.col("id") + 7) % 50).cast("string")).alias("dst"),
    )
    out = label_propagation(e, iterations=1)
    # the result is checkpointed; re-derive one round for the plan
    ed = e.distinct()
    nodes = (
        ed.select(F.col("src").alias("node"))
        .union(ed.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("label", F.col("node"))
    votes = (
        ed.join(labels, ed["src"] == labels["node"])
        .groupBy("dst", "label").agg(F.count(F.lit(1)).alias("cnt"))
    )
    picked = votes.groupBy("dst").agg(
        F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("label"))).alias("top")
    )
    plan = _plan(picked)
    assert "Window" not in plan, plan
    assert "partial" in plan.lower(), plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert out.count() > 0


def test_hll_sketch_single_scan_partial_agg_no_window(spark):
    """HLL register build must be ONE scan of the source (the null-item
    sentinel rides the same groupBy — no second scan), partial-aggregate
    map-side, and use no window and no join; the merge+estimate over
    sketches is pure in-row (zero Exchange)."""
    from ontoemma_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    df = spark.range(2000).select(
        (F.col("id") % 11).alias("g"),
        F.concat(F.lit("u"), (F.col("id") % 500).cast("string")).alias("it"),
    )
    sk = hll_sketch(df, ["g"], "it")
    plan = _plan(sk)
    assert plan.lower().count("scan") <= 1, plan
    assert "partial" in plan.lower(), plan
    assert "Window" not in plan and "Join" not in plan, plan

    merged = sk.select("g", hll_merge("hll", "hll").alias("m2")).select(
        "g", hll_estimate("m2").alias("est")
    )
    mplan = _plan(merged)
    # nothing after the sketch's own aggregation adds an exchange
    assert mplan.count("Exchange") == plan.count("Exchange"), mplan


def test_triangle_stats_all_equi_joins(spark):
    """The wedge and closing joins must both be equi-joins (the whole
    point of the degree orientation) — no cartesian, no broadcast
    nested loop, no window."""
    from ontoemma_spark.operators.graph import triangle_stats

    df = spark.range(500).select(
        F.concat(F.lit("n"), (F.col("id") % 40).cast("string")).alias("src"),
        F.concat(F.lit("n"), ((F.col("id") * 3 + 1) % 40).cast("string")).alias("dst"),
    )
    plan = _plan(triangle_stats(df))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan, plan


def test_fuse_triples_one_partial_agg_no_window(spark):
    """The evidence rollup is ONE hash aggregate keyed (s,p,o) with
    map-side partials (count/count_distinct/min/max all combine); no
    window, no join, no shuffle beyond the single group-by exchange."""
    from ontoemma_spark.operators.fusion import fuse_triples

    trip = spark.range(2000).select(
        F.concat(F.lit("http://h"), (F.col("id") % 9).cast("string"),
                 F.lit(".com/p"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("s"), (F.col("id") % 40).cast("string")).alias("subj"),
        F.lit("born_in").alias("pred"),
        F.concat(F.lit("o"), (F.col("id") % 3).cast("string")).alias("obj"),
        (F.col("id") % 97).alias("ts"),
    )
    plan = _plan(fuse_triples(trip, ts_col="ts"))
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert "partial" in plan.lower(), plan


def test_resolve_functional_broadcast_reliability_max_struct(spark):
    """The host-reliability table enters via broadcast (it is
    host-cardinality, never shuffled against the claim set); the
    functional winner is a max-struct AGGREGATE, not a window; no
    cartesian."""
    from ontoemma_spark.operators.fusion import resolve_functional

    trip = spark.range(2000).select(
        F.concat(F.lit("http://h"), (F.col("id") % 9).cast("string"),
                 F.lit(".com/p"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("s"), (F.col("id") % 40).cast("string")).alias("subj"),
        F.lit("born_in").alias("pred"),
        F.concat(F.lit("o"), (F.col("id") % 3).cast("string")).alias("obj"),
    )
    rel = spark.range(9).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".com")).alias("host"),
        (F.col("id").cast("double") / 10).alias("reliability"),
    )
    plan = _plan(resolve_functional(trip, ["born_in"], reliability=rel))
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "max(" in _optimized(resolve_functional(
        trip, ["born_in"], reliability=rel
    )).lower(), "winner should be a max-struct aggregate"

"""Normalization (P1/P7/P8/P9) and training-data ops (M5/M6/F13)."""

from pyspark.sql import functions as F

from ontoemma_spark.datagen import synthetic_kb
from ontoemma_spark.operators.normalize import (
    derive_relation_classes,
    filter_has_definition_or_context,
    filter_named_entities,
    normalize_entities,
    sample_aliases,
)
from ontoemma_spark.operators.training import (
    definition_tfidf_cosine,
    easy_negatives,
    train_dev_test_split,
)

ENT_DDL = (
    "research_entity_id string, canonical_name string, aliases array<string>,"
    " definition string, source_urls array<string>, category string,"
    " other_contexts array<string>, additional_details map<string,array<string>>"
)


def test_normalize_entities(spark):
    ents = spark.createDataFrame(
        [("E:1", "  Heart-Attack_Now ", ["A-B_c "], " Def-X ", [], None, [" C_d-e"], None)],
        ENT_DDL,
    )
    r = normalize_entities(ents).collect()[0]
    assert r["canonical_name"] == "heartattack now"
    assert r["aliases"] == ["ab c"]  # trailing space trimmed, '-' dropped
    assert r["definition"] == "defx"
    assert r["other_contexts"] == ["c de"]


def test_derive_relation_classes(spark):
    ents, edges = synthetic_kb(spark, "KB", n_entities=6)
    out = derive_relation_classes(ents, edges)
    r = {x["research_entity_id"]: x for x in out.collect()}
    # entity 1 --is_a--> entity 0: parent class (is_a ∈ UMLS_PARENT_REL_LABELS)
    assert r["KB:KB:0000001"]["par_relations"] == [r["KB:KB:0000000"]["canonical_name"]]
    assert r["KB:KB:0000001"]["syn_relations"] == []


def test_p7_p8_p9_filters(spark):
    ents = spark.createDataFrame(
        [
            ("E:1", "E:1", ["x"], "", [], None, [], None),       # unnamed → P8 drops
            ("E:2", "name2", ["y"], "", [], None, [], None),     # no def/ctx → P7 drops
            ("E:3", "name3", [("a" * 200), "b", "c"], "def", [], None, [], None),
        ],
        ENT_DDL,
    )
    assert filter_named_entities(ents).count() == 2
    kept = filter_has_definition_or_context(ents)
    assert {r["research_entity_id"] for r in kept.collect()} == {"E:3"}
    sampled = sample_aliases(ents, max_aliases=1).filter("research_entity_id = 'E:3'")
    assert sampled.collect()[0]["aliases"] == ["b"]  # >128-char alias dropped first


def test_split_is_stratified_and_deterministic(spark):
    pairs = spark.createDataFrame(
        [(f"s{i}", f"t{i}", float(i % 2)) for i in range(200)],
        "s_id string, t_id string, label double",
    )
    a = train_dev_test_split(pairs)
    b = train_dev_test_split(pairs)
    assert a.collect() == b.collect()  # deterministic
    counts = {
        (r["label"], r["split"]): r["count"]
        for r in a.groupBy("label", "split").count().collect()
    }
    for label in (0.0, 1.0):
        total = sum(v for (l, _), v in counts.items() if l == label)
        assert abs(counts[(label, "train")] / total - 0.6) < 0.05
        assert abs(counts[(label, "dev")] / total - 0.2) < 0.05


def test_easy_negatives_exclude_gold(spark):
    pos = spark.createDataFrame([("s1", "t1"), ("s2", "t2")], "s_id string, t_id string")
    t_ents, _ = synthetic_kb(spark, "T", n_entities=10)
    negs = easy_negatives(pos, t_ents, per_positive=2)
    rows = negs.collect()
    assert len(rows) == 4
    got = {(r["s_id"], r["t_id"]) for r in rows}
    assert ("s1", "t1") not in got and ("s2", "t2") not in got


def test_easy_negatives_matches_python_spec(spark):
    """Pins the deterministic index-sample semantics against a pure-Python
    reimplementation of the same draw sequence (xxhash64 draws mod T over
    the sorted-dense-indexed target table)."""
    from pyspark.sql import functions as F

    pos = spark.createDataFrame(
        [("s1", "t03"), ("s2", "t07"), ("s3", "t01")], "s_id string, t_id string"
    )
    t = spark.createDataFrame(
        [(f"t{i:02d}",) for i in range(40)], "research_entity_id string"
    )
    per_positive = 2
    got = {(r["s_id"], r["t_id"]) for r in easy_negatives(pos, t, per_positive).collect()}

    # python spec: same hashes via Spark's xxhash64 evaluated as literals
    t_sorted = sorted(f"t{i:02d}" for i in range(40))
    t_count = len(t_sorted)
    m = min(t_count, 4 * per_positive + 16)
    gold = {("s1", "t03"), ("s2", "t07"), ("s3", "t01")}
    hash_rows = spark.range(1).select(
        *[
            F.abs(F.xxhash64(F.lit(s), F.lit(i))).alias(f"{s}_{i}")
            for s in ("s1", "s2", "s3")
            for i in range(m)
        ]
    ).collect()[0]
    expected = set()
    for s in ("s1", "s2", "s3"):
        seen, picks = {}, []
        for i in range(m):
            idx = hash_rows[f"{s}_{i}"] % t_count
            if idx not in seen:
                seen[idx] = i
        order = sorted(((i, t_sorted[idx]) for idx, i in seen.items()))
        for _, tid in order:
            if (s, tid) not in gold and len(picks) < per_positive:
                picks.append(tid)
        expected |= {(s, tid) for tid in picks}
    assert got == expected


def test_easy_negatives_full_coverage_on_tiny_kb(spark):
    """When T is tiny the cyclic-enumeration path guarantees k survivors
    for every source with ≥k non-gold targets — and never emits gold."""
    pos = spark.createDataFrame(
        [("s1", "t1"), ("s1", "t2"), ("s2", "t3")], "s_id string, t_id string"
    )
    t = spark.createDataFrame([(f"t{i}",) for i in range(5)], "research_entity_id string")
    rows = easy_negatives(pos, t, per_positive=3).collect()
    by_s = {}
    for r in rows:
        by_s.setdefault(r["s_id"], set()).add(r["t_id"])
    assert len(by_s["s1"]) == 3 and by_s["s1"].isdisjoint({"t1", "t2"})
    assert len(by_s["s2"]) == 3 and "t3" not in by_s["s2"]


def test_definition_tfidf_cosine(spark):
    s = spark.createDataFrame(
        [("S:1", "a", ["a"], "cardiac muscle necrosis", [], None, [], None),
         ("S:2", "b", ["b"], "", [], None, [], None)],
        ENT_DDL,
    )
    t = spark.createDataFrame(
        [("T:1", "c", ["c"], "cardiac muscle necrosis", [], None, [], None),
         ("T:2", "d", ["d"], "unrelated words here", [], None, [], None)],
        ENT_DDL,
    )
    pairs = spark.createDataFrame(
        [("S:1", "T:1"), ("S:1", "T:2"), ("S:2", "T:1")], "s_id string, t_id string"
    )
    out = {(r["s_id"], r["t_id"]): r["def_tfidf_cosine"]
           for r in definition_tfidf_cosine(s, t, pairs).collect()}
    assert abs(out[("S:1", "T:1")] - 1.0) < 1e-9   # identical definitions
    assert out[("S:1", "T:2")] == 0.0              # disjoint tokens
    assert out[("S:2", "T:1")] == 0.0              # empty definition side

"""run_ontoemma CLI analog: format dispatch by extension, model types
lr/nn/none, strategies incl. faithful modh-exact, gold evaluation —
the surface a reference user drives (run_ontoemma.py:12-100)."""

import json

import pytest
from pyspark.sql import functions as F

from ontoemma_spark import datagen
from ontoemma_spark.cli import load_kb_any, load_model, run_align
from ontoemma_spark.sources.kb_json import dump_kb_json
from ontoemma_spark.sources.alignment import write_alignment_tsv


@pytest.fixture(scope="module")
def kb_files(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_kbs")
    s_ents, s_edges = datagen.synthetic_kb(spark, "S", n_entities=80, id_offset=0)
    t_ents, t_edges = datagen.synthetic_kb(spark, "T", n_entities=80, id_offset=30)
    src, tgt = str(d / "source.json"), str(d / "target.json")
    dump_kb_json(s_ents, s_edges, "S", src)
    dump_kb_json(t_ents, t_edges, "T", tgt)
    gold = datagen.gold_alignment(spark, "S", "T", 80, 30, 80)
    gold_path = str(d / "gold.tsv")
    write_alignment_tsv(gold.withColumn("score", F.lit(1.0)), gold_path)
    return src, tgt, gold_path, str(d)


def test_cli_align_lr_with_gold_eval(spark, kb_files):
    src, tgt, gold, d = kb_files
    out = f"{d}/out_lr.tsv"
    alignment, metrics = run_align(
        spark, src, tgt, output=out, gold=gold, model_type="lr"
    )
    assert metrics["alignments"] > 0
    # reference micro-fixture thresholds (tests/test_ontoemma.py:69-71)
    assert metrics["precision"] >= 0.8
    assert metrics["recall"] >= 0.6
    assert metrics["f1"] >= 0.7
    # the written TSV reloads to the same pair set
    from ontoemma_spark.sources.alignment import load_alignment_tsv

    back = load_alignment_tsv(spark, out)
    assert back.count() == alignment.count()


def test_cli_align_nn_default_weights(spark, kb_files):
    src, tgt, gold, d = kb_files
    _, metrics = run_align(spark, src, tgt, gold=gold, model_type="nn")
    # NN smoke contract (reference tests/test_ontoemma.py:38-40: P/R/F1
    # just have to exist); our trained MLP should do far better than 0
    assert metrics["f1"] > 0.5


def test_cli_align_none_and_rdf_output(spark, kb_files):
    src, tgt, gold, d = kb_files
    out = f"{d}/out.rdf"
    alignment, metrics = run_align(
        spark, src, tgt, output=out, gold=gold, model_type="none"
    )
    assert metrics["alignments"] > 0
    from ontoemma_spark.sources.owl import load_alignment_rdf

    back = load_alignment_rdf(spark, out)
    assert back.count() == alignment.count()


def test_cli_modh_exact_strategy(spark, kb_files):
    src, tgt, gold, d = kb_files
    _, metrics = run_align(
        spark, src, tgt, gold=gold, model_type="lr", strategy="modh-exact"
    )
    # 1:1 assignment over an overlapping-KB fixture still recovers gold
    assert metrics["f1"] >= 0.7


def test_cli_model_json_roundtrip(spark, kb_files, tmp_path):
    from ontoemma_spark.operators.nn_weights import default_nn_model
    from ontoemma_spark.operators.scoring import DEFAULT_LR_MODEL

    lr_path = str(tmp_path / "lr.json")
    with open(lr_path, "w") as f:
        json.dump(DEFAULT_LR_MODEL.to_dict(), f)
    m = load_model("lr", lr_path)
    assert m.weights == DEFAULT_LR_MODEL.weights

    nn_path = str(tmp_path / "nn.json")
    with open(nn_path, "w") as f:
        json.dump(default_nn_model().to_dict(), f)
    m2 = load_model("nn", nn_path)
    assert m2.feature_names == default_nn_model().feature_names


def test_load_model_siamese_archive(tmp_path):
    """-p siamese -m model.tar.gz loads a reference-format checkpoint
    through load_allennlp_archive (numpy forward, no torch) and scores
    identically to the source weights."""
    import tarfile

    import numpy as np

    from ontoemma_spark.operators.features import FEATURE_NAMES
    from ontoemma_spark.operators.siamese import SiameseScorer

    src = SiameseScorer.seeded(FEATURE_NAMES, seed=11)
    npz = tmp_path / "weights.npz"
    np.savez(npz, **{k: np.asarray(v, dtype=np.float64)
                     for k, v in src.to_allennlp_state().items()})
    tgz = tmp_path / "model.tar.gz"
    with tarfile.open(tgz, "w:gz") as tar:
        tar.add(npz, arcname="weights.npz")
    m = load_model("siamese", str(tgz))
    eng = np.zeros((1, len(FEATURE_NAMES)))
    a = src.forward(eng, ["heart"], ["heart"], [[]], [[]], ["organ"], ["organ"])
    b = m.forward(eng, ["heart"], ["heart"], [[]], [[]], ["organ"], ["organ"])
    assert np.allclose(a, b, atol=0)


def test_cli_kb_parquet_dispatch(spark, kb_files, tmp_path):
    s_ents, _ = datagen.synthetic_kb(spark, "S", n_entities=20)
    p = str(tmp_path / "kb_parquet")
    s_ents.write.parquet(p)
    assert load_kb_any(spark, p).count() == 20


def test_cli_rejects_unknown_formats(spark):
    with pytest.raises(ValueError, match="unrecognized KB format"):
        load_kb_any(spark, "/tmp/kb.xyz")
    with pytest.raises(ValueError, match="unknown model type"):
        load_model("torch", None)


@pytest.fixture(scope="module")
def training_jsonl(spark, tmp_path_factory):
    """S10 training file: gold positives + hard negatives from the
    candidate ranking, entities embedded as structs."""
    from ontoemma_spark.operators.blocking import candidate_pairs, entity_tokens
    from ontoemma_spark.operators.evaluate import hard_negatives
    from ontoemma_spark.sources.alignment import write_training_jsonlines

    d = tmp_path_factory.mktemp("cli_train")
    s_ents, _ = datagen.synthetic_kb(spark, "S", n_entities=60, id_offset=0)
    t_ents, _ = datagen.synthetic_kb(spark, "T", n_entities=60, id_offset=20)
    gold = datagen.gold_alignment(spark, "S", "T", 60, 20, 60).select("s_id", "t_id")
    cands = candidate_pairs(entity_tokens(s_ents), entity_tokens(t_ents), 60, 60)
    pos = cands.join(gold, ["s_id", "t_id"], "left_semi").select("s_id", "t_id").withColumn(
        "label", F.lit(1.0))
    neg = hard_negatives(cands, gold, per_source=1).select("s_id", "t_id").withColumn(
        "label", F.lit(0.0))
    pairs = pos.unionByName(neg)
    s_struct = s_ents.select(
        F.col("research_entity_id").alias("s_id"),
        F.struct(*s_ents.columns).alias("source_ent"))
    t_struct = t_ents.select(
        F.col("research_entity_id").alias("t_id"),
        F.struct(*t_ents.columns).alias("target_ent"))
    enriched = pairs.join(s_struct, "s_id").join(t_struct, "t_id")
    path = str(d / "train_jsonl")
    write_training_jsonlines(enriched.select("label", "source_ent", "target_ent"), path)
    return path, str(d)


def test_cli_train_lr_and_use_model(spark, training_jsonl, kb_files):
    from ontoemma_spark.cli import run_train

    train_path, d = training_jsonl
    model_out = f"{d}/lr_model.json"
    model, metrics = run_train(
        spark, train_path, model_type="lr", model_out=model_out,
        eval_path=train_path)
    assert metrics["trained_on"] > 0
    # separable synthetic features: train-set F1 should be high
    assert metrics["f1"] >= 0.8, metrics
    # the saved weights drive the align CLI end-to-end
    src, tgt, gold, _ = kb_files
    _, am = run_align(spark, src, tgt, gold=gold, model_type="lr",
                      model_path=model_out)
    assert am["f1"] >= 0.7, am


def test_cli_train_nn(spark, training_jsonl):
    from ontoemma_spark.cli import run_train

    train_path, d = training_jsonl
    model, metrics = run_train(
        spark, train_path, model_type="nn", model_out=f"{d}/nn_model.json",
        eval_path=train_path)
    assert metrics["f1"] >= 0.8, metrics


def test_cli_extract_training_data_end_to_end(spark, tmp_path):
    """Entry point 3 (extract_training_data_from_umls analog): RRF in →
    per-KB JSON dumps + mappings TSV + train/dev/test jsonlines out, and
    the produced training file actually trains a model."""
    from ontoemma_spark.cli import run_extract_training_data, run_train

    def _write_rrf(path, rows):
        with open(path, "w") as f:
            for r in rows:
                f.write("|".join(r) + "|\n")

    conso = []
    # 25 concepts: enough that each concept's unique number token clears
    # the reference IDF floor ln(20) during the final align check
    for i in range(25):
        # every concept has one GO and one HPO atom → 25 cross-KB positives
        conso.append(["C%d" % i, "ENG", "P", "L%d" % i, "PF", "S%d" % i, "Y",
                      "A%d" % (2 * i), "", "", "", "GO", "PT", "G%d" % i,
                      "disease %d alpha" % i, "0", "N", ""])
        conso.append(["C%d" % i, "ENG", "P", "L%dh" % i, "PF", "S%dh" % i, "Y",
                      "A%d" % (2 * i + 1), "", "", "", "HPO", "PT", "H%d" % i,
                      "disease %d alpha variant" % i, "0", "N", ""])
    _write_rrf(tmp_path / "MRCONSO.RRF", conso)
    out = str(tmp_path / "out")

    metrics = run_extract_training_data(spark, str(tmp_path / "MRCONSO.RRF"), out)
    assert metrics["kbs"] == ["GO", "HPO"]
    assert metrics["positive_mappings"] == 25
    assert metrics["training_pairs"] > 25  # positives + negatives
    import os
    assert os.path.exists(f"{out}/kb_GO.json")
    assert os.path.exists(f"{out}/mappings.tsv")

    # the produced train file round-trips through the trainer...
    model_out = str(tmp_path / "umls_lr.json")
    _, tm = run_train(spark, f"{out}/train_jsonl", model_type="lr",
                      model_out=model_out, eval_path=f"{out}/train_jsonl")
    assert tm["trained_on"] > 0
    assert tm["f1"] > 0.5, tm

    # ...and the TRAINED model aligns the dumped KBs (extract → train →
    # align, the reference's full workflow; the default weights score
    # these suffix-variant names below any threshold — model quality,
    # not plumbing)
    _, am = run_align(spark, f"{out}/kb_GO.json", f"{out}/kb_HPO.json",
                      model_type="lr", model_path=model_out, threshold=0.5)
    assert am["alignments"] > 0


def test_cli_empty_kb_aligns_to_zero(spark, tmp_path):
    """Empty-KB JSON (entities: []) infers as array<string> — the loader
    must return empty typed frames, and align must yield 0 alignments in
    both directions rather than crash."""
    s_ents, s_edges = datagen.synthetic_kb(spark, "S", n_entities=20)
    dump_kb_json(s_ents, s_edges, "S", str(tmp_path / "s.json"))
    dump_kb_json(s_ents.limit(0), s_edges.limit(0), "E", str(tmp_path / "e.json"))
    _, m1 = run_align(spark, str(tmp_path / "s.json"), str(tmp_path / "e.json"),
                      model_type="lr")
    _, m2 = run_align(spark, str(tmp_path / "e.json"), str(tmp_path / "s.json"),
                      model_type="nn")
    assert m1["alignments"] == 0 and m2["alignments"] == 0


def test_run_align_siamese_model(spark, tmp_path):
    """-p siamese is a working CLI path: seeded siamese scorer over the
    JSON KBs (the from_allennlp_state blob path is covered in
    tests/test_siamese.py)."""
    import json

    from ontoemma_spark.cli import run_align
    from ontoemma_spark.datagen import synthetic_kb
    from ontoemma_spark.sources.kb_json import dump_kb_json

    # >= 20 entities: the IDF floor ln(20) needs N/df >= 19, so smaller
    # KBs produce zero blocking candidates by design (emma/constants.py:27)
    s_ents, s_edges = synthetic_kb(spark, "S", n_entities=30)
    t_ents, t_edges = synthetic_kb(spark, "T", n_entities=30, id_offset=10)
    s_path, t_path = str(tmp_path / "s.json"), str(tmp_path / "t.json")
    dump_kb_json(s_ents, s_edges, "S", s_path)
    dump_kb_json(t_ents, t_edges, "T", t_path)
    alignment, metrics = run_align(
        spark, s_path, t_path, model_type="siamese", strategy="all", threshold=0.0
    )
    assert metrics["alignments"] > 0
    for r in alignment.select("score").collect():
        assert 0.0 <= r["score"] <= 1.0

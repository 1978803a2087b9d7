"""Candidate-selection parity: the Spark blocking join must reproduce an
independent pure-Python implementation of the reference algorithm
(emma/CandidateSelection.py:46-149 semantics) on the synthetic KB."""

import math
import re
from collections import defaultdict

import pytest

from ontoemma_spark import config
from ontoemma_spark.datagen import synthetic_kb
from ontoemma_spark.functions.stopwords import ENGLISH_STOPWORDS
from ontoemma_spark.operators.blocking import candidate_pairs, entity_tokens, token_idf

TOKEN_RE = re.compile(r"[A-Za-z\d]+")


def py_tokenize(s):
    return [t for t in TOKEN_RE.findall(s) if t not in ENGLISH_STOPWORDS]


def py_normalize(s):
    return s.strip().lower().replace("-", "").replace("_", " ")


def py_ngrams(s, n):
    p = "\x00" * (n - 1) + s + "\x00" * (n - 1)
    return ["".join(c) for c in zip(*[p[i:] for i in range(n)])]


def py_entity_tokens(rows):
    """CandidateSelection._generate_token_map semantics."""
    out = {}
    for r in rows:
        toks = set()
        for a in r["aliases"]:
            toks.update(py_tokenize(a))
            toks.update(py_ngrams(py_normalize(a), config.NGRAM_SIZE))
        toks.update(py_tokenize(r["definition"]))
        out[r["research_entity_id"]] = toks
    return out


def py_candidates(s_toks, t_toks):
    """select_candidates over all sources: Σ t_idf of shared above-floor
    tokens present in both vocabularies."""
    s_inv, t_inv = defaultdict(set), defaultdict(set)
    for e, toks in s_toks.items():
        for t in toks:
            s_inv[t].add(e)
    for e, toks in t_toks.items():
        for t in toks:
            t_inv[t].add(e)
    shared = set(s_inv) & set(t_inv)
    s_idf = {t: math.log(len(s_toks) / len(s_inv[t]) + 1) for t in shared}
    t_idf = {t: math.log(len(t_toks) / len(t_inv[t]) + 1) for t in shared}
    scores = defaultdict(float)
    for tok in shared:
        if s_idf[tok] >= config.IDF_LIMIT and t_idf[tok] >= config.IDF_LIMIT:
            for se in s_inv[tok]:
                for te in t_inv[tok]:
                    scores[(se, te)] += t_idf[tok]
    return scores


@pytest.fixture(scope="module")
def kbs(spark):
    s_ents, _ = synthetic_kb(spark, "SRC", n_entities=60, id_offset=0)
    t_ents, _ = synthetic_kb(spark, "TGT", n_entities=50, id_offset=20)
    return s_ents, t_ents


def test_candidate_scores_match_python_reference(spark, kbs):
    s_ents, t_ents = kbs
    s_rows = [r.asDict() for r in s_ents.collect()]
    t_rows = [r.asDict() for r in t_ents.collect()]
    expected = py_candidates(py_entity_tokens(s_rows), py_entity_tokens(t_rows))

    got = candidate_pairs(
        entity_tokens(s_ents),
        entity_tokens(t_ents),
        s_count=len(s_rows),
        t_count=len(t_rows),
        top_k=10**6,  # no truncation for the parity check
    ).collect()
    got_scores = {(r["s_id"], r["t_id"]): r["cand_score"] for r in got}

    assert set(got_scores) == set(expected)
    for k, v in expected.items():
        assert abs(got_scores[k] - v) < 1e-9, k


def test_topk_and_rank_determinism(spark, kbs):
    s_ents, t_ents = kbs
    out = candidate_pairs(
        entity_tokens(s_ents), entity_tokens(t_ents), 60, 50, top_k=5
    )
    rows = out.collect()
    per_source = defaultdict(list)
    for r in rows:
        per_source[r["s_id"]].append(r)
    for recs in per_source.values():
        recs.sort(key=lambda r: r["rank"])
        assert len(recs) <= 5
        # score non-increasing with rank; tie broken by t_id asc
        for a, b in zip(recs, recs[1:]):
            assert a["cand_score"] > b["cand_score"] or (
                a["cand_score"] == b["cand_score"] and a["t_id"] < b["t_id"]
            )


def test_overlapping_concepts_are_top_ranked(spark, kbs):
    """Entities that name the same concept must rank each other #1."""
    s_ents, t_ents = kbs
    out = candidate_pairs(entity_tokens(s_ents), entity_tokens(t_ents), 60, 50, top_k=1)
    top1 = {r["s_id"]: r["t_id"] for r in out.collect()}
    hits = sum(
        1
        for c in range(20, 60)
        if top1.get(f"SRC:SRC:{c:07d}") == f"TGT:TGT:{c:07d}"
    )
    assert hits >= 36  # ≥90% of the 40 overlapping concepts


def test_entity_tokens_tolerates_null_ids_and_aliases(spark):
    """Null entity ids / null alias elements must not reach the posting
    lists: count() skips nulls, so a token contributed only by null-id
    entities had df=0 and ln(N/df+1) divided by zero under ANSI mode
    (regression, found by null probing through align)."""
    from ontoemma_spark.align import align

    ENT_DDL = (
        "research_entity_id string, canonical_name string, aliases array<string>,"
        " definition string, source_urls array<string>, category string,"
        " other_contexts array<string>, additional_details map<string,array<string>>"
    )
    dirty = spark.createDataFrame(
        [
            ("E1", None, None, None, None, None, None, None),
            ("E2", "real name alpha", ["ok", None, "x"], None, None, None, None, None),
            (None, "no id", ["y"], "d", [], None, [], None),
        ],
        ENT_DDL,
    )
    good = spark.createDataFrame(
        [(f"T{i}", f"real name alpha {i}", [f"alias {i}"], "def", [], None, [], None)
         for i in range(25)],
        ENT_DDL,
    )
    assert align(dirty, good).alignment.count() == 0  # no crash

    toks = entity_tokens(dirty)
    rows = toks.collect()
    assert all(r["entity_id"] is not None and r["token"] is not None for r in rows)

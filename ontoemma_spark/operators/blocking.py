"""Candidate selection as a distributed blocking join.

Re-expresses the reference's inverted-index candidate selector
(emma/CandidateSelection.py:14-149) as DataFrame ops:

  _generate_token_map (:46-88)  → entity_tokens(): exploded (entity_id, token)
  _build_map vocab ∩ (:105-117) → semi-joins both ways on token
  get_idf (:119-127)            → groupBy(token).countDistinct + log(N/df+1)
  select_candidates (:130-149)  → IDF-filtered equi-join on token +
                                  groupBy(s,t).sum(t_idf) + top-K window

Scale notes (100 TB design):
  * The token join is the skew-critical shuffle. The IDF floor
    (constants IDF_LIMIT, ln 20) semantically bounds fan-out: a token
    passing the filter appears in ≤ N/19 entities. Residual skew is
    handled by AQE skew-join; for pathological head tokens
    `salted_token_join` replicates the build side over NUM_SALTS salts.
  * KB sides of rehydration joins are broadcast (KBs ≤ 10^6 rows vs
    10^12 mentions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ontoemma_spark import config
from ontoemma_spark.functions.text import char_ngrams, idf, normalize_string, tokenize


def entity_tokens(
    entities: DataFrame,
    id_col: str = "research_entity_id",
    aliases_col: str = "aliases",
    definition_col: str = "definition",
    ngram_size: int = config.NGRAM_SIZE,
    ngram_pad: str = "\x00",
) -> DataFrame:
    """Distinct (entity_id, token) pairs per CandidateSelection.py:46-88:
    word tokens of every alias ∪ char-n-grams of normalize_string(alias)
    ∪ word tokens of the definition.

    Null guards matter: concat(NULL, ...) is NULL, which would silently
    emit ZERO tokens for an entity with a null definition or alias list
    — dropping it from candidate selection entirely."""
    alias = F.coalesce(F.col(aliases_col), F.array().cast("array<string>"))
    word_toks = F.flatten(F.transform(alias, lambda a: tokenize(a)))
    gram_toks = F.flatten(
        F.transform(alias, lambda a: char_ngrams(normalize_string(a), ngram_size, pad=ngram_pad))
    )
    def_toks = tokenize(F.coalesce(F.col(definition_col), F.lit("")))
    return (
        entities.select(
            F.col(id_col).alias("entity_id"),
            F.array_distinct(F.concat(word_toks, gram_toks, def_toks)).alias("tokens"),
        )
        .select("entity_id", F.explode("tokens").alias("token"))
        # a NULL entity id contributes tokens that count() then skips,
        # producing df=0 groups and a divide-by-zero in ln(N/df + 1)
        # (found by null probing). Invalid-id entities are the
        # validate_entities quarantine's job; here they are simply
        # excluded from the posting lists. Null tokens (null alias
        # elements) are dropped for the same reason.
        .filter(F.col("entity_id").isNotNull() & F.col("token").isNotNull())
    )


def token_idf(tokens: DataFrame, corpus_size: int) -> DataFrame:
    """(token, df, idf) with idf = ln(N/df + 1) (string_utils.py:17-24,
    applied at CandidateSelection.py:119-127). Input must be distinct
    (entity_id, token) pairs, so count == countDistinct."""
    return tokens.groupBy("token").agg(F.count("entity_id").alias("df")).select(
        "token", "df", idf(corpus_size, "df").alias("idf")
    )


def shared_vocabulary(s_idf: DataFrame, t_idf: DataFrame) -> DataFrame:
    """Tokens present in BOTH KBs with both idfs
    (CandidateSelection.py:105-117) — an inner join rather than two
    semi-joins so downstream reads both idf columns in one pass."""
    return s_idf.select("token", F.col("idf").alias("s_idf")).join(
        t_idf.select("token", F.col("idf").alias("t_idf")), "token"
    )


def candidate_pairs(
    s_tokens: DataFrame,
    t_tokens: DataFrame,
    s_count: int,
    t_count: int,
    idf_limit: float = config.IDF_LIMIT,
    top_k: int = config.KEEP_TOP_K_CANDIDATES,
    num_salts: int | None = None,
) -> DataFrame:
    """The blocking join (CandidateSelection.py:130-149 select_candidates,
    vectorized over ALL source entities at once).

    Returns (s_id, t_id, cand_score, rank) with cand_score = Σ t_idf over
    shared above-floor tokens and rank ∈ [1, top_k] ordered by score desc
    (t_id tiebreak — the reference relies on Python sort stability;
    an explicit tiebreak makes the distributed result deterministic).

    Physical strategy, benchmarked at sf0.1 (25M-pair fan-out, local[32]):
      * plain shuffle equi-join on token + two-phase hash agg: ~21-24s
      * salted join (s salted, t replicated ×16): ~32s
      * broadcast t-index + pre-partition by s_id (zero-exchange agg
        and window): ~33-36s
    The shuffle join wins because the dominating cost is the 23M-group
    hash aggregation, which Spark balances best across its own exchange;
    AQE's skew-join handles residual token skew. num_salts opts into
    explicit salting for pathological head tokens (both-sides-big regime
    where AQE cannot split a single join key).
    """
    vocab = shared_vocabulary(
        token_idf(s_tokens, s_count), token_idf(t_tokens, t_count)
    ).filter((F.col("s_idf") >= idf_limit) & (F.col("t_idf") >= idf_limit))

    s = s_tokens.withColumnRenamed("entity_id", "s_id")
    t = t_tokens.withColumnRenamed("entity_id", "t_id")

    # vocab is tiny after the IDF floor → broadcast it into both probes;
    # the s⋈t exchange on token is the one real shuffle.
    s_keyed = s.join(F.broadcast(vocab.select("token", "t_idf")), "token")
    if num_salts and num_salts > 1:
        s_keyed = s_keyed.withColumn(
            "salt", F.pmod(F.xxhash64(F.col("s_id")), F.lit(num_salts))
        )
        t_keyed = t.withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
        )
        joined = s_keyed.join(t_keyed, ["token", "salt"]).drop("salt")
    else:
        joined = s_keyed.join(t, "token")
    pairs = joined.groupBy("s_id", "t_id").agg(F.sum("t_idf").alias("cand_score"))
    w = Window.partitionBy("s_id").orderBy(F.desc("cand_score"), F.asc("t_id"))
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= top_k)


def with_salt(df: DataFrame, key_col: str, num_salts: int = config.DEFAULT_NUM_SALTS) -> DataFrame:
    """Deterministic salt for skewed keys: pmod(xxhash64(key), num_salts)."""
    return df.withColumn("salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_salts)))


def salted_token_join(
    probe: DataFrame,
    build: DataFrame,
    key: str = "token",
    num_salts: int = config.DEFAULT_NUM_SALTS,
) -> DataFrame:
    """Skew-safe equi-join: probe side gets a deterministic salt from its
    row identity; build side is replicated across all salts. Join key
    becomes (key, salt), splitting a hot key's rows over num_salts
    reducers. Use for head tokens/entities that survive the IDF floor.
    """
    probe_cols = probe.columns
    probe_s = probe.withColumn(
        "salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe_cols]), F.lit(num_salts))
    )
    build_s = build.withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)])))
    return probe_s.join(build_s, [key, "salt"]).drop("salt")


def candidate_pairs_broadcast_index(
    s_tokens: DataFrame,
    t_tokens: DataFrame,
    s_count: int,
    t_count: int,
    idf_limit: float = config.IDF_LIMIT,
    top_k: int = config.KEEP_TOP_K_CANDIDATES,
    max_index_rows: int = 2_000_000,
) -> DataFrame:
    """candidate_pairs with the pair fan-out eliminated: the target
    inverted index (token → postings) is broadcast as numpy arrays and
    each task computes its sources' top-K locally with a vectorized
    accumulator (np.add.at) — the 10^7-10^12-row (s, t) intermediate
    never exists, no shuffle beyond collecting per-source rows.

    This is the distributed version of the reference's own design
    (CandidateSelection.py:31-44 holds exactly this index in one dict);
    valid whenever the KB-side index fits in executor memory (KBs are
    ≤10^6 entities vs 10^12 mentions — the north-rule regime). That
    regime is ENFORCED: the index row count is checked first (cheap
    count job) and above max_index_rows the call falls back to the
    relational candidate_pairs plan, so a both-sides-big misuse cannot
    OOM the driver (tests/test_review_fixes.py pins fallback identity).

    Identical output to candidate_pairs: scores are sums over shared
    tokens accumulated in ascending token order (both engines sum ≤
    dozens of doubles; ties broken by t_id). Measured at sf0.1:
    26s (shuffle plan) → ~2s.
    """
    import numpy as np
    import pandas as pd

    vocab = shared_vocabulary(
        token_idf(s_tokens, s_count), token_idf(t_tokens, t_count)
    ).filter((F.col("s_idf") >= idf_limit) & (F.col("t_idf") >= idf_limit))

    t_index_df = (
        t_tokens.join(F.broadcast(vocab.select("token", "t_idf")), "token")
        .groupBy("token")
        .agg(
            F.array_sort(F.collect_list("entity_id")).alias("t_ids"),
            F.first("t_idf").alias("t_idf"),
        )
    )
    # The KB-small regime is ENFORCED, not assumed: measure the postings
    # entry count (Σ|t_ids| — the real memory footprint) with one cheap
    # aggregate job, then collect. The index is persisted across the
    # two actions (DataFrame actions do not share shuffle stages, so an
    # unpersisted guard would double the compute; with the persist the
    # collect reads the cache in ~0.2s). Above the cap, fall back to
    # the fully relational plan — the oversized index is never pulled
    # to the driver, it spills to executor disk at worst.
    from pyspark import StorageLevel

    t_index_df = t_index_df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        entries = t_index_df.select(F.sum(F.size("t_ids"))).first()[0] or 0
        if entries > max_index_rows:
            return candidate_pairs(
                s_tokens, t_tokens, s_count, t_count,
                idf_limit=idf_limit, top_k=top_k,
            )
        t_index_rows = t_index_df.collect()
    finally:
        t_index_df.unpersist()
    spark = s_tokens.sparkSession
    # integer-code target ids; postings as numpy arrays
    all_t = sorted({t for r in t_index_rows for t in r["t_ids"]})
    t_code = {t: i for i, t in enumerate(all_t)}
    postings = {
        r["token"]: (
            np.array([t_code[t] for t in r["t_ids"]], dtype=np.int64),
            float(r["t_idf"]),
        )
        for r in t_index_rows
    }
    bc = spark.sparkContext.broadcast((postings, np.array(all_t, dtype=object)))

    s_grouped = s_tokens.groupBy(F.col("entity_id").alias("s_id")).agg(
        F.array_sort(F.collect_set("token")).alias("tokens")
    )

    id_type = s_tokens.schema["entity_id"].dataType.simpleString()
    out_schema = f"s_id {id_type}, t_id {id_type}, cand_score double, rank int"

    def probe(batches):
        postings_l, t_names = bc.value
        n_t = len(t_names)
        acc = np.zeros(n_t, dtype=np.float64)
        for pdf in batches:
            out = {"s_id": [], "t_id": [], "cand_score": [], "rank": []}
            for s_id, toks in zip(pdf["s_id"], pdf["tokens"]):
                touched = []
                for tok in toks:  # ascending token order (array_sort)
                    p = postings_l.get(tok)
                    if p is None:
                        continue
                    ids, idf_v = p
                    np.add.at(acc, ids, idf_v)
                    touched.append(ids)
                if not touched:
                    continue
                cand = np.unique(np.concatenate(touched))
                scores = acc[cand]
                acc[cand] = 0.0
                # top_k by (-score, t_id asc); t_names sorted → code order == name order
                order = np.lexsort((cand, -scores))[:top_k]
                k = len(order)
                out["s_id"].extend([s_id] * k)
                out["t_id"].extend(t_names[cand[order]])
                out["cand_score"].extend(scores[order])
                out["rank"].extend(range(1, k + 1))
            yield pd.DataFrame(out)

    return s_grouped.mapInPandas(probe, schema=out_schema)

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
    ∪ word tokens of the definition."""
    alias = F.col(aliases_col)
    word_toks = F.flatten(F.transform(alias, lambda a: tokenize(a)))
    gram_toks = F.flatten(
        F.transform(alias, lambda a: char_ngrams(normalize_string(a), ngram_size, pad=ngram_pad))
    )
    def_toks = tokenize(definition_col)
    return (
        entities.select(
            F.col(id_col).alias("entity_id"),
            F.array_distinct(F.concat(word_toks, gram_toks, def_toks)).alias("tokens"),
        )
        .select("entity_id", F.explode("tokens").alias("token"))
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

"""Cross-page triple fusion — the knowledge-fusion stage that sits
between extraction and graph materialization in the KG-construction
pipeline (the reference stops at per-document alignment; a web-scale
corpus re-extracts the same fact from millions of pages and must
aggregate the evidence before the edge is materialized).

Three operators, in pipeline order:

  fuse_triples        per-(s,p,o) evidence rollup: support, distinct
                      hosts, noisy-or belief, optional first/last-seen
  host_reliability    truth-discovery over conflicting claims: iterate
                      (claim weight <- host reliability, winner <-
                      weighted vote, reliability <- smoothed agreement
                      with winners) — the TruthFinder / Knowledge
                      Vault ACCU-vote shape (Dong et al., VLDB 2014)
                      with a fixed, deterministic round count
  resolve_functional  for functional predicates (born_in, capital_of,
                      ...) keep ONE object per (subj, pred): the
                      argmax of (reliability-weighted vote, support,
                      obj) via a map-side-combinable max-struct — no
                      window, no shuffle beyond the one (subj, pred)
                      exchange

Scale shape (10^12 extracted triples): every step is a hash groupBy
with partial aggregation (count / count_distinct / sum / max-struct all
combine map-side); the host-reliability table is host-cardinality
(~10^7 rows ≪ corpus) and is broadcast back onto claims, never
shuffled against them. Claim canonicalization (distinct per host)
bounds any single page's influence: a host asserting a fact on a
million pages still casts one vote.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CLAIM_COLS = ("host", "subj", "pred", "obj")


def _with_host(triples: DataFrame, url_col: str, host_col: str | None) -> DataFrame:
    """Attach a lowercased host column. try_parse_url, NOT parse_url:
    Spark 4 parse_url THROWS on a malformed url — one garbage crawl
    row would kill the task; try_ returns NULL and claims() drops it."""
    if host_col is not None:
        return triples.withColumn("host", F.lower(F.col(host_col)))
    return triples.withColumn(
        "host", F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    )


def claims(
    triples: DataFrame, url_col: str = "url", host_col: str | None = None
) -> DataFrame:
    """Canonical one-vote-per-host claim set: distinct
    (host, subj, pred, obj). Dedup BEFORE any voting so a host's
    million near-identical pages count once — the standard
    source-level (not page-level) vote of the fusion literature, and
    the skew guard: the group-by key includes obj, so even a
    hyper-asserted fact stays map-side combinable."""
    return (
        _with_host(triples, url_col, host_col)
        .select(*_CLAIM_COLS)
        .where(F.col("host").isNotNull())
        .distinct()
    )


def fuse_triples(
    triples: DataFrame,
    url_col: str = "url",
    host_col: str | None = None,
    host_trust: float = 0.7,
    ts_col: str | None = None,
) -> DataFrame:
    """Per-(subj, pred, obj) evidence rollup: `support` extraction
    rows, `n_hosts` distinct asserting hosts, and a noisy-or `belief`
    1 - (1 - host_trust)^n_hosts — independent corroboration from k
    hosts under a flat per-host trust prior (the closed-form special
    case of Knowledge Vault's fusion layer; host_reliability below
    supplies per-host trust when the corpus disagrees with the
    prior). With ts_col, adds first_seen/last_seen temporal scope.

    ONE hash aggregate: count / count_distinct / min / max are all
    partial-agg combinable, so at 10^12 rows the exchange carries
    pre-combined per-partition states, not raw extractions."""
    t = _with_host(triples, url_col, host_col)
    aggs = [
        F.count(F.lit(1)).alias("support"),
        F.count_distinct("host").alias("n_hosts"),
    ]
    if ts_col is not None:
        aggs += [
            F.min(ts_col).alias("first_seen"),
            F.max(ts_col).alias("last_seen"),
        ]
    out = t.groupBy("subj", "pred", "obj").agg(*aggs)
    belief = 1.0 - F.pow(
        F.lit(1.0 - host_trust), F.col("n_hosts").cast("double")
    )
    return out.withColumn("belief", belief)


def host_reliability(
    triples: DataFrame,
    iterations: int = 2,
    prior: float = 0.8,
    url_col: str = "url",
    host_col: str | None = None,
) -> DataFrame:
    """Iterative truth discovery: estimate per-host reliability from
    agreement with the (reliability-weighted) majority object of each
    (subj, pred) claim group. Round structure, repeated a FIXED
    `iterations` times (deterministic; the oracle unrolls the same
    rounds):

      weight(s,p,o)  = sum of reliability over hosts claiming (s,p,o)
      winner(s,p)    = argmax_(o) (weight, obj)   [obj breaks ties]
      reliability(h) = (matched + 1) / (claims + 2)  [Laplace-smoothed
                       fraction of h's claims that name a winner]

    Round 0 seeds every host at `prior`, so round 1's vote is plain
    support-weighted majority. Returns (host, reliability, n_claims).

    Scale: claim set is distinct-per-host (see claims()); each round
    is two hash aggregates (one keyed (s,p,o), one keyed (s,p)
    max-struct — both partial-agg) plus one equi-join of claims
    against the winner table on (s,p,o). The reliability table is
    host-cardinality and re-enters the vote via a broadcastable join.
    Fixed small `iterations` (2 is the literature's knee) keeps the
    composed DAG one job — same lesson as pagerank's composed rounds;
    the final localCheckpoint materializes it while the claim cache
    (consumed 2x per round) is still live."""
    from pyspark import StorageLevel

    c = claims(triples, url_col, host_col).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n_claims = c.groupBy("host").agg(F.count(F.lit(1)).alias("n_claims"))
        rel = n_claims.withColumn("reliability", F.lit(float(prior)))
        for _ in range(iterations):
            weighted = (
                c.join(F.broadcast(rel.select("host", "reliability")), "host")
                .groupBy("subj", "pred", "obj")
                .agg(F.sum("reliability").alias("w"))
            )
            # argmax on the ROUNDED weight: the raw double sum's
            # cross-partition addition order wobbles the last ulp, so
            # mathematically tied objects would resolve by luck and the
            # obj tie-break would never engage; round(9) makes real
            # ties compare equal on every engine (twin rounds the same)
            winners = (
                weighted.groupBy("subj", "pred")
                .agg(
                    F.max(
                        F.struct(F.round(F.col("w"), 9).alias("w"), "obj")
                    ).alias("top")
                )
                .select("subj", "pred", F.col("top.obj").alias("obj"))
            )
            # null-SAFE match: a claim whose winning object is NULL
            # still agrees with the majority — a null-unsafe semi join
            # would deflate every host asserting it
            matched = (
                c.alias("cl")
                .join(
                    winners.alias("wn"),
                    F.col("cl.subj").eqNullSafe(F.col("wn.subj"))
                    & F.col("cl.pred").eqNullSafe(F.col("wn.pred"))
                    & F.col("cl.obj").eqNullSafe(F.col("wn.obj")),
                    "left_semi",
                )
                .groupBy("host")
                .agg(F.count(F.lit(1)).alias("matched"))
            )
            rel = (
                n_claims.join(matched, "host", "left")
                .select(
                    "host",
                    "n_claims",
                    (
                        (F.coalesce(F.col("matched"), F.lit(0)) + F.lit(1.0))
                        / (F.col("n_claims") + F.lit(2.0))
                    ).alias("reliability"),
                )
            )
        return rel.select("host", "reliability", "n_claims").localCheckpoint(
            eager=True
        )
    finally:
        c.unpersist()


def resolve_functional(
    triples: DataFrame,
    functional_preds: list[str],
    reliability: DataFrame | None = None,
    prior: float = 0.8,
    url_col: str = "url",
    host_col: str | None = None,
) -> DataFrame:
    """Conflict resolution for functional predicates: a subject has
    exactly one birthplace, so among conflicting objects keep the
    argmax of (reliability-weighted vote, support, obj) — obj last for
    a deterministic tie-break. Non-functional predicates pass through
    with their vote stats untouched (works_at legitimately fans out).

    `reliability` is host_reliability() output (broadcast onto the
    claim set — it is host-cardinality); absent, every host votes at
    `prior` and the vote degenerates to support-weighted majority.

    Returns (subj, pred, obj, support, weight). The winner pick is a
    max-struct aggregate keyed (subj, pred) — map-side combinable, no
    window, so one exchange resolves 10^12 claims."""
    c = claims(triples, url_col, host_col)
    if reliability is not None:
        c = c.join(
            F.broadcast(reliability.select("host", "reliability")), "host", "left"
        ).withColumn(
            "reliability", F.coalesce(F.col("reliability"), F.lit(float(prior)))
        )
    else:
        c = c.withColumn("reliability", F.lit(float(prior)))
    from pyspark import StorageLevel

    # votes feeds BOTH union branches — persist so the distinct+join+
    # groupBy chain runs once, not twice (lazy result, caller owns
    # materialization; re-scan-audit convention)
    votes = c.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("support"),
        F.sum("reliability").alias("weight"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # null pred is NOT a functional predicate — isin() yields NULL for
    # it, and a bare where(fn)/where(~fn) pair silently deletes the row
    # from both branches
    fn = F.coalesce(
        F.col("pred").isin(list(functional_preds)), F.lit(False)
    )
    # argmax on the ROUNDED weight (see host_reliability: ulp-level
    # sum-order wobble must not pick the winner); original weight rides
    # along for the output
    resolved = (
        votes.where(fn)
        .groupBy("subj", "pred")
        .agg(
            F.max(
                F.struct(
                    F.round(F.col("weight"), 9).alias("wr"),
                    "support", "obj",
                    F.col("weight").alias("weight"),
                )
            ).alias("top")
        )
        .select(
            "subj",
            "pred",
            F.col("top.obj").alias("obj"),
            F.col("top.support").alias("support"),
            F.col("top.weight").alias("weight"),
        )
    )
    return votes.where(~fn).select(
        "subj", "pred", "obj", "support", "weight"
    ).unionByName(resolved)

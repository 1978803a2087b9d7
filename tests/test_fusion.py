"""Triple fusion: evidence rollup, truth discovery, functional
conflict resolution (operators/fusion.py). Hand-computed fixtures —
the reliability values below are worked out on paper in the
host_reliability test docstring."""

import pytest

from ontoemma_spark.operators.fusion import (
    claims,
    fuse_triples,
    host_reliability,
    resolve_functional,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fuse_triples_rollup_and_belief(spark):
    """3 pages on 2 hosts assert (a, born_in, x): support=3, n_hosts=2,
    belief = 1 - 0.3^2. Page-level duplication inflates support but
    NOT n_hosts. Temporal scope = min/max ts."""
    rows = [
        ("http://h1.com/p1", "a", "born_in", "x", 10),
        ("http://h1.com/p2", "a", "born_in", "x", 30),
        ("http://H2.com/p9", "a", "born_in", "x", 20),
        ("http://h2.com/p3", "b", "born_in", "y", 5),
    ]
    df = spark.createDataFrame(rows, ["url", "subj", "pred", "obj", "ts"])
    got = {
        (r["subj"], r["pred"], r["obj"]): r
        for r in fuse_triples(df, host_trust=0.7, ts_col="ts").collect()
    }
    ax = got[("a", "born_in", "x")]
    assert ax["support"] == 3 and ax["n_hosts"] == 2
    assert abs(ax["belief"] - (1 - 0.3**2)) < 1e-12
    assert ax["first_seen"] == 10 and ax["last_seen"] == 30
    by = got[("b", "born_in", "y")]
    assert by["support"] == 1 and by["n_hosts"] == 1
    assert abs(by["belief"] - 0.7) < 1e-12


def test_claims_one_vote_per_host(spark):
    """A host asserting the same fact on 1000 pages casts ONE claim;
    null-host rows (unparseable url) are dropped."""
    rows = [(f"http://spam.com/{i}", "a", "p", "x") for i in range(50)]
    rows += [("http://other.com/1", "a", "p", "x"), ("%%%", "a", "p", "x")]
    df = spark.createDataFrame(rows, ["url", "subj", "pred", "obj"])
    got = _rows(claims(df))
    assert got == [("other.com", "a", "p", "x"), ("spam.com", "a", "p", "x")]


def test_host_reliability_two_rounds_hand_computed(spark):
    """Claims: (s1,born_in): h1->a, h2->a, h3->b; (s2,born_in):
    h1->c, h3->c.
    Round 1 (all rel=0.8): winners a (w 1.6 > .8) and c. Matched:
    h1 2/2 -> (2+1)/(2+2)=.75; h2 1/1 -> 2/3; h3 1/2 -> .5.
    Round 2: s1: a = .75+2/3 > b = .5 -> same winners, so
    reliabilities are the round-1 fixpoint."""
    rows = [
        ("http://h1.com/", "s1", "born_in", "a"),
        ("http://h2.com/", "s1", "born_in", "a"),
        ("http://h3.com/", "s1", "born_in", "b"),
        ("http://h1.com/", "s2", "born_in", "c"),
        ("http://h3.com/", "s2", "born_in", "c"),
    ]
    df = spark.createDataFrame(rows, ["url", "subj", "pred", "obj"])
    got = {r["host"]: r for r in host_reliability(df, iterations=2).collect()}
    assert got["h1.com"]["n_claims"] == 2
    assert abs(got["h1.com"]["reliability"] - 0.75) < 1e-12
    assert abs(got["h2.com"]["reliability"] - 2 / 3) < 1e-12
    assert abs(got["h3.com"]["reliability"] - 0.5) < 1e-12


def test_resolve_functional_winner_and_passthrough(spark):
    """born_in is functional: the reliability-weighted majority object
    wins (2 low-trust hosts outvoted by 1 high-trust + 1 mid-trust is
    NOT the case here — weights .9 vs 1.0 — so 'x' with two .5 hosts
    wins over 'y' with one .9). works_at is not functional: both
    objects survive with their stats."""
    rows = [
        ("http://lo1.com/", "s", "born_in", "x"),
        ("http://lo2.com/", "s", "born_in", "x"),
        ("http://hi.com/", "s", "born_in", "y"),
        ("http://lo1.com/", "s", "works_at", "w1"),
        ("http://hi.com/", "s", "works_at", "w2"),
    ]
    df = spark.createDataFrame(rows, ["url", "subj", "pred", "obj"])
    rel = spark.createDataFrame(
        [("lo1.com", 0.5), ("lo2.com", 0.5), ("hi.com", 0.9)],
        ["host", "reliability"],
    )
    got = _rows(
        resolve_functional(df, ["born_in"], reliability=rel).select(
            "subj", "pred", "obj", "support"
        )
    )
    assert got == [
        ("s", "born_in", "x", 2),
        ("s", "works_at", "w1", 1),
        ("s", "works_at", "w2", 1),
    ]
    # without a reliability table the vote is support-majority at the
    # flat prior; hi.com's single claim loses to two prior-weight votes
    flat = _rows(
        resolve_functional(df, ["born_in"]).select("subj", "pred", "obj")
    )
    assert ("s", "born_in", "x") in flat
    # unknown hosts fall back to `prior`, not null: a reliability table
    # missing every host must reproduce the flat result
    empty_rel = spark.createDataFrame([("zzz.com", 0.1)], ["host", "reliability"])
    fallback = _rows(
        resolve_functional(df, ["born_in"], reliability=empty_rel, prior=0.8)
        .select("subj", "pred", "obj")
    )
    assert fallback == flat


def test_resolve_functional_obj_tiebreak(spark):
    """Exact weight+support tie -> max obj wins, deterministically."""
    rows = [
        ("http://h1.com/", "s", "born_in", "aa"),
        ("http://h2.com/", "s", "born_in", "zz"),
    ]
    df = spark.createDataFrame(rows, ["url", "subj", "pred", "obj"])
    got = _rows(resolve_functional(df, ["born_in"]).select("obj"))
    assert got == [("zz",)]


def test_host_reliability_flips_support_majority(spark):
    """The motivating case: 3 noisy hosts each assert the same wrong
    birthplace; 2 reliable hosts assert the right one, so plain
    support majority (3 vs 2) gets it wrong. On 5 background facts the
    noisy hosts emit UNCOORDINATED junk (each its own object), so the
    good pair's agreement wins those in round 1:
      round 1: good rel = (5 wins + 1 loss) -> (5+1)/(6+2) = 0.75,
               noisy rel = (1 win + 5 losses) -> (1+1)/(6+2) = 0.25
      round 2: contested vote right = 2*0.75 = 1.5 beats
               wrong = 3*0.25 = 0.75 — the weighted winner flips, and
               the post-flip reliability update (what the function
               returns) credits good hosts all 6 claims:
               good = (6+1)/(6+2) = 0.875, noisy = (0+1)/(6+2) = 0.125
    """
    rows = []
    for i in range(5):
        for g in (1, 2):
            rows.append((f"http://good{g}.com/", f"e{i}", "capital_of", f"k{i}"))
        for s in (1, 2, 3):
            rows.append((f"http://spam{s}.com/", f"e{i}", "capital_of", f"junk{s}"))
    for s in (1, 2, 3):
        rows.append((f"http://spam{s}.com/", "tgt", "born_in", "wrong"))
    for g in (1, 2):
        rows.append((f"http://good{g}.com/", "tgt", "born_in", "right"))
    df = spark.createDataFrame(rows, ["url", "subj", "pred", "obj"])

    # support-majority (no reliability) picks the spam answer
    flat = {
        (r["subj"], r["pred"]): r["obj"]
        for r in resolve_functional(df, ["born_in"]).collect()
    }
    assert flat[("tgt", "born_in")] == "wrong"

    rel = host_reliability(df, iterations=2)
    got_rel = {r["host"]: r["reliability"] for r in rel.collect()}
    assert abs(got_rel["good1.com"] - 0.875) < 1e-12
    assert abs(got_rel["spam2.com"] - 0.125) < 1e-12
    weighted = {
        (r["subj"], r["pred"]): r["obj"]
        for r in resolve_functional(
            df, ["born_in", "capital_of"], reliability=rel
        ).collect()
    }
    assert weighted[("tgt", "born_in")] == "right"
    assert weighted[("e3", "capital_of")] == "k3"


@pytest.mark.parametrize("trust", [0.5, 0.9])
def test_fuse_triples_belief_monotone_in_hosts(spark, trust):
    rows = [
        (f"http://h{i}.com/", "s", "p", "many") for i in range(4)
    ] + [("http://h0.com/", "s", "p", "one")]
    df = spark.createDataFrame(rows, ["url", "subj", "pred", "obj"])
    got = {r["obj"]: r["belief"] for r in fuse_triples(df, host_trust=trust).collect()}
    assert got["many"] > got["one"]
    assert abs(got["many"] - (1 - (1 - trust) ** 4)) < 1e-12
    assert abs(got["one"] - trust) < 1e-12


def test_null_pred_and_null_obj_semantics(spark):
    """Regressions from the r5 review: (1) a null-pred triple must pass
    through resolve_functional's non-functional branch, not vanish from
    both where(fn)/where(~fn); (2) a host whose claim names a NULL
    winning object must count as matched in host_reliability (null-safe
    winner join), not get its reliability deflated."""
    trip = spark.createDataFrame(
        [
            ("s1", None, "x", "http://h1.ex/p1"),
            ("s2", "born_in", None, "http://h1.ex/p2"),
            ("s2", "born_in", None, "http://h2.ex/p3"),
            ("s3", "works_at", "acme", "http://h2.ex/p4"),
        ],
        "subj string, pred string, obj string, url string",
    )
    out = {(r["subj"], r["pred"], r["obj"])
           for r in resolve_functional(trip, ["born_in"]).collect()}
    assert ("s1", None, "x") in out          # null pred kept (fan-out branch)
    assert ("s2", "born_in", None) in out    # null obj can win
    assert ("s3", "works_at", "acme") in out

    rel = {r["host"]: r["reliability"]
           for r in host_reliability(trip, iterations=1).collect()}
    # every claim of every host names its group's winner (each (s,p)
    # group is unanimous), so both hosts get (matched+1)/(n+2) with
    # matched == n_claims — including the NULL-obj winner for born_in
    assert abs(rel["h1.ex"] - (2 + 1) / (2 + 2)) < 1e-12
    assert abs(rel["h2.ex"] - (2 + 1) / (2 + 2)) < 1e-12

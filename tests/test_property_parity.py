"""Property-based parity: on random inputs, the Spark column
implementations must agree with independent pure-Python twins of the
reference semantics (tokenize, n-grams, jaccard, shingles, CC)."""

import re

from hypothesis import given, settings, strategies as st

from ontoemma_spark.functions.stopwords import ENGLISH_STOPWORDS
from ontoemma_spark.functions.text import char_ngrams, jaccard, normalize_string, tokenize

TEXTS = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)
TOKEN_RE = re.compile(r"[A-Za-z\d]+")


def py_tokenize(s):
    return [t for t in TOKEN_RE.findall(s) if t not in ENGLISH_STOPWORDS]


def py_normalize(s):
    return s.strip().lower().replace("-", "").replace("_", " ")


def py_ngrams(s, n):
    p = "\x00" * (n - 1) + s + "\x00" * (n - 1)
    return ["".join(c) for c in zip(*[p[i:] for i in range(n)])]


def py_jaccard(a, b):
    sa, sb = set(a), set(b)
    if sa and sb:
        return len(sa & sb) / len(sa | sb)
    return -1.0


@settings(max_examples=8, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=40))
def test_tokenize_matches_python(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = [r["v"] for r in df.select(tokenize("s").alias("v")).collect()]
    assert got == [py_tokenize(s) for s in strings]


@settings(max_examples=8, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=40))
def test_normalize_matches_python(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = [r["v"] for r in df.select(normalize_string("s").alias("v")).collect()]
    assert got == [py_normalize(s) for s in strings]


@settings(max_examples=6, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=25), st.integers(min_value=2, max_value=6))
def test_ngrams_match_python(spark, strings, n):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = [r["v"] for r in df.select(char_ngrams("s", n).alias("v")).collect()]
    assert got == [py_ngrams(s, n) for s in strings]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.text(alphabet="abcde", max_size=3), max_size=6),
            st.lists(st.text(alphabet="abcde", max_size=3), max_size=6),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_jaccard_matches_python(spark, pairs):
    # arrays treated as sets in the Spark impl → dedupe inputs for parity
    pairs = [(sorted(set(a)), sorted(set(b))) for a, b in pairs]
    df = spark.createDataFrame(pairs, "a array<string>, b array<string>")
    got = [r["v"] for r in df.select(jaccard("a", "b").alias("v")).collect()]
    exp = [py_jaccard(a, b) for a, b in pairs]
    for g, e in zip(got, exp):
        assert abs(g - e) < 1e-12


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)), min_size=1, max_size=60
    )
)
def test_connected_components_match_union_find(spark, edges):
    from ontoemma_spark.operators.components import connected_components

    edges = [(f"n{a:02d}", f"n{b:02d}") for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}

    # union-find twin
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for node in parent:
        groups.setdefault(find(node), set()).add(node)
    expected = {n: min(g) for g in groups.values() for n in g}
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),        # user_id
            st.integers(min_value=0, max_value=100_000),  # ts offset seconds
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=5_000),            # gap seconds
)
def test_sessionize_batch_matches_python(spark, events, gap):
    """Random (user, ts) streams incl. duplicate timestamps: the batch
    window-function sessionization must equal the closed-form twin."""
    import pandas as pd

    from ontoemma_spark.streaming.sessions import sessionize_batch, sessionize_py

    from datetime import datetime, timedelta

    base = datetime(2026, 1, 1)
    rows = [(u, base + timedelta(seconds=s)) for u, s in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    rows = [(u, pd.Timestamp(t)) for u, t in rows]
    got = sorted(
        (r["user_id"], pd.Timestamp(r["session_start"]),
         pd.Timestamp(r["session_end"]), r["n_events"])
        for r in sessionize_batch(df, gap_seconds=gap).collect()
    )
    expected = sorted(sessionize_py(rows, gap, include_open=True))
    assert got == expected

"""Deterministic HTML → text extraction (north-rule extract stage).

The per-row invariant (BASELINE.json input_hint) is: extracted text is a
pure, byte-identical function of the page html per url. Two
implementations of the SAME specification:

  * extract_text_py   — pure Python (the executable specification; used
                        by tests and the DuckDB oracle path)
  * extract_text_col  — native Spark column expression (regexp_replace
                        chain, JVM-side, whole-stage-codegen) — the
                        production path
  * extract_text_mapinpandas — Arrow-batched pandas variant, the pattern
                        for extractors that genuinely need Python libs

All regex patterns are restricted to constructs with identical semantics
in java.util.regex and Python re (explicit character classes, inline
(?is) flags, non-greedy quantifiers) so the three paths agree byte-
for-byte; tests/test_extract.py asserts it.

Reference anchor: the reference's only text machinery is
emma/utils/common.py:768-791 (from_text: sentence split + tokenize) and
clean_wiki_text (:44-52); it has no HTML extractor, so this stage is the
new web-scale front end mandated by the north rule.
"""

from __future__ import annotations

import html as _html
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Patterns shared verbatim between Python re and Java regex. Boilerplate
# blocks (head/script/style/nav/header/footer/aside/comments) are removed
# wholesale; remaining tags are stripped.
_P_BLOCKS = [
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?is)<head[^>]*>.*?</head>",
    r"(?is)<nav[^>]*>.*?</nav>",
    r"(?is)<header[^>]*>.*?</header>",
    r"(?is)<footer[^>]*>.*?</footer>",
    r"(?is)<aside[^>]*>.*?</aside>",
    r"(?s)<!--.*?-->",
]
_P_TAG = r"<[^>]*>"
_P_WS = r"[ \t\r\n\f]+"

# Entity map applied in fixed order (no full HTML5 entity table — the
# subset below is the deterministic specification).
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
]


def extract_text_py(html_bytes: bytes | None) -> str:
    """Executable specification of the extract invariant."""
    if html_bytes is None:
        return ""
    text = html_bytes.decode("utf-8", errors="replace")
    for pattern in _P_BLOCKS:
        text = re.sub(pattern, " ", text)
    text = re.sub(_P_TAG, " ", text)
    for ent, rep in _ENTITIES:
        text = text.replace(ent, rep)
    text = re.sub(_P_WS, " ", text).strip()
    return text


def extract_text_col(html_col) -> Column:
    """Same spec as native JVM expressions."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    # NOT F.decode(c, 'UTF-8'): under ANSI mode decode() THROWS on
    # malformed bytes, and Common-Crawl HTML is full of them — the whole
    # 10^12-page scan would die on the first bad page. cast-to-string +
    # make_valid_utf8 substitutes U+FFFD per maximal invalid subpart,
    # the same policy as the Python spec's errors="replace"
    # (parity pinned in tests/test_extract.py on invalid-byte inputs).
    text = F.make_valid_utf8(c.cast("string"))
    for pattern in _P_BLOCKS:
        text = F.regexp_replace(text, pattern, " ")
    text = F.regexp_replace(text, _P_TAG, " ")
    for ent, rep in _ENTITIES:
        text = F.replace(text, F.lit(ent), F.lit(rep))
    text = F.trim(F.regexp_replace(text, _P_WS, " "))
    return text


_WIKI_CRUFT_RE = r"\[\d+\]|\[citation needed\]"


def clean_wiki_text_py(text: str) -> str:
    """F14 (emma/utils/common.py:44-52): replace citation markers
    ([3], [citation needed]) with EQUAL-LENGTH spaces so character
    offsets into the original text stay valid — the length-preserving
    property is the point (mention spans index into this text)."""
    import re as _re

    return _re.sub(_WIKI_CRUFT_RE, lambda m: " " * len(m.group(0)), text)


def clean_wiki_text(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """F14 as an Arrow-batched transform (the replacement length depends
    on the match, which regexp_replace cannot express natively)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out[text_col] = out[text_col].map(
                lambda t: clean_wiki_text_py(t) if t is not None else None
            )
            yield out

    return pages.mapInPandas(batches, schema=pages.schema)


def extract_text_mapinpandas(pages: DataFrame) -> DataFrame:
    """Arrow-batched extraction (url, extracted_text). The pandas-UDF
    plumbing pattern for stages that need real Python libraries
    (trafilatura-class extractors) at scale: iterator form, per-batch
    vectorized, no per-row Spark round trips."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "extracted_text": pdf["html"].map(extract_text_py),
                }
            )

    return pages.select("url", "html").mapInPandas(
        batches, schema="url string, extracted_text string"
    )

"""ontoemma_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
allenai/ontoemma (reference read-only at /root/reference).

This is NOT a port: the reference is eager, single-process, row-oriented
Python (emma/OntoEmma.py); this package re-expresses its semantics as lazy
DataFrame plans optimized by Catalyst, with vectorized Arrow pandas UDFs
only where built-in column expressions cannot express the semantics.

Pipeline stages (SURVEY.md §7.1):
  extract  — pages (url, warc_ts, html, text, lang) → mentions/triples
  link     — blocking join (token/char-5gram inverted index + IDF) →
             feature scoring → alignment strategy
  canon    — hash-min connected components over the match graph
  graph    — node/edge table materialization, bucketed by entity hash
"""

__version__ = "0.1.0"

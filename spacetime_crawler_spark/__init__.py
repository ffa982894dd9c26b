"""spacetime_crawler_spark — a from-scratch PySpark-native reimplementation of
the Mondego/spacetime-crawler fetch-parse-extract loop as a distributed
URL-frontier + scheduler over Iceberg/parquet tables of Common-Crawl-style
pages, plus the analytics/report queries and large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Design notes (SURVEY.md is the blueprint):
- DataFrame/SQL first; Catalyst/AQE pick physical strategies.
- Python crosses the Arrow boundary only for canonicalize / link-extract /
  text-extract / the per-host politeness scheduler (pandas UDFs and
  applyInPandas) — never row-at-a-time Python.
- All schemas are explicit StructTypes, never inferred.
"""

__version__ = "0.1.0"

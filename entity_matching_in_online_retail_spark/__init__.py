"""entity_matching_in_online_retail_spark — a from-scratch, PySpark-native
entity-resolution engine with the query/data-processing capabilities of the
reference repo kylegilde/Entity-Matching-in-Online-Retail (a single-node
pandas/sklearn notebook pipeline), re-designed for Spark DataFrame/SQL/Catalyst
at Common-Crawl scale.

Pipeline: ingest/normalize -> blocking (normalized keys + MinHash/LSH, salted)
-> candidate pairs -> pairwise similarity features (Jaccard, Levenshtein,
Jaro-Winkler, TF-IDF cosine; batched Arrow/pandas UDFs, no per-row Python)
-> broadcast vectorized classifier -> threshold -> large-star/small-star
connected components -> entity clusters. Checkpointed per partition with
lineage + metrics; resumable.

Design notes vs the reference (see SURVEY.md; reference checkout is empty in
this sandbox — semantics come from BASELINE.json's north rule):
- reference: eager single-node pandas + scikit-learn, no optimizer, no plan.
- here: declarative DataFrame plans optimized by Catalyst/AQE; Python only in
  Arrow-batched pandas UDFs (Jaro-Winkler, TF-IDF cosine, NFKC, extraction).
"""

__version__ = "0.1.0"

"""hinbox_spark — a from-scratch PySpark-native knowledge-graph construction
engine with the query/data-processing capabilities of strickvl/hinbox.

Architecture (Spark-first, NOT a port of the reference's single-process
pipeline — see SURVEY.md):

    pages (url, warc_ts, html, text, lang)
      → stage 1: text extraction (pandas UDF, byte-identical per url to the
                 reference algorithm at scripts/get_miami_herald_articles.py:219-249)
      → stage 2: typed mention extraction + QC (gazetteer NER, applyInPandas)
      → stage 3: blocking joins (exact / acronym / equivalence / containment /
                 MinHash-LSH) + deterministic pair scoring
      → stage 4: connected components (iterative join-based label propagation)
      → stage 5: canonicalization → entities + (subj, pred, obj) edges tables
      → stage 6: profiles (applyInPandas per cluster) + grounding
    each stage materializes a parquet table = checkpoint (resume = anti-join).
"""

__version__ = "0.1.0"

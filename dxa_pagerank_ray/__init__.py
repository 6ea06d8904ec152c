"""dxa_pagerank_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch reimplementation of the *capabilities* of the reference
``coeit/dxa-pageRank`` (a DXRAM master/slave PageRank application, see
``/root/reference``) re-expressed as Ray Data pipelines:

- ingest Common-Crawl-style web-page Parquet tables
  ``(url, warc_ts, html, text, lang)``;
- extract text + links with stateless ``map_batches`` stages
  (byte-identical per url to the pinned single-process oracle);
- build a deduplicated ``edges(src, dst)`` table, degree tables and
  per-partition CSR adjacency blocks (zero-copy Arrow -> numpy);
- run PageRank (lump dangling-mass semantics matching the reference,
  ``RunLumpPrRoundTask.java`` / ``MainPR.java``), connected components
  (hash-min), label propagation and triangle counting as iterative
  gather-scatter passes with groupby-aggregate message shuffles;
- checkpoint vertex state per superstep to Parquet with per-partition
  lineage so runs resume mid-computation;
- plus the training-data operators a 100 TB pipeline needs: exact and
  near deduplication (MinHash-LSH, SimHash, n-gram Jaccard,
  embedding-cosine), ANN similarity search, language id, quality
  scoring, token counting, fingerprinting and multimodal plumbing.

Nothing in this package calls ``ray.init`` — sessions are owned by the
caller (driver, ``bench.py`` or the pytest fixture).
"""

__version__ = "0.1.0"

"""kgap_spark — a from-scratch PySpark-native rebuild of the query and
data-processing capabilities of vliz-be-opsci/k-gap (Knowledge Graph
Analysis Platform) as a batch KG-construction pipeline over
Common-Crawl-style web-page tables.

Reference parity map (see SURVEY.md for the full inventory):

- k-gap stores RDF quads in GraphDB and queries them with SPARQL
  (reference: ``README.md:29``, ``docs/quick-reference.md:186-187``);
  here the quad store is a partitioned ``triples`` table
  (``kgap_spark.schemas.TRIPLES``) and the query surface is
  DataFrame/SQL (``kgap_spark.query``).
- k-gap ingests LDES feeds into one named graph per feed
  (reference: ``ldes-consumer/app.py:309``); here each source lands in
  a ``graph`` partition written by ``kgap_spark.triples.writer``.
- k-gap's per-feed ``/state`` dirs guarantee resumable, duplicate-free
  ingest (reference: ``docs/components/ldes-consumer.md:584-592``);
  here that is the ``lineage`` table + idempotent writers in
  ``kgap_spark.lineage``.
"""

__version__ = "0.1.0"

from kgap_spark.session import get_spark  # noqa: F401

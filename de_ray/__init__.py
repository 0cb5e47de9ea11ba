"""de_ray — a Ray-Data-native knowledge-graph construction and query engine.

Rebuilds the capabilities of the DeciSym/de reference (RDF ingestion →
HDT-style dictionary+triples build → SPARQL triple-pattern queries) as
streaming ``ray.data.Dataset`` pipelines over zero-copy Arrow batches,
extended with a webtext front end (HTML→text extraction, triple
extraction, entity linking) and large-scale training-data operators
(dedup, similarity search, text analysis).

Library code never calls ``ray.init()`` / ``ray.shutdown()`` — the
driver, ``bench.py`` and the test fixture own the Ray session.
"""

__version__ = "0.1.0"

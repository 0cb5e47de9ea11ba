"""RDF input/output: N-Triples / N-Quads / Turtle parsing and serialization."""

from de_ray.rdfio.ntriples import (  # noqa: F401
    parse_nt_line,
    parse_nt_text,
    triples_to_nt_lines,
)
from de_ray.rdfio.turtle import parse_turtle  # noqa: F401
from de_ray.rdfio.sources import read_rdf, write_nt, graph_name_for_file  # noqa: F401

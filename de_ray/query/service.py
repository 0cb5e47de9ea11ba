"""SPARQL service description (K6, reference src/service_description.rs:48-120).

Emits the engine's service-description graph as canonical triples — the
CLI-equivalent of the reference's ``/`` endpoint response. Static metadata,
serializable through the normal graph serializers (K2/K4).
"""

from __future__ import annotations

from typing import List, Tuple

from de_ray.model import RDF

SD = "http://www.w3.org/ns/sparql-service-description#"
FORMATS = "http://www.w3.org/ns/formats/"

RESULT_FORMATS = ["SPARQL_Results_CSV", "SPARQL_Results_TSV", "SPARQL_Results_JSON", "SPARQL_Results_XML"]
GRAPH_FORMATS = ["N-Triples", "Turtle", "TriG", "N-Quads", "RDF_XML", "N3"]


def service_description(endpoint: str = "urn:de-ray:service") -> List[Tuple[str, str, str]]:
    triples = [
        (endpoint, RDF + "type", SD + "Service"),
        (endpoint, SD + "endpoint", endpoint),
        (endpoint, SD + "supportedLanguage", SD + "SPARQL11Query"),
        (endpoint, SD + "feature", SD + "UnionDefaultGraph"),
    ]
    for f in RESULT_FORMATS + GRAPH_FORMATS:
        triples.append((endpoint, SD + "resultFormat", FORMATS + f))
    for f in GRAPH_FORMATS:
        triples.append((endpoint, SD + "inputFormat", FORMATS + f))
    return triples

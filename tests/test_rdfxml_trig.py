"""RDF/XML and TriG parsing — same graph, different syntaxes."""

from de_ray.rdfio.rdfxml import parse_rdfxml
from de_ray.rdfio.turtle import parse_turtle

BANANA_NT = {
    ("http://example.org/Banana", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://example.org/Fruit"),
    ("http://example.org/Banana", "http://example.org/hasColor", '"yellow"'),
}


def test_rdfxml_basic():
    xml = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://example.org/">
      <rdf:Description rdf:about="http://example.org/Banana">
        <rdf:type rdf:resource="http://example.org/Fruit"/>
        <ex:hasColor>yellow</ex:hasColor>
        <ex:isEdible rdf:datatype="http://www.w3.org/2001/XMLSchema#boolean">true</ex:isEdible>
        <ex:label xml:lang="de">Banane</ex:label>
      </rdf:Description>
    </rdf:RDF>"""
    t = set(parse_rdfxml(xml))
    assert BANANA_NT <= t
    assert ("http://example.org/Banana", "http://example.org/isEdible",
            '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>') in t
    assert ("http://example.org/Banana", "http://example.org/label", '"Banane"@de') in t


def test_rdfxml_typed_node_and_nested():
    xml = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://example.org/">
      <ex:Fruit rdf:about="http://example.org/Banana">
        <ex:grownBy>
          <ex:Farmer rdf:about="http://example.org/Ann"/>
        </ex:grownBy>
      </ex:Fruit>
    </rdf:RDF>"""
    t = set(parse_rdfxml(xml))
    assert ("http://example.org/Banana", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://example.org/Fruit") in t
    assert ("http://example.org/Ann", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://example.org/Farmer") in t
    assert ("http://example.org/Banana", "http://example.org/grownBy",
            "http://example.org/Ann") in t


def test_trig_graph_blocks_drop_graph():
    trig = """
    @prefix ex: <http://example.org/> .
    ex:g1 {
      ex:Banana a ex:Fruit ; ex:hasColor "yellow" .
    }
    GRAPH ex:g2 {
      ex:Apple a ex:Fruit .
    }
    {
      ex:Pineapple a ex:Fruit .
    }
    """
    t = set(parse_turtle(trig))
    assert BANANA_NT <= t
    assert ("http://example.org/Apple", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://example.org/Fruit") in t
    assert ("http://example.org/Pineapple", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://example.org/Fruit") in t


def test_turtle_writer_compact_roundtrip(ray_session_guard=None):
    """Real Turtle writer: prefixes + ; , shorthand + 'a'; round-trips
    through our own Turtle parser with identical triples."""
    import pandas as pd
    import ray.data as rd

    from de_ray.query.engine import GraphResult
    from de_ray.query.serialize import graph_to_turtle
    from de_ray.rdfio.turtle import parse_turtle

    triples = [
        ("http://example.org/Apple", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://example.org/Fruit"),
        ("http://example.org/Apple", "http://example.org/hasColor", '"red"'),
        ("http://example.org/Apple", "http://example.org/hasColor", '"green"'),
        ("http://example.org/Apple", "http://example.org/weight", '"150"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("http://example.org/Pear", "http://example.org/hasColor", '"green"'),
    ]
    df = pd.DataFrame(triples, columns=["subj", "pred", "obj"])
    ttl = graph_to_turtle(GraphResult(rd.from_pandas(df)))
    assert "@prefix" in ttl and " ;\n" in ttl and ", " in ttl and " a " in ttl
    back = parse_turtle(ttl)
    assert sorted(back) == sorted(triples)

"""Minimal RDF/XML parser (stdlib xml.etree) → canonical triples.

Covers the common RDF/XML subset the reference ingests through oxrdfio
(``.rdf``/``.owl`` routed at ``src/rdf2nt.rs:51-65``): ``rdf:RDF`` root,
``rdf:Description`` and typed node elements, ``rdf:about``/``rdf:ID``/
``rdf:nodeID``, property elements with ``rdf:resource``/``rdf:nodeID``,
literal content with ``rdf:datatype``/``xml:lang``, nested node elements,
``rdf:parseType="Resource"``, and property attributes.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import List, Optional, Tuple

from de_ray.model import RDF, XSD_STRING, escape_literal

Triple = Tuple[str, str, str]

_RDF_NS = RDF[:-1] if RDF.endswith("#") else RDF  # namespace without '#'
_ABOUT = f"{{{RDF}}}about"
_ID = f"{{{RDF}}}ID"
_NODEID = f"{{{RDF}}}nodeID"
_RESOURCE = f"{{{RDF}}}resource"
_DATATYPE = f"{{{RDF}}}datatype"
_PARSETYPE = f"{{{RDF}}}parseType"
_DESCRIPTION = f"{{{RDF}}}Description"
_RDF_ROOT = f"{{{RDF}}}RDF"
_LANG = "{http://www.w3.org/XML/1998/namespace}lang"
_TYPE = RDF + "type"


class RdfXmlParser:
    def __init__(self, base: str = ""):
        self.base = base
        self.triples: List[Triple] = []
        self._bn = 0

    def _bnode(self, label: Optional[str] = None) -> str:
        if label:
            return f"_:{label}"
        self._bn += 1
        return f"_:genid{self._bn}"

    @staticmethod
    def _expand(tag: str) -> str:
        # '{ns}local' → ns + local
        if tag.startswith("{"):
            ns, local = tag[1:].split("}", 1)
            return ns + local
        return tag

    def parse(self, text: str) -> List[Triple]:
        root = ET.fromstring(text)
        nodes = list(root) if root.tag == _RDF_ROOT else [root]
        for el in nodes:
            self._node_element(el)
        return self.triples

    def _subject_of(self, el: ET.Element) -> str:
        if _ABOUT in el.attrib:
            return el.attrib[_ABOUT]
        if _ID in el.attrib:
            return self.base + "#" + el.attrib[_ID]
        if _NODEID in el.attrib:
            return self._bnode(el.attrib[_NODEID])
        return self._bnode()

    def _node_element(self, el: ET.Element) -> str:
        subj = self._subject_of(el)
        if el.tag != _DESCRIPTION:
            self.triples.append((subj, _TYPE, self._expand(el.tag)))
        # property attributes (non-rdf: attributes are literal properties)
        for k, v in el.attrib.items():
            if k in (_ABOUT, _ID, _NODEID, _LANG) or k.startswith(f"{{{RDF}}}"):
                continue
            self.triples.append((subj, self._expand(k), f'"{escape_literal(v)}"'))
        for prop in el:
            self._property_element(subj, prop)
        return subj

    def _property_element(self, subj: str, prop: ET.Element) -> None:
        pred = self._expand(prop.tag)
        if _RESOURCE in prop.attrib:
            self.triples.append((subj, pred, prop.attrib[_RESOURCE]))
            return
        if _NODEID in prop.attrib:
            self.triples.append((subj, pred, self._bnode(prop.attrib[_NODEID])))
            return
        if prop.attrib.get(_PARSETYPE) == "Resource":
            b = self._bnode()
            self.triples.append((subj, pred, b))
            for inner in prop:
                self._property_element(b, inner)
            return
        children = list(prop)
        if children:  # nested node element(s)
            for child in children:
                obj = self._node_element(child)
                self.triples.append((subj, pred, obj))
            return
        # literal
        lex = prop.text or ""
        dt = prop.attrib.get(_DATATYPE)
        lang = prop.attrib.get(_LANG)
        esc = escape_literal(lex)
        if dt and dt != XSD_STRING:
            self.triples.append((subj, pred, f'"{esc}"^^<{dt}>'))
        elif lang:
            self.triples.append((subj, pred, f'"{esc}"@{lang}'))
        else:
            self.triples.append((subj, pred, f'"{esc}"'))


def parse_rdfxml(text: str) -> List[Triple]:
    return RdfXmlParser().parse(text)

"""Pipeline stages: extraction, triple extraction, entity linking, canonicalization."""

from de_ray.stages.extract import HtmlTextExtractor, extract_text_stage  # noqa: F401
from de_ray.stages.triples import TripleExtractor, extract_triples_stage  # noqa: F401
from de_ray.stages.link import EntityLinker, link_entities_stage, build_alias_dict  # noqa: F401
from de_ray.stages.canonicalize import canonicalize_stage  # noqa: F401

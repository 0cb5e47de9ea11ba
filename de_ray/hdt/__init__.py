"""Distributed HDT-style storage: four-section dictionary, ID-triples, header."""

from de_ray.hdt.dictionary import (  # noqa: F401
    SECTION_SHARED,
    SECTION_SUBJECT,
    SECTION_OBJECT,
    SECTION_PREDICATE,
    build_dictionary,
)
from de_ray.hdt.store import Store, write_store  # noqa: F401

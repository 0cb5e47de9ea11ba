"""SPARQL query layer: parser, BGP evaluation over Ray Datasets, serializers."""

from de_ray.query.parser import parse_query  # noqa: F401
from de_ray.query.engine import evaluate, DatasetSource, StoreSource  # noqa: F401
from de_ray.query.serialize import serialize_result  # noqa: F401

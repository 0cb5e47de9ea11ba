"""Shared state helpers: broadcast object cache, checkpoints, lineage."""

from de_ray.state.broadcast import get_broadcast  # noqa: F401

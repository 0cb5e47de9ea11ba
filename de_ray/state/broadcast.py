"""Process-local cache for ``ray.put`` broadcast objects.

Pattern: the driver ``ray.put``s a lookup structure ONCE; stateless map
tasks call :func:`get_broadcast` per batch. The first call in each worker
process pays one ``ray.get`` (+ deserialize); subsequent calls are a dict
hit. This gives actor-pool-style state amortization WITHOUT reserving CPUs
for an actor pool — important when several scans run concurrently (UNION /
BGP joins) and actor pools would starve each other's upstream tasks on a
small CPU budget.
"""

from __future__ import annotations

from typing import Any, Dict

import ray

_CACHE: Dict[bytes, Any] = {}


def get_broadcast(ref: "ray.ObjectRef") -> Any:
    key = ref.binary()
    if key not in _CACHE:
        _CACHE[key] = ray.get(ref)
        # bound the cache: broadcast objects are few and long-lived; evict
        # oldest entries only if something pathological registers hundreds
        if len(_CACHE) > 64:
            _CACHE.pop(next(iter(_CACHE)))
    return _CACHE[key]

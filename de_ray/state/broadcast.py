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

from typing import Any, Callable, Dict, Optional

import ray

_CACHE: Dict[bytes, Any] = {}


def get_broadcast(
    ref: "ray.ObjectRef", transform: Optional[Callable[[Any], Any]] = None
) -> Any:
    """Fetch (and optionally derive from) a broadcast object, once per process.

    ``transform`` builds a worker-local structure from the stored object —
    e.g. a Python lookup dict from a zero-copy Arrow table. The transformed
    value is cached under (ref, transform name), so the derivation cost is
    paid once per worker process, and the object store holds only the
    compact Arrow form (never N pickled copies of a big dict).
    """
    key = ref.binary() + (transform.__qualname__.encode() if transform else b"")
    if key not in _CACHE:
        obj = ray.get(ref)
        _CACHE[key] = transform(obj) if transform else obj
        # bound the cache: broadcast objects are few and long-lived; evict
        # oldest entries only if something pathological registers hundreds
        if len(_CACHE) > 64:
            _CACHE.pop(next(iter(_CACHE)))
    return _CACHE[key]

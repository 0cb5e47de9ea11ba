"""Store registry: directory scan + add/remove graph stores (A2/S5).

Rebuilds the reference's ``AggregateHdt`` registry semantics
(``src/sparql.rs:14-17, 126-294``: a mutable name→path map synced with a
directory before each request, ``src/serve.rs:61-90, 158-161``) for
HDT-style store directories. Queries run against an immutable snapshot
(a ``MultiSource``), mirroring ``AggregateHdtSnapshot``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

from de_ray.hdt.store import Store


class StoreRegistry:
    def __init__(self, root: Optional[str] = None):
        self.root = root
        self._stores: Dict[str, str] = {}  # name → path
        if root:
            self.sync()

    def sync(self) -> None:
        """Diff registry vs directory: add new completed stores, drop
        removed ones (reference re-syncs before every request)."""
        if not self.root:
            return
        on_disk = {}
        if os.path.isdir(self.root):
            for name in os.listdir(self.root):
                p = os.path.join(self.root, name)
                if os.path.isdir(p) and os.path.exists(os.path.join(p, "_SUCCESS")):
                    on_disk[name] = p
        self._stores = on_disk

    def insert(self, name: str, path: str) -> None:
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise FileNotFoundError(f"not a completed store: {path}")
        self._stores[name] = path

    def remove(self, name: str) -> bool:
        return self._stores.pop(name, None) is not None

    def names(self) -> List[str]:
        return sorted(self._stores)

    def graphs(self) -> List[str]:
        out: List[str] = []
        for p in self._stores.values():
            out.extend(Store(p).graphs())
        return sorted(set(out))

    def snapshot(self, graphs: Optional[Sequence[str]] = None):
        """Immutable query source over the current registry state; the
        default graph is the union of all stores (src/serve.rs:58)."""
        from de_ray.query.engine import MultiSource, StoreSource

        sources = [StoreSource(Store(p), graphs) for _, p in sorted(self._stores.items())]
        if not sources:
            raise ValueError("registry is empty")
        return sources[0] if len(sources) == 1 else MultiSource(sources)

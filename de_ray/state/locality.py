"""Block-locality task placement for multi-node clusters.

Ray's default scheduler weighs argument locality, but under load it spills
tasks to any node with free CPUs — and a task whose argument is a pinned
multi-hundred-MB Arrow block then pulls the WHOLE block through the
object-transfer protocol before its first instruction. For per-block store
passes (peek, finalize slices, front-coding packs) that turns an O(1) or
zero-copy-local pass into a full cross-node corpus copy on a 4-node
cluster (measured: finalize 1.35 s → 3.17 s going 1 node → 4 simulated
nodes at the same vCPU total, before this helper).

``node_affinity_opts`` pins a task SOFTLY to the node already holding its
block: the scheduler places it there when possible but may still run it
elsewhere (no starvation, no failure if the node disappears). On a
single-node session every block is local and the helper degrades to {}.
"""

from __future__ import annotations

from typing import Dict, Sequence

import ray


def block_locations(refs: Sequence["ray.ObjectRef"]) -> Dict:
    """Best-effort {ref: node_id} of the primary copy of each object.

    One GCS round-trip for the whole list; {} on any failure — locality is
    an optimization, never a correctness dependency.
    """
    if not refs:
        return {}
    try:
        locs = ray.experimental.get_object_locations(list(refs), timeout_ms=2000)
    except Exception:
        return {}
    out = {}
    for ref, info in locs.items():
        nodes = (info or {}).get("node_ids") or []
        if nodes:
            out[ref] = nodes[0]
    return out


def node_affinity_opts(ref: "ray.ObjectRef", locations: Dict) -> Dict:
    """``.options(**...)`` kwargs placing a task on ``ref``'s node (soft)."""
    node_id = locations.get(ref)
    if not node_id:
        return {}
    from ray.util.scheduling_strategies import NodeAffinitySchedulingStrategy

    return {
        "scheduling_strategy": NodeAffinitySchedulingStrategy(
            node_id=node_id, soft=True
        )
    }

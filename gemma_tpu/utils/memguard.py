"""Allocation tripwire for memory-trueness tests (SURVEY §5.7).

The n-axis scale-out's contract is that no single device ever holds an
n²-sized buffer — K, the eigensolver intermediates and U stay
row-sharded over the mesh.  The virtual-mesh CI cannot observe HBM, so
`GEMMA_TPU_MEM_GUARD=<bytes>` arms this tripwire instead: `check(tag)`
raises if any LIVE jax array holds a single-device shard larger than
the limit.  The sharded pipelines call `check` at every step boundary
(kinship block accumulation, each eigensolver split, association
blocks), so a buffer that silently replicated or staged whole on one
device trips the guard with the step's tag.

Unset (production), `check` is a single dict lookup — zero cost.
"""

from __future__ import annotations

import os


def limit() -> int | None:
    v = os.environ.get("GEMMA_TPU_MEM_GUARD")
    return int(v) if v else None


def check(tag: str) -> None:
    lim = limit()
    if lim is None:
        return
    import jax
    for arr in jax.live_arrays():
        try:
            shards = arr.addressable_shards
        except Exception:
            continue
        for sh in shards:
            nb = int(sh.data.nbytes)
            if nb > lim:
                raise RuntimeError(
                    f"mem-guard[{tag}]: live single-device shard of "
                    f"{nb} bytes exceeds the {lim}-byte limit "
                    f"(array shape {arr.shape}, dtype {arr.dtype}, "
                    f"sharding {arr.sharding})")

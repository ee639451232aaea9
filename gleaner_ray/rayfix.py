"""Driver-side workaround for a Ray Data hash-shuffle schema-broadcast race.

Ray 2.49's hash-shuffle operators (joins, hash aggregations) broadcast
the input schema to every partition aggregator exactly once per input
sequence, piggybacked on the FIRST block that is shuffled
(``hash_shuffle.py:548-589``): the driver sets
``_has_schemas_broadcasted[input_index] = True`` when it SUBMITS the
first shuffle task with ``send_empty_blocks=True``.  But the shuffle
task itself short-circuits zero-row blocks BEFORE the broadcast
(``hash_shuffle.py:224-225`` — ``if block.num_rows == 0: return``), so
when the first block of a sequence happens to be empty (an empty
partition of an upstream join, an empty map output, ...) the schema
broadcast never happens at all.  Aggregator partitions whose only input
would have been the broadcast shard then hold a zero-field table, and
Acero fails the join non-deterministically (block arrival order) with

    ArrowInvalid: No match or multiple matches for key field reference
    FieldRef.Name(...) on {left,right} side of the join

The fix: never spend the one-shot broadcast on a zero-row block.  The
driver knows each block's row count from its ``BlockMetadata``, so we
route empty blocks around the flag (temporarily setting it so the
original code does not attempt to broadcast with them) and leave the
broadcast to the first block that actually has rows.  Applied at import
of ``gleaner_ray`` (idempotent, driver-side only — the patched method
runs in the driver's streaming-executor loop, not in workers).
"""

from __future__ import annotations

_PATCHED = False


def apply() -> None:
    """Install the schema-broadcast guard (no-op if already installed
    or if the Ray internals moved)."""
    global _PATCHED
    if _PATCHED:
        return
    try:
        import ray

        # Known-affected range only (verified against the installed
        # hash_shuffle source for 2.49.x). A future Ray that keeps the
        # attribute names but changes broadcast semantics must NOT get
        # the wrapper silently — outside the range this is a no-op, and
        # `import gleaner_ray` no longer eagerly imports ray.data
        # internals there either.
        if not ray.__version__.startswith("2.49."):
            return
    except Exception:  # pragma: no cover - ray absent
        return
    try:
        from ray.data._internal.execution.interfaces.ref_bundle import RefBundle
        from ray.data._internal.execution.operators.hash_shuffle import (
            HashShufflingOperatorBase,
        )

        orig = HashShufflingOperatorBase._do_add_input_inner

        def _do_add_input_inner(self, input_bundle, input_index):
            flags = getattr(self, "_has_schemas_broadcasted", None)
            if flags is None or flags[input_index]:
                return orig(self, input_bundle, input_index)
            blocks = list(zip(input_bundle.block_refs, input_bundle.metadata))
            # num_rows None means "unknown" — keep original behavior for it.
            if not any(m.num_rows == 0 for _, m in blocks):
                return orig(self, input_bundle, input_index)
            for ref, meta in blocks:
                sub = RefBundle(
                    blocks=((ref, meta),),
                    schema=input_bundle.schema,
                    owns_blocks=input_bundle.owns_blocks,
                )
                if meta.num_rows == 0 and not flags[input_index]:
                    # A zero-row block cannot carry the broadcast (the
                    # shuffle task returns before sending shards) — mask
                    # the one-shot flag so it is not consumed by it.
                    flags[input_index] = True
                    try:
                        orig(self, sub, input_index)
                    finally:
                        flags[input_index] = False
                else:
                    orig(self, sub, input_index)

        HashShufflingOperatorBase._do_add_input_inner = _do_add_input_inner
        _PATCHED = True
    except Exception:  # pragma: no cover - future Ray versions
        pass


apply()

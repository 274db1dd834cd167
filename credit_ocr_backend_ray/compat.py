"""Driver-side compatibility patches for Ray Data internals.

One patch lives here: re-arming the hash-shuffle schema broadcast when it
is spent on an empty block. It fixes a race that intermittently fails every
``Dataset.join`` (and any hash-shuffle consumer) whose input contains empty
leading blocks — the r03 driver window's one red query
(``doc_mean_token_freq``) died on exactly this.

Mechanics of the upstream bug (ray 2.49.2,
``ray/data/_internal/execution/operators/hash_shuffle.py``):

- Aggregator actors learn a side's schema from the FIRST shuffled block:
  that block's shuffle task is launched with ``send_empty_blocks=True`` so
  even partitions that receive no rows get an empty-but-typed shard
  (``_shuffle_block``, the ``send_empty_blocks`` branch).
- But ``_shuffle_block`` EARLY-RETURNS on a block with ``num_rows == 0``
  before fanning anything out, while the driver has already flipped
  ``_has_schemas_broadcasted[input_index] = True`` at submit time.
- Net effect: if the first-scheduled block of a side happens to be empty
  (a filter/groupby upstream produced one), no schema is ever broadcast for
  that side, and every aggregator partition that receives zero rows of it
  builds a ZERO-COLUMN table; ``pa.Table.join`` then dies with
  "No match or multiple matches for key field reference ... on right side".

Which block runs first is a scheduling race, so small scales pass most runs
and large scales (thousands of blocks, many of them empty) fail most runs.

The fix is driver-side only — the flag and the block metadata (``num_rows``)
live in ``_do_add_input_inner``, which executes in the streaming executor on
the driver — so patching the operator class here covers every pipeline this
package builds. Per block: remember whether the broadcast was requested,
delegate to the stock implementation one block at a time, and if the
opportunity was consumed by a block KNOWN to be empty, re-arm the flag so
the next block retries. Blocks with unknown ``num_rows`` keep stock
behavior (treated as non-empty).

A side that is empty in EVERY block still cannot broadcast a schema (there
is nothing to early-return around upstream); that failure mode is inherent
to the upstream operator and is documented on ``stages.relational
.shuffle_join``.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

_PATCH_FLAG = "_cob_ray_empty_block_schema_patch"
_SIZE_PATCH_FLAG = "_cob_ray_empty_block_size_patch"


def install_worker_patch_propagation() -> bool:
    """Make EVERY Ray Data worker install the compat patches, not just the
    ones that happen to import this package.

    The patches install at package import (``__init__``), which covers any
    worker that imports the package while deserializing a UDF — but a
    nested closure that references no package global (e.g. ``broadcast_
    semi_join``'s pure-pandas ``filt``, which touches only ``ray``/``pd``)
    is pickled BY VALUE by cloudpickle, so the worker never imports the
    package and an empty output block still sprays ``Error calculating
    size for column '<name>'`` per string column (reproduced; the r04
    sweep's ``n_name`` noise survived the import-time install for exactly
    this reason).

    Instead of threading a package reference through 137 closure sites,
    piggyback on the one object Ray Data already ships to every task: the
    ``DataContext``. Each ``Dataset`` deep-copies the current context at
    creation and serializes it into its task specs, and the worker
    unpickles it during task setup — before the task emits its first
    block. A module-valued attribute on the context is pickled by
    cloudpickle AS A REFERENCE (``subimport(name)``), so unpickling the
    context imports this package in the worker and the ``__init__``
    installs run there. Requires the package to be importable from the
    worker's cwd — already true wherever any of this package's pipelines
    can run at all (their UDFs reference package globals)."""
    try:
        from ray.data import DataContext
    except ImportError:
        logger.warning("DataContext not found; worker patch propagation "
                       "skipped")
        return False
    DataContext.get_current()._cob_worker_patch_hook = _WorkerPatchShipment()
    return True


class _WorkerPatchShipment:
    """The attribute value ``install_worker_patch_propagation`` puts on the
    global ``DataContext``. Two constraints shape it:

    - Ray deep-copies the context per dataset (and derived datasets copy
      it AGAIN), so the attribute must survive ``copy.deepcopy``
      repeatedly — holding the module object directly crashes the second
      copy (``cannot pickle 'module' object``). ``__deepcopy__`` /
      ``__copy__`` return ``self`` so every context copy keeps this
      placeholder.
    - serialization into a task spec goes through cloudpickle, which
      honors ``__reduce__``: the worker reconstructs by calling
      ``pydoc.safeimport`` (stdlib, importable everywhere, returns
      ``None`` instead of raising when the package is absent from the
      worker's path), importing this package — and running the
      ``__init__`` patch installs — before the task emits a block."""

    def __deepcopy__(self, memo):
        return self

    def __copy__(self):
        return self

    def __reduce__(self):
        import pydoc
        return (pydoc.safeimport, ("credit_ocr_backend_ray",))


def install_pandas_size_bytes_patch() -> bool:
    """Fix ``PandasBlockAccessor.size_bytes`` on EMPTY blocks (ray
    2.49.2): the object-column sampler calls ``np.vectorize`` over a
    size-0 sample, which raises ("cannot call vectorize on size 0
    inputs") and logs ``Error calculating size for column '<name>'``
    once per empty pandas block per string column — every filter that
    empties a block of a pandas stage sprays it (the r04 sweep's
    ``n_name`` noise from ``local_supplier_revenue``). An empty frame
    has no object payload at all, so the true answer is the shallow
    scaffolding size; short-circuit to it instead of sampling. Fixes
    the origin (the wrong code path) rather than filtering the log
    line. Idempotent; worker processes get it because installing at
    package import time runs wherever a closure from this package is
    deserialized."""
    try:
        from ray.data._internal.pandas_block import PandasBlockAccessor
    except ImportError:
        logger.warning("pandas_block internals not found; empty-block "
                       "size patch skipped")
        return False
    if getattr(PandasBlockAccessor, _SIZE_PATCH_FLAG, False):
        return True
    orig = PandasBlockAccessor.size_bytes

    def size_bytes(self) -> int:
        if self._table is not None and len(self._table) == 0:
            return int(self._table.memory_usage(
                index=True, deep=False).sum())
        return orig(self)

    PandasBlockAccessor.size_bytes = size_bytes
    setattr(PandasBlockAccessor, _SIZE_PATCH_FLAG, True)
    return True


_DEDUPE_PATCH_FLAG = "_cob_ray_empty_schema_dedupe_patch"


def install_schema_dedupe_warning_patch() -> bool:
    """Silence the spurious per-bundle "Operator produced a RefBundle with
    a different schema ... new schema: ." warning (ray 2.49.2,
    ``streaming_executor_state.dedupe_schemas_with_validation``): the check
    already returns silently when the OLD schema is empty, but warns when
    the NEW bundle's schema is empty — and a zero-row bundle carries no
    schema information at all, so that case is not a divergence either
    (upstream asymmetry). Map/groupby pipelines whose UDFs legitimately
    emit empty blocks (e.g. a blocking stage whose shard produced no
    pairs) otherwise spray one warning per empty bundle, race-dependent.
    Fixes the origin: pass ``warn=False`` for empty new schemas only —
    real divergences (two NON-empty mismatched schemas) still warn.
    Driver-side only (the streaming executor runs on the driver)."""
    try:
        from ray.data._internal.execution import streaming_executor_state
        from ray.data.block import _is_empty_schema
    except ImportError:
        logger.warning("streaming_executor_state internals not found; "
                       "empty-schema dedupe warning patch skipped")
        return False
    if getattr(streaming_executor_state, _DEDUPE_PATCH_FLAG, False):
        return True
    orig = getattr(streaming_executor_state,
                   "dedupe_schemas_with_validation", None)
    if orig is None:
        logger.warning("dedupe_schemas_with_validation moved; "
                       "empty-schema dedupe warning patch skipped")
        return False

    def dedupe_schemas_with_validation(old_schema, bundle, warn=True,
                                       enforce_schemas=False):
        if warn and _is_empty_schema(bundle.schema):
            warn = False
        return orig(old_schema, bundle, warn=warn,
                    enforce_schemas=enforce_schemas)

    streaming_executor_state.dedupe_schemas_with_validation = (
        dedupe_schemas_with_validation)
    setattr(streaming_executor_state, _DEDUPE_PATCH_FLAG, True)
    return True


def install_hash_shuffle_schema_patch() -> bool:
    """Idempotently install the re-arm patch. Returns True when the patch
    is active (installed now or previously), False when this Ray version's
    internals don't match and the patch was skipped."""
    try:
        from ray.data._internal.execution.interfaces.ref_bundle import RefBundle
        from ray.data._internal.execution.operators.hash_shuffle import (
            HashShufflingOperatorBase,
        )
    except ImportError:  # internals moved — assume upstream fixed it
        logger.warning(
            "hash_shuffle internals not found; empty-block schema patch "
            "skipped (assuming this Ray version fixed the broadcast race)"
        )
        return False

    if getattr(HashShufflingOperatorBase, _PATCH_FLAG, False):
        return True

    # NOTE: _has_schemas_broadcasted is an INSTANCE attribute (set in
    # __init__), so it can't be probed on the class here; the wrapper
    # below fails loudly (AttributeError per bundle) if it moves.
    orig = getattr(HashShufflingOperatorBase, "_do_add_input_inner", None)
    if orig is None:
        logger.warning(
            "hash_shuffle shape changed; empty-block schema patch skipped"
        )
        return False

    def _do_add_input_inner(self, input_bundle, input_index: int) -> None:
        # Feed the stock implementation one block at a time so the
        # broadcast-consumed check pairs with exactly the block that
        # received send_empty_blocks=True.
        blocks = list(zip(input_bundle.block_refs, input_bundle.metadata))
        if len(blocks) <= 1:
            subs = [(input_bundle, blocks[0][1] if blocks else None)]
        else:
            subs = [
                (
                    RefBundle(
                        [blk],
                        schema=input_bundle.schema,
                        owns_blocks=input_bundle.owns_blocks,
                    ),
                    blk[1],
                )
                for blk in blocks
            ]
        for sub, meta in subs:
            requested = not self._has_schemas_broadcasted[input_index]
            orig(self, sub, input_index)
            if (
                requested
                and self._has_schemas_broadcasted[input_index]
                and meta is not None
                and meta.num_rows == 0
            ):
                # _shuffle_block early-returns on empty blocks without
                # fanning out schema shards: the opportunity was wasted,
                # re-arm it for the next block.
                self._has_schemas_broadcasted[input_index] = False

    HashShufflingOperatorBase._do_add_input_inner = _do_add_input_inner
    setattr(HashShufflingOperatorBase, _PATCH_FLAG, True)
    return True

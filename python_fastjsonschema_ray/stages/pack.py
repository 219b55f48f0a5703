"""Sequence packing plan for LLM pretraining: concat-then-chunk.

Pretraining data loaders concatenate documents in a fixed order and
slice the stream into ``max_tokens``-sized training sequences; each
document therefore maps to (first sequence, offset within it, last
sequence).  That mapping is a pure function of the GLOBAL EXCLUSIVE
PREFIX SUM of document lengths in document order — a scan, which Ray
Data's per-batch operators cannot express (a batch cannot know how many
tokens precede its block).  This is the one documented place the engine
drops to raw ``@ray.remote`` tasks over the sorted Dataset's block
refs:

1. ``ds.sort(id_column)`` range-partitions into ORDERED blocks (the
   only shuffle);
2. one tiny remote task per block returns its token-column sum; the
   driver folds the exclusive block prefix (#blocks values, not rows);
3. one remote task per block computes in-block cumulative sums plus its
   block prefix — fully vectorized, emits the per-document plan.

Deterministic on any cluster layout; documents with zero tokens get a
zero-width span (seq_last == seq_first).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def packing_plan(ds, id_column, token_column, max_tokens):
    """Per-document packing spans: (id, seq_first, seq_offset,
    seq_last) for the concat-then-chunk stream in ``id_column`` order.

    ``seq_first``/``seq_last`` are 0-based sequence indices; a document
    straddles a boundary when seq_last > seq_first.  Returns a Ray
    Dataset."""
    import ray
    import ray.data

    if max_tokens <= 0:
        raise ValueError('max_tokens must be positive')

    sorted_ds = ds.select_columns([id_column, token_column]) \
        .sort(id_column).materialize()
    refs = sorted_ds.to_arrow_refs()
    in_schema = sorted_ds.schema()
    id_type = pa.string()
    if in_schema is not None and id_column in in_schema.names:
        t = in_schema.types[in_schema.names.index(id_column)]
        if isinstance(t, pa.DataType):
            id_type = t

    @ray.remote
    def block_sum(t) -> int:
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t)
        # Materialized empty blocks can be schemaless (zero columns).
        if t.num_rows == 0 or token_column not in t.schema.names:
            return 0
        vals = np.asarray(t.column(token_column).combine_chunks()
                          .fill_null(0), dtype=np.int64)
        return int(vals.sum())

    sums = ray.get([block_sum.remote(r) for r in refs])
    prefixes = np.zeros(len(sums), dtype=np.int64)
    np.cumsum(sums[:-1], out=prefixes[1:])

    @ray.remote
    def plan_block(t, prefix: int):
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t)
        if t.num_rows == 0 or token_column not in t.schema.names:
            return pa.table({
                'id': pa.array([], type=id_type),
                'seq_first': pa.array([], type=pa.int64()),
                'seq_offset': pa.array([], type=pa.int64()),
                'seq_last': pa.array([], type=pa.int64()),
            })
        n = np.asarray(t.column(token_column).combine_chunks()
                       .fill_null(0), dtype=np.int64)
        start = np.zeros(len(n), dtype=np.int64)
        np.cumsum(n[:-1], out=start[1:])
        start += prefix
        end = start + np.maximum(n, 1)      # zero-width docs: 1-span
        L = np.int64(max_tokens)
        return pa.table({
            'id': t.column(id_column),
            'seq_first': pa.array(start // L, type=pa.int64()),
            'seq_offset': pa.array(start % L, type=pa.int64()),
            'seq_last': pa.array((end - 1) // L, type=pa.int64()),
        })

    out_refs = [plan_block.remote(r, int(p))
                for r, p in zip(refs, prefixes)]
    return ray.data.from_arrow_refs(out_refs)

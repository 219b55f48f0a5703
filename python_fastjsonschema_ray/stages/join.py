"""Equi-joins for enrichment: broadcast lookup join (dimension side
shipped once through the object store) and a bucketed shuffle join for
two large sides.

The reference has no joins (it validates one document at a time); the
north rule's referential checks are the ANTI-join variants in
``pipelines/constraints.py``.  These are the positive-match
counterparts a pipeline needs to enrich fact rows with dimension
attributes (e.g. orders with customer segment) before validation.

Scale notes:

* ``broadcast_lookup_join`` ships the dimension table ONCE as
  object-store refs (never through the driver heap) and each worker
  builds the lookup a single time (module-level cache); per batch the
  join is one vectorized ``pc.index_in`` + ``take`` — no shuffle at
  all.  Right for dimension sides that fit a worker's heap (the common
  case: 10^6-10^8 keys).  The ref side must be UNIQUE on the join key
  (dimension semantics — duplicate keys would silently pick one match);
  pass ``check_unique=True`` to verify (one extra pass over the small
  side).
* ``shuffle_join`` hash-buckets BOTH sides on the key (the
  check_referential_large pattern) and merges per bucket with a
  vectorized pandas merge — one all-to-all exchange of each side, the
  honest cost when neither side broadcasts.  Duplicate keys produce the
  full SQL inner-join cross product within the key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _as_arrow(t):
    if isinstance(t, pa.Table):
        return t
    return pa.Table.from_pandas(t)


def broadcast_lookup_join(ds, key, ref_ds, ref_key, ref_columns,
                          how='inner', check_unique=False):
    """Enrich ``ds`` with ``ref_columns`` from ``ref_ds`` matched on
    ``ds[key] == ref_ds[ref_key]``.

    ``how='inner'`` drops unmatched (and null-key) rows; ``how='left'``
    keeps them with null enrichment columns.  The ref side must be
    unique on ``ref_key``."""
    import ray

    from .dedup import _worker_cached

    if how not in ('inner', 'left'):
        raise ValueError("how must be 'inner' or 'left'")
    ref_columns = [c for c in ref_columns if c != ref_key]
    refs = ref_ds.select_columns([ref_key] + ref_columns).to_arrow_refs()

    if check_unique:
        import pyarrow.compute as pc
        keys_all = pa.concat_arrays(
            [_as_arrow(t).column(ref_key).combine_chunks()
             for t in ray.get(list(refs))])
        if len(keys_all) != len(pc.unique(keys_all)):
            raise ValueError(
                'ref side is not unique on {!r}; broadcast_lookup_join has '
                'dimension (first-match) semantics'.format(ref_key))

    cache_token = tuple(r.hex() for r in refs)

    def lookup_table():
        tables = [_as_arrow(t) for t in ray.get(list(refs))]
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return None
        return pa.concat_tables(tables).combine_chunks()

    def join(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ref = _worker_cached(('lookup',) + cache_token, lookup_table)
        k = batch.column(key).combine_chunks()
        if ref is None:
            idx = pa.nulls(batch.num_rows, type=pa.int64())
        else:
            idx = pc.index_in(
                k.cast(ref.column(ref_key).type),
                value_set=ref.column(ref_key).combine_chunks())
        if how == 'inner':
            hit = pc.is_valid(idx)
            batch = batch.filter(hit)
            idx = idx.filter(hit)
        out = batch
        for c in ref_columns:
            col = (ref.column(c).combine_chunks().take(idx) if ref is not None
                   else pa.nulls(out.num_rows))
            out = out.append_column(c, col)
        return out

    return ds.map_batches(join, batch_format='pyarrow')


def shuffle_join(left, right, left_key, right_key, right_columns,
                 num_buckets=None):
    """Inner equi-join of two large Datasets via one coarse hash-bucket
    co-group per side; per-bucket vectorized pandas merge (full SQL
    inner-join semantics including duplicate-key cross products).
    Output columns: all of ``left`` plus ``right_columns``."""
    import pandas as pd

    from ..pipelines.constraints import _AddKeyBucket, _default_buckets

    num_buckets = num_buckets or _default_buckets()
    right_columns = [c for c in right_columns if c != right_key]

    left_schema = left.schema()
    left_names = list(left_schema.names)
    overlap = ({right_key} | set(right_columns)) & set(left_schema.names)
    if overlap:
        raise ValueError(
            'right-side columns {} collide with left column names; rename '
            'before joining'.format(sorted(overlap)))
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_schema = right.schema()
    right_types = dict(zip(right_schema.names, right_schema.types))
    out_names = left_names + ['_side', right_key] + right_columns
    # Null padding must carry the REAL column types or the union's
    # schemas diverge (null-typed vs int64 columns).
    pad_types = dict(left_types)
    for c in [right_key] + right_columns:
        pad_types.setdefault(c, right_types[c])

    def tag_left(b: pa.Table) -> pa.Table:
        b = b.append_column('_side', pa.array(['L'] * b.num_rows))
        for c in [right_key] + right_columns:
            if c not in b.schema.names:
                b = b.append_column(c, pa.nulls(b.num_rows,
                                                type=pad_types[c]))
        return b.select(out_names)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {right_key: b.column(right_key)}
        for c in right_columns:
            cols[c] = b.column(c)
        t = pa.table(cols)
        t = t.append_column('_side', pa.array(['R'] * t.num_rows))
        for c in left_names:
            if c not in t.schema.names:
                t = t.append_column(c, pa.nulls(t.num_rows,
                                                type=pad_types[c]))
        return t.select(out_names)

    lt = left.map_batches(tag_left, batch_format='pyarrow').map_batches(
        _AddKeyBucket([left_key], num_buckets), batch_format='pyarrow')
    rt = right.select_columns([right_key] + right_columns).map_batches(
        tag_right, batch_format='pyarrow').map_batches(
        _AddKeyBucket([right_key], num_buckets), batch_format='pyarrow')
    # Left rows bucket on left_key, right rows on right_key: equal keys
    # land in the same bucket (same hash of the same value).

    def merge(group: pa.Table) -> pa.Table:
        # Arrow group end-to-end: slicing each SIDE as arrow before any
        # pandas conversion keeps int64 key/value types intact (a pandas
        # group would see the other side's null padding and coerce the
        # whole column to float64, silently changing values and schema).
        import pyarrow.compute as pc

        is_l = pc.equal(group.column('_side'), 'L')
        l = group.filter(is_l).select(left_names)
        r = group.filter(pc.invert(is_l)).select([right_key] + right_columns)
        # SQL semantics: null keys never match.
        l = l.filter(pc.is_valid(l.column(left_key)))
        r = r.filter(pc.is_valid(r.column(right_key)))
        lhs = l.to_pandas()
        rhs = r.to_pandas()
        out = lhs.merge(rhs, left_on=left_key, right_on=right_key,
                        how='inner')
        if right_key not in left_names and right_key != left_key:
            out = out.drop(columns=[right_key])
        return pa.Table.from_pandas(out, preserve_index=False)

    return lt.union(rt).groupby('_bucket').map_groups(
        merge, batch_format='pyarrow')

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


def broadcast_lookup_join(ds, key, ref_ds, ref_key, ref_columns=None,
                          how='inner', check_unique=False,
                          broadcast_limit_bytes=None):
    """Enrich ``ds`` with ``ref_columns`` from ``ref_ds`` matched on
    ``ds[key] == ref_ds[ref_key]``.

    ``how='inner'`` drops unmatched (and null-key) rows; ``how='left'``
    keeps them with null enrichment columns; ``how='semi'`` /
    ``how='anti'`` filter to rows whose key does / does not exist on
    the ref side (SQL ``EXISTS`` / ``NOT EXISTS``: null keys never
    match, so semi drops them and anti keeps them) without appending
    any columns — the broadcast denylist/allowlist filter.  For
    inner/left the ref side must be unique on ``ref_key``; semi/anti
    tolerate duplicates.

    ``broadcast_limit_bytes`` gates the broadcast (the
    ``broadcast_text_limit`` discipline from stages/dedup.py): the ref
    side is materialized once and, if its block-metadata size exceeds
    the limit, the join falls back to :func:`shuffle_join` — a ref side
    that outgrows worker heaps (e.g. a corpus-scale vocabulary table)
    must exchange, not ship to every task.  The fallback has identical
    results when the ref side is unique on ``ref_key`` (pass
    ``check_unique=True`` to enforce; with duplicate ref keys broadcast
    takes the first match while shuffle emits the SQL cross product)."""
    import ray

    from .dedup import _worker_cached

    if how not in ('inner', 'left', 'semi', 'anti'):
        raise ValueError("how must be 'inner', 'left', 'semi' or 'anti'")
    if how in ('semi', 'anti'):
        ref_columns = []
    ref_columns = [c for c in (ref_columns or []) if c != ref_key]
    ref_ds = ref_ds.select_columns([ref_key] + ref_columns)
    if broadcast_limit_bytes is not None:
        ref_ds = ref_ds.materialize()   # size check + refs share one exec
        if (ref_ds.size_bytes() or 0) > broadcast_limit_bytes:
            return shuffle_join(ds, ref_ds, key, ref_key, ref_columns,
                                how=how)
    refs = ref_ds.to_arrow_refs()

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
            # index_in matches null->null when the ref side holds a
            # null key; SQL equi-join semantics never match null keys,
            # so null them out for EVERY mode (inner must drop them,
            # left must keep them unenriched).
            idx = pc.if_else(pc.is_valid(k), idx,
                             pa.scalar(None, type=idx.type))
        if how in ('semi', 'anti'):
            # index_in matches null->null when the ref side holds a null
            # key; SQL EXISTS never matches nulls, so guard on key
            # validity explicitly.
            hit = pc.and_(pc.is_valid(idx), pc.is_valid(k))
            return batch.filter(hit if how == 'semi'
                                else pc.invert(hit))
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
                 num_buckets=None, how='inner'):
    """Equi-join of two large Datasets via one coarse hash-bucket
    co-group per side; per-bucket vectorized pandas merge (full SQL
    semantics including duplicate-key cross products).  ``how`` is
    ``'inner'`` or ``'left'`` — every left row lands in exactly one
    bucket, so unmatched left rows survive the per-bucket left merge
    with typed-null right columns (pandas' float coercion of
    null-padded int columns is undone by rebuilding each column with
    its declared Arrow type).  Output columns: all of ``left`` plus
    ``right_columns``."""
    import pandas as pd

    from ..pipelines.constraints import _AddKeyBucket, _default_buckets

    if how not in ('inner', 'left', 'semi', 'anti'):
        raise ValueError("how must be 'inner', 'left', 'semi' or 'anti'")
    if how in ('semi', 'anti'):
        return _shuffle_semi_anti(left, right, left_key, right_key,
                                  num_buckets, how)
    num_buckets = num_buckets or _default_buckets()
    right_columns = [c for c in right_columns if c != right_key]

    left_schema = left.schema()
    if left_schema is None:
        return left            # fully-empty left: nothing to join
    right_schema_probe = right.schema()
    if right_schema_probe is None:
        # Fully-empty right side (no schema at all): inner yields
        # nothing; left keeps every left row with null-typed padding
        # for the requested right columns.
        if how == 'inner':
            return left.limit(0)
        pad = [right_key] + right_columns

        def pad_left(b: pa.Table) -> pa.Table:
            for c in pad:
                if c not in b.schema.names:
                    b = b.append_column(c, pa.nulls(b.num_rows))
            return b

        return left.map_batches(pad_left, batch_format='pyarrow')
    left_names = list(left_schema.names)
    overlap = ({right_key} | set(right_columns)) & set(left_schema.names)
    if overlap:
        raise ValueError(
            'right-side columns {} collide with left column names; rename '
            'before joining'.format(sorted(overlap)))
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_schema = right.schema()
    right_types = dict(zip(right_schema.names, right_schema.types))
    lk_t, rk_t = left_types.get(left_key), right_types.get(right_key)
    if lk_t is not None and rk_t is not None and lk_t != rk_t:
        # Mismatched key dtypes hash to DIFFERENT buckets upstream
        # (int 2 vs float 2.0), so the join would mostly return empty
        # silently; a naive pandas astype in the merge would also
        # truncate float keys to int (2.5 -> 2) and fabricate matches.
        # Align at the boundary with Arrow's checked cast (safe=True
        # raises on any lossy value: 2.5 -> int, 2^53+1 -> float).
        def align_key(b: pa.Table, _k=right_key, _t=lk_t) -> pa.Table:
            try:
                cast = b.column(_k).cast(_t)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as exc:
                raise TypeError(
                    'shuffle_join: right key {!r} ({}) cannot be cast '
                    'losslessly to the left key type {}; cast the key '
                    'columns explicitly before joining: {}'.format(
                        _k, b.column(_k).type, _t, exc)) from exc
            return b.set_column(b.schema.get_field_index(_k), _k, cast)

        right = right.map_batches(align_key, batch_format='pyarrow')
        right_types = dict(right_types, **{right_key: lk_t})
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
        # SQL semantics: null keys never match — but a LEFT join keeps
        # the null-key left rows (pandas would wrongly match NaN keys,
        # so they are split off and re-appended padded below).
        l_null = (l.filter(pc.is_null(l.column(left_key)))
                  if how == 'left' else None)
        l = l.filter(pc.is_valid(l.column(left_key)))
        r = r.filter(pc.is_valid(r.column(right_key)))
        # Merge POSITIONS, not payloads: only (key, row position) pass
        # through pandas, and every output column is gathered from the
        # Arrow sides by position — a pandas left merge would null-pad
        # right int64 columns into float64, silently corrupting values
        # above 2^53 (snowflake-style ids) on the round-trip back.
        lhs = pd.DataFrame({
            '__k': l.column(left_key).to_pandas(),
            '__lpos': np.arange(l.num_rows, dtype=np.int64)})
        rhs = pd.DataFrame({
            '__k': r.column(right_key).to_pandas(),
            '__rpos': np.arange(r.num_rows, dtype=np.int64)})
        if lhs['__k'].dtype != rhs['__k'].dtype:
            # Defensive only (keys are Arrow-aligned at the API
            # boundary above): reconcile residual pandas dtype drift,
            # but never through a lossy cast — silent float->int
            # truncation would fabricate matches SQL rejects.
            def _checked(src, dtype):
                cast = src.astype(dtype)
                if not bool(((cast == src) | src.isna()).all()):
                    raise TypeError(
                        'shuffle_join: lossy key cast {} -> {}; cast '
                        'the key columns explicitly before '
                        'joining'.format(src.dtype, dtype))
                return cast
            try:
                rhs['__k'] = _checked(rhs['__k'], lhs['__k'].dtype)
            except (TypeError, ValueError):
                lhs['__k'] = _checked(lhs['__k'], rhs['__k'].dtype)
        out = lhs.merge(rhs, on='__k', how=how)
        lpos = pa.array(out['__lpos'].to_numpy(dtype=np.int64))
        rpos = pa.array(out['__rpos'], type=pa.int64(), from_pandas=True)
        result = l.combine_chunks().take(lpos)
        r = r.combine_chunks()
        for c in right_columns:
            result = result.append_column(c, r.column(c).take(rpos))
        if l_null is not None and l_null.num_rows:
            pad = l_null
            for c in result.column_names:
                if c not in pad.column_names:
                    pad = pad.append_column(
                        c, pa.nulls(pad.num_rows, type=pad_types[c]))
            result = pa.concat_tables(
                [result, pad.select(result.column_names)])
        return result

    return lt.union(rt).groupby('_bucket').map_groups(
        merge, batch_format='pyarrow')


def _shuffle_semi_anti(left, right, left_key, right_key, num_buckets, how):
    """Distributed SQL ``EXISTS`` / ``NOT EXISTS`` filter when the key
    side is too large to broadcast (use ``broadcast_lookup_join`` with
    ``how='semi'/'anti'`` otherwise).

    The right side collapses to per-block DISTINCT keys BEFORE the
    exchange (an Arrow group_by combiner, the dedup_exact discipline),
    so the shuffle moves full left rows plus at most one key row per
    distinct right key per block — never right payload columns.  Null
    left keys never match: semi drops them, anti keeps them."""
    from ..pipelines.constraints import _AddKeyBucket, _default_buckets

    num_buckets = num_buckets or _default_buckets()
    left_schema = left.schema()
    if left_schema is None:
        return left            # fully-empty left: nothing to filter
    if right.schema() is None:
        # Empty right key set: EXISTS is false everywhere — semi drops
        # every row, anti keeps every row (incl. null keys, per policy).
        return left.limit(0) if how == 'semi' else left
    if any(t is None for t in left_schema.types):
        # pandas-block datasets report extension dtypes as None; route
        # through an Arrow conversion so the pad types are real.
        left = left.map_batches(lambda t: t, batch_format='pyarrow')
        left_schema = left.schema()
    left_names = list(left_schema.names)
    key_type = dict(zip(left_schema.names, left_schema.types))[left_key]
    pad_types = dict(zip(left_schema.names, left_schema.types))

    def tag_left(b: pa.Table) -> pa.Table:
        return b.append_column('_side', pa.array(['L'] * b.num_rows))

    def tag_right(b: pa.Table) -> pa.Table:
        keys = (b.select([right_key]).group_by([right_key]).aggregate([])
                .column(right_key).combine_chunks().cast(key_type))
        t = pa.table({left_key: keys})
        for c in left_names:
            if c != left_key:
                t = t.append_column(c, pa.nulls(t.num_rows,
                                                type=pad_types[c]))
        t = t.append_column('_side', pa.array(['R'] * t.num_rows))
        return t.select(left_names + ['_side'])

    lt = left.map_batches(tag_left, batch_format='pyarrow').map_batches(
        _AddKeyBucket([left_key], num_buckets), batch_format='pyarrow')
    rt = right.select_columns([right_key]).map_batches(
        tag_right, batch_format='pyarrow').map_batches(
        _AddKeyBucket([left_key], num_buckets), batch_format='pyarrow')

    def filt(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_l = pc.equal(group.column('_side'), 'L')
        l = group.filter(is_l).select(left_names)
        rkeys = group.filter(pc.invert(is_l)).column(left_key) \
            .combine_chunks()
        k = l.column(left_key)
        hit = pc.and_(pc.fill_null(pc.is_in(k, value_set=rkeys), False),
                      pc.is_valid(k))
        return l.filter(hit if how == 'semi' else pc.invert(hit))

    return lt.union(rt).groupby('_bucket').map_groups(
        filt, batch_format='pyarrow')


def broadcast_interval_join(ds, point_column, intervals, start_column,
                            end_column, interval_columns, *, key=None,
                            interval_key=None, closed='left', how='inner'):
    """Range join: match each row of ``ds`` to every interval
    ``[start_column, end_column)`` that contains ``ds[point_column]``
    (plus an optional equi-key), SQL inner-join multiplicity — a row in
    k overlapping intervals emits k output rows.

    ``closed`` picks the boundary convention: 'left' = [start, end),
    'both' = [start, end], 'right' = (start, end], 'neither'.
    ``how='left'`` keeps unmatched (and null-key/null-point) rows with
    null interval columns.

    Scale: the interval side ships ONCE as object-store refs (never
    through the driver heap) and each worker materializes it a single
    time; per batch the match is one vectorized pandas merge (equi-key
    when ``key`` is given, else cross) + boundary mask — no shuffle.
    Right for interval sides that fit a worker's heap; the keyless
    variant materializes |batch| x |intervals| candidates per batch, so
    keep it for small interval sets (calendars, campaign windows) and
    prefer the keyed form at scale."""
    import pandas as pd
    import ray

    from .dedup import _worker_cached

    if how not in ('inner', 'left'):
        raise ValueError("how must be 'inner' or 'left'")
    closed_ops = {'left': ('ge', 'lt'), 'both': ('ge', 'le'),
                  'right': ('gt', 'le'), 'neither': ('gt', 'lt')}
    if closed not in closed_ops:
        raise ValueError('closed must be one of {}'.format(
            sorted(closed_ops)))
    if (key is None) != (interval_key is None):
        raise ValueError('key and interval_key must be given together')
    interval_columns = list(interval_columns)

    ds_schema = ds.schema()
    if ds_schema is None:
        return ds              # fully-empty point side: nothing to join
    if intervals.schema() is None:
        # Fully-empty interval side: inner yields nothing; left keeps
        # every point row with null-typed interval padding.
        if how == 'inner':
            return ds.limit(0)

        def pad_points(b: pa.Table) -> pa.Table:
            for c in interval_columns:
                if c not in b.schema.names:
                    b = b.append_column(c, pa.nulls(b.num_rows))
            return b

        return ds.map_batches(pad_points, batch_format='pyarrow')
    left_names = list(ds_schema.names)
    overlap = set(interval_columns) & set(left_names)
    if overlap:
        raise ValueError(
            'interval columns {} collide with left column names; rename '
            'before joining'.format(sorted(overlap)))
    iv_schema = intervals.schema()
    iv_types = dict(zip(iv_schema.names, iv_schema.types))
    out_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(ds_schema.names, ds_schema.types)] +
        [pa.field(c, iv_types[c]) for c in interval_columns])

    I_START, I_END, I_KEY = '__i_start', '__i_end', '__i_key'
    iv_need = list(dict.fromkeys(
        [start_column, end_column] +
        ([interval_key] if interval_key else []) + interval_columns))
    refs = intervals.select_columns(iv_need).to_arrow_refs()
    cache_token = ('interval_join',) + tuple(r.hex() for r in refs)

    def build_intervals():
        tables = [_as_arrow(t) for t in ray.get(list(refs))]
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return None
        df = pa.concat_tables(tables).combine_chunks().to_pandas()
        ren = {start_column: I_START, end_column: I_END}
        if interval_key:
            ren[interval_key] = I_KEY
        # An interval column may double as the start/end/key column;
        # keep the original too in that case.
        for orig, internal in ren.items():
            df[internal] = df[orig]
        df = df[[I_START, I_END] + ([I_KEY] if interval_key else []) +
                interval_columns]
        df = df[df[I_START].notna() & df[I_END].notna()]
        if interval_key:
            df = df[df[I_KEY].notna()]
        return df

    lo_op, hi_op = closed_ops[closed]

    def join(batch: pa.Table) -> pa.Table:
        iv = _worker_cached(cache_token, build_intervals)
        lhs = batch.to_pandas()
        # Positional marker: keeps fully-duplicate left rows distinct in
        # the left-join anti-match (merge resets the index).
        lhs = lhs.copy()
        lhs['__pos'] = range(len(lhs))
        if iv is None or not len(lhs):
            matched = lhs.iloc[:0].copy()
            for c in interval_columns:
                matched[c] = None
        else:
            usable = lhs[point_column].notna()
            if key is not None:
                usable &= lhs[key].notna()
                cand = lhs[usable].merge(iv, left_on=key, right_on=I_KEY)
            else:
                cand = lhs[usable].merge(iv, how='cross')
            lo = getattr(cand[point_column], lo_op)(cand[I_START])
            hi = getattr(cand[point_column], hi_op)(cand[I_END])
            matched = cand[lo & hi]
        out = matched[left_names + interval_columns]
        if how == 'left':
            unmatched = lhs[~lhs['__pos'].isin(matched['__pos'])]
            unmatched = unmatched[left_names].copy()
            for c in interval_columns:
                unmatched[c] = None
            out = pd.concat([out, unmatched], ignore_index=True,
                            sort=False)
        # replace_schema_metadata(None): from_pandas attaches b'pandas'
        # metadata even with schema=, and this pyarrow build's Schema
        # hash chokes on it inside Ray's block-schema dedup.
        return pa.Table.from_pandas(out, schema=out_schema,
                                    preserve_index=False
                                    ).replace_schema_metadata(None)

    return ds.map_batches(join, batch_format='pyarrow')


def asof_join(left, right, left_on, right_on, left_by, right_by,
              right_columns, *, direction='backward', tolerance=None,
              how='left', tiebreak=None, num_buckets=None):
    """Per-key as-of join: match each left row to the single right row of
    the same by-key whose ``right_on`` is nearest ``left_on`` in the given
    ``direction`` ('backward' = greatest right_on <= left_on, 'forward' =
    smallest >= , 'nearest').

    The reference has no temporal operators; this is the standard
    enrichment step for event streams (attach the most recent dimension
    state as of each event's timestamp).

    Semantics/determinism:

    * Ties on ``right_on`` within a by-key are deterministic: the right
      side is stable-sorted by ``[right_on] + tiebreak`` (default
      tiebreak: ``right_columns`` order), so 'backward' picks the
      GREATEST tiebreak among equal ``right_on`` (the SQL window
      ``ROW_NUMBER() OVER (PARTITION BY ... ORDER BY right_on DESC,
      tiebreak DESC) = 1`` shape) and 'forward' the LEAST.
    * ``how='left'`` keeps unmatched left rows with null enrichment
      columns; ``'inner'`` drops them.  Null by-keys / null ``left_on``
      never match (SQL convention).
    * ``tolerance`` bounds the time gap: seconds when ``left_on`` is a
      timestamp, same units as the column otherwise.

    Scale: both sides exchange ONCE on a coarse hash bucket of the
    by-key (all rows of a key co-locate; ~4x-CPUs Ray groups keep the
    sort-aggregate overhead off the per-key cardinality).  Each bucket
    runs one vectorized ``pandas.merge_asof`` over time-sorted sides —
    O(n log n) per bucket, no per-key Python.  Skewed by-keys
    concentrate in one bucket; salt upstream if one key dominates."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..pipelines.constraints import _AddKeyBucket, _default_buckets

    if how not in ('inner', 'left'):
        raise ValueError("how must be 'inner' or 'left'")
    if direction not in ('backward', 'forward', 'nearest'):
        raise ValueError("direction must be backward|forward|nearest")
    num_buckets = num_buckets or _default_buckets()
    right_columns = list(right_columns)
    tiebreak = list(tiebreak if tiebreak is not None else right_columns)

    left_schema = left.schema()
    if left_schema is None:
        return left            # fully-empty left: nothing to join
    if right.schema() is None:
        # Fully-empty right side: inner yields nothing; left keeps every
        # left row with null-typed padding for the requested columns.
        if how == 'inner':
            return left.limit(0)

        def pad_left(b: pa.Table) -> pa.Table:
            for c in right_columns:
                if c not in b.schema.names:
                    b = b.append_column(c, pa.nulls(b.num_rows))
            return b

        return left.map_batches(pad_left, batch_format='pyarrow')
    left_names = list(left_schema.names)
    overlap = set(right_columns) & set(left_names)
    if overlap:
        raise ValueError(
            'right-side columns {} collide with left column names; rename '
            'before joining'.format(sorted(overlap)))
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_schema = right.schema()
    right_types = dict(zip(right_schema.names, right_schema.types))
    right_need = list(dict.fromkeys(
        [right_on, right_by] + right_columns + tiebreak))
    # Internal names for the right on/by so they never collide with left
    # columns (pandas merge_asof suffixing would be name-dependent).
    R_ON, R_BY = '__r_on', '__r_by'
    union_names = left_names + ['_side', R_ON, R_BY] + right_columns
    pad_types = dict(left_types)
    pad_types[R_ON] = right_types[right_on]
    pad_types[R_BY] = right_types[right_by]
    for c in right_columns:
        pad_types.setdefault(c, right_types[c])

    out_fields = [pa.field(n, left_types[n]) for n in left_names] + \
        [pa.field(c, right_types[c]) for c in right_columns]
    out_schema = pa.schema(out_fields)

    tol = tolerance
    if tol is not None and pa.types.is_timestamp(right_types[right_on]):
        tol = pd.Timedelta(seconds=tolerance)

    def tag_left(b: pa.Table) -> pa.Table:
        b = b.append_column('_side', pa.array(['L'] * b.num_rows))
        for c in [R_ON, R_BY] + right_columns:
            b = b.append_column(c, pa.nulls(b.num_rows, type=pad_types[c]))
        return b.select(union_names)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {R_ON: b.column(right_on), R_BY: b.column(right_by)}
        for c in right_columns:
            cols[c] = b.column(c)
        t = pa.table(cols)
        t = t.append_column('_side', pa.array(['R'] * t.num_rows))
        for c in left_names:
            t = t.append_column(c, pa.nulls(t.num_rows, type=pad_types[c]))
        return t.select(union_names)

    lt = left.map_batches(tag_left, batch_format='pyarrow').map_batches(
        _AddKeyBucket([left_by], num_buckets), batch_format='pyarrow')
    rt = right.select_columns(right_need).map_batches(
        tag_right, batch_format='pyarrow').map_batches(
        _AddKeyBucket([R_BY], num_buckets), batch_format='pyarrow')

    def merge(group: pa.Table) -> pa.Table:
        # Arrow-filter each side BEFORE pandas: padded null columns are
        # selected away per side, so int64 keys never see the other
        # side's nulls and degrade to float64.
        is_l = pc.equal(group.column('_side'), 'L')
        l = group.filter(is_l).select(left_names).combine_chunks()
        r = group.filter(pc.invert(is_l)).select(
            [R_ON, R_BY] + right_columns)
        r = r.filter(pc.and_kleene(pc.is_valid(r.column(R_ON)),
                                   pc.is_valid(r.column(R_BY))))
        # Ties on R_ON break on the GREATEST tiebreak for 'backward'
        # (merge_asof picks the last of equal on-keys); sorting in
        # Arrow keeps int64 tiebreak values exact.
        r = r.sort_by([(c, 'ascending') for c in [R_ON] + tiebreak]) \
             .combine_chunks()
        # Only (on, by, position) pass through pandas; every output
        # column is gathered from the Arrow sides by position, so
        # null-padding never float-coerces int64 values above 2^53.
        lhs = pd.DataFrame({
            '__on': l.column(left_on).to_pandas(),
            '__by': l.column(left_by).to_pandas(),
            '__lpos': np.arange(l.num_rows, dtype=np.int64)})
        match_ok = lhs['__on'].notna() & lhs['__by'].notna()
        lhs_null = lhs[~match_ok]
        lhs_v = lhs[match_ok].sort_values('__on', kind='mergesort')
        if r.num_rows:
            rhs = pd.DataFrame({
                R_ON: r.column(R_ON).to_pandas(),
                R_BY: r.column(R_BY).to_pandas(),
                '__rpos': np.arange(r.num_rows, dtype=np.int64)})
            # A left block that carried null keys converts to float64 in
            # pandas even after the nulls are filtered; re-align key
            # dtypes (merge_asof requires exact matches).
            for lc, rc in (('__on', R_ON), ('__by', R_BY)):
                if lhs_v[lc].dtype != rhs[rc].dtype:
                    try:
                        lhs_v[lc] = lhs_v[lc].astype(rhs[rc].dtype)
                    except (TypeError, ValueError):
                        rhs[rc] = rhs[rc].astype(lhs_v[lc].dtype)
            out = pd.merge_asof(
                lhs_v, rhs, left_on='__on', right_on=R_ON,
                left_by='__by', right_by=R_BY,
                direction=direction, tolerance=tol)
        else:
            out = lhs_v.copy()
            out['__rpos'] = np.nan
        if how == 'inner':
            out = out[out['__rpos'].notna()]
        else:
            out = pd.concat([out, lhs_null], ignore_index=True,
                            sort=False)
        lpos = pa.array(out['__lpos'].to_numpy(dtype=np.int64))
        rpos = pa.array(out['__rpos'], type=pa.int64(),
                        from_pandas=True)
        result = l.take(lpos)
        for c in right_columns:
            result = result.append_column(
                pa.field(c, right_types[c]),
                r.column(c).take(rpos).cast(right_types[c]))
        return result.cast(out_schema)

    return lt.union(rt).groupby('_bucket').map_groups(
        merge, batch_format='pyarrow')

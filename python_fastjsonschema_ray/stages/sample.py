"""Deterministic, resumable sampling for training-data curation.

``Dataset.random_sample`` is nondeterministic across re-runs; curation
pipelines need the SAME sample when a job resumes or an oracle re-runs.
Both operators here key the decision on a stable function of the ROW
KEY, so membership is reproducible on any cluster layout and
SQL-expressible for differential checking:

* ``deterministic_sample`` — keep rows where
  ``((key + salt) * KNUTH) mod modulus < fraction * modulus`` (Knuth's
  multiplicative hash; salt enters BEFORE the multiply so any salt
  change reshuffles the whole membership; |(key+salt) * KNUTH| must fit
  2^63, i.e. keys up to ~2^31 — use your own 64-bit pre-hash column
  beyond that).  Pure
  per-batch filter, no shuffle.
* ``stratified_sample_exact`` — exactly ``n`` rows per group, chosen by
  the same hash order (the grouped_topk machinery: only n rows per
  group per block shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KNUTH = 2654435761


def deterministic_sample(ds, key_column, fraction, *, modulus=1_000_000,
                         salt=0):
    """Keep ~``fraction`` of rows, membership decided by the row key
    alone.  Null keys are dropped (no stable identity to sample on)."""
    if not 0 <= fraction <= 1:
        raise ValueError('fraction must be in [0, 1]')
    threshold = int(fraction * modulus)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        k = batch.column(key_column).combine_chunks()
        vals = np.asarray(k.cast(pa.int64()).fill_null(-1), dtype=np.int64)
        with np.errstate(over='ignore'):
            h = ((vals + np.int64(salt)) * np.int64(KNUTH)) % np.int64(modulus)
        mask = (h < threshold) & ~np.asarray(pc.is_null(k))
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format='pyarrow')


def stratified_sample_exact(ds, group_columns, key_column, n, *, salt=0,
                            modulus=1_000_000_000, **topk_kwargs):
    """Exactly ``n`` rows per group (fewer when the group is smaller),
    deterministically chosen by hash order of the key with the key
    itself as tiebreak."""
    from ..pipelines.constraints import grouped_topk

    def rank(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch.column(key_column).combine_chunks()
                          .cast(pa.int64()).fill_null(-1), dtype=np.int64)
        with np.errstate(over='ignore'):
            h = ((vals + np.int64(salt)) * np.int64(KNUTH)) % np.int64(modulus)
        return batch.append_column('_sample_rank',
                                   pa.array(h, type=pa.int64()))

    ranked = ds.map_batches(rank, batch_format='pyarrow')
    out = grouped_topk(ranked, group_columns,
                       ['_sample_rank', key_column], n,
                       descending=[False, False], **topk_kwargs)
    return out.drop_columns(['_sample_rank'])

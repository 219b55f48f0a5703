"""Deduplication operators for training-data pipelines.

Shuffle discipline (the part that matters at 100 TB):

* **Exact dedup** — content hash per batch (vectorized) → hash-partitioned
  ``groupby(hash).map_groups(first)``.  One shuffle, key is the 64-bit
  content hash (uniform by construction, no skew).
* **MinHash-LSH near-dup** — per-batch vectorized shingle→minhash →
  explode to ``(band, band_hash, doc_id)`` rows (b rows per doc) →
  ``groupby(band, band_hash)`` → candidate pairs from multi-doc buckets →
  exact-Jaccard verification of candidates only.  The shuffle moves b
  small rows per doc, never the text; verification re-reads only candidate
  texts (carried through the bucket rows).
* **SimHash** — 64-bit signature, duplicates = identical signature bucket
  (or small Hamming radius via rotation tables).
* **Embedding near-dup** — random-hyperplane LSH bucket → exact cosine
  verify inside buckets.

All heavy per-doc work (hashing, shingling) is numpy-vectorized per
document with per-actor precomputed permutation tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.sketches import _hash_bytes_array, _splitmix64

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Vectorized rolling-hash values of all k-char shingles (uint64).

    Shingles are CODEPOINT windows (UTF-32 view), not UTF-8 byte
    windows: "character 5-gram" must mean the same thing for CJK or
    emoji text as for ASCII, and the SQL oracle's ``substr(t, i, 5)``
    counts codepoints.  The two coincide on ASCII."""
    data = np.frombuffer(text.lower().encode('utf-32-le'), dtype=np.uint32)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)), constant_values=32)
    windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    powers = np.power(np.uint64(257), np.arange(k, dtype=np.uint64))
    with np.errstate(over='ignore'):
        raw = (windows * powers).sum(axis=1)
    return np.unique(_splitmix64(raw))


_U64_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


class MinHasher:
    """MinHash signatures over shingle hashes.

    Default algorithm is **one-permutation hashing** (Li, Owen &
    Zhang 2012) with rotation densification (Shrivastava & Li 2014): each
    shingle hash lands in one of ``num_perm`` bins by its top bits and the
    per-bin minimum is the signature slot; empty bins borrow the next
    non-empty slot cyclically.  O(1) work per shingle instead of the
    classic k-perm O(num_perm) — the difference between ~3 and ~128 ops
    per corpus byte at 100 TB.  ``algo='kperm'`` keeps the classic
    universal-hash family for reference/comparison."""

    def __init__(self, num_perm: int = 128, seed: int = 1337,
                 algo: str = 'oph'):
        assert num_perm & (num_perm - 1) == 0, 'num_perm must be 2^k'
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.algo = algo
        self.shift = np.uint64(64 - int(np.log2(num_perm)))
        self.a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)

    @staticmethod
    def _densify(out2d: np.ndarray) -> np.ndarray:
        """Rotation densification: empty bins take the value of the next
        non-empty bin to the right (cyclic)."""
        empty = out2d == _U64_SENTINEL
        while empty.any():
            rolled = np.roll(out2d, -1, axis=1)
            out2d = np.where(empty, rolled, out2d)
            empty = out2d == _U64_SENTINEL
        return out2d

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """Scalar (single-document) reference path."""
        if len(shingles) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        if self.algo == 'kperm':
            with np.errstate(over='ignore'):
                h = (np.outer(self.a, shingles)
                     + self.b[:, None]) % _MERSENNE
            return h.min(axis=1)
        bins = (shingles >> self.shift).astype(np.int64)
        out = np.full(self.num_perm, _U64_SENTINEL, dtype=np.uint64)
        np.minimum.at(out, bins, shingles)
        return self._densify(out[None, :])[0]


def _batch_shingle_hashes(texts, k):
    """Shingle hashes for a whole batch in one numpy pass.

    Returns (hashes, seg_starts): ``hashes`` is every document's shingle
    hashes concatenated; document ``i``'s segment starts at
    ``seg_starts[i]``.  Identical values to per-doc ``_shingle_hashes``
    (without the per-doc unique — duplicates cannot change a min)."""
    bufs = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        # Codepoint windows (UTF-32 view), matching _shingle_hashes.
        data = t.lower().encode('utf-32-le')
        n_cp = len(data) // 4
        if n_cp < k:
            data = data + ' '.encode('utf-32-le') * (k - n_cp)
            n_cp = k
        bufs.append(np.frombuffer(data, dtype=np.uint32))
        lens[i] = n_cp
    if not bufs:
        return (np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64))
    all_bytes = np.concatenate(bufs)
    # int64 wraparound arithmetic: bit-identical to uint64 but this numpy
    # build's int64 multiply loop is ~12x faster than the uint64 one.
    windows = np.lib.stride_tricks.sliding_window_view(all_bytes, k) \
        .astype(np.int64)
    powers = np.power(np.uint64(257),
                      np.arange(k, dtype=np.uint64)).view(np.int64)
    with np.errstate(over='ignore'):
        raw = (windows * powers).sum(axis=1)
    hashes = _splitmix64(raw.view(np.uint64))
    # Drop windows that straddle document boundaries: doc i owns global
    # window positions [starts[i], starts[i] + lens[i] - k].
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    n_sh = lens - k + 1
    seg_starts = np.concatenate([[0], np.cumsum(n_sh)[:-1]])
    idx = (np.arange(int(n_sh.sum())) - np.repeat(seg_starts, n_sh)
           + np.repeat(starts, n_sh))
    return hashes[idx], seg_starts


class MinHashBandStage:
    """doc → b rows of (band, band_hash, id, text?) for the LSH groupby.

    Fully batch-vectorized: one rolling-hash pass over the batch's
    concatenated bytes, then per-permutation universal hashes min-reduced
    per document segment with ``np.minimum.reduceat`` (no per-document
    Python loop)."""

    def __init__(self, id_column, text_column, num_perm=128, bands=16,
                 shingle_k=5, carry_text=True, seed=1337):
        assert num_perm % bands == 0
        self.id_column = id_column
        self.text_column = text_column
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.carry_text = carry_text
        self.hasher = MinHasher(num_perm, seed)

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perm) minhash signatures for a list of texts.

        OPH batch path: one sort of (doc, bin) keys + one min-reduceat over
        ALL shingles in the batch — O(n log n) total, independent of
        num_perm.  The kperm path matches the classic scalar reference."""
        num_perm = self.hasher.num_perm
        hashes, seg_starts = _batch_shingle_hashes(texts, self.shingle_k)
        n_docs = len(seg_starts)
        if self.hasher.algo == 'kperm':
            return np.stack([
                self.hasher.signature(
                    hashes[s:e]) for s, e in zip(
                        seg_starts,
                        np.append(seg_starts[1:], len(hashes)))])
        n_sh = np.diff(np.append(seg_starts, len(hashes)))
        seg_ids = np.repeat(np.arange(n_docs, dtype=np.int64), n_sh)
        bins = (hashes >> self.hasher.shift).astype(np.int64)
        keys = seg_ids * num_perm + bins
        order = np.argsort(keys, kind='stable')
        ks = keys[order]
        hs = hashes[order]
        group_starts = np.concatenate(
            [[0], np.nonzero(np.diff(ks))[0] + 1])
        mins = np.minimum.reduceat(hs, group_starts)
        out = np.full(n_docs * num_perm, _U64_SENTINEL, dtype=np.uint64)
        out[ks[group_starts]] = mins
        out = out.reshape(n_docs, num_perm)
        # Docs with zero shingles cannot occur (_batch_shingle_hashes pads
        # to one window), so densification always terminates.
        return MinHasher._densify(out)

    def __call__(self, batch: pd.DataFrame):
        ids = batch[self.id_column].to_numpy()
        texts = batch[self.text_column].fillna('').tolist()
        if not texts:
            # Typed empty Arrow table (band triples are int64; id keeps
            # the input column's type) — metadata-free so downstream
            # schema dedup/union stay clean.
            data = {'band': pa.array([], type=pa.int64()),
                    'band_hash': pa.array([], type=pa.int64()),
                    self.id_column: pa.array(
                        [], type=pa.Array.from_pandas(
                            batch[self.id_column]).type)}
            if self.carry_text:
                data[self.text_column] = pa.array([], type=pa.string())
            return pa.table(data)
        r = self.rows_per_band
        sigs = self.signatures(texts)                       # (n, num_perm)
        grouped = sigs.reshape(len(texts), self.bands, r).view(np.int64)
        powers = np.power(np.uint64(1099511628211),
                          np.arange(r, dtype=np.uint64)).view(np.int64)
        with np.errstate(over='ignore'):
            band_hashes = _splitmix64(
                (grouped * powers).sum(axis=2).view(np.uint64))
        data = {
            'band': np.tile(np.arange(self.bands), len(texts)),
            'band_hash': band_hashes.reshape(-1).astype(np.int64),
            self.id_column: np.repeat(ids, self.bands),
        }
        if self.carry_text:
            data[self.text_column] = pa.array(np.repeat(
                batch[self.text_column].fillna('').to_numpy(), self.bands))
        # Arrow out from numpy — no pandas schema metadata (unhashable in
        # this pyarrow build, trips Ray's block-schema dedup).
        return pa.table(data)


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    a = set(_shingle_hashes(text_a, k).tolist())
    b = set(_shingle_hashes(text_b, k).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / max(len(a | b), 1)



def _as_arrow(block) -> pa.Table:
    # to_arrow_refs can surface pandas blocks as-is; normalize.
    return (block if isinstance(block, pa.Table)
            else pa.Table.from_pandas(block, preserve_index=False))

_WORKER_CACHE: dict = {}


def _worker_cached(key, builder):
    """Per-worker-process broadcast cache: plain-TASK map_batches functions
    call this so the ray.get + build happens once per worker, without the
    spin-up cost and fixed sizing of an actor pool."""
    val = _WORKER_CACHE.get(key)
    if val is None:
        if len(_WORKER_CACHE) > 8:
            _WORKER_CACHE.clear()
        val = _WORKER_CACHE[key] = builder()
    return val


def _keys_from_refs(refs):
    import ray

    def build():
        tables = [_as_arrow(t) for t in ray.get(list(refs))]
        chunks = [t.column(0).combine_chunks() for t in tables if len(t)]
        return pa.concat_arrays(chunks) if chunks else None

    return _worker_cached(('keys',) + tuple(r.hex() for r in refs), build)


def _textmap_from_refs(refs, id_column, text_column):
    import ray

    def build():
        text_of = {}
        for t in (_as_arrow(x) for x in ray.get(list(refs))):
            # Materialized empty blocks can be SCHEMALESS (zero columns
            # — seen from parquet-read lineage); skip rather than crash.
            if not t.num_rows or id_column not in t.schema.names:
                continue
            text_of.update(zip(t.column(id_column).to_pylist(),
                               t.column(text_column).to_pylist()))
        return text_of, {}          # (id → text, shingle cache)

    return _worker_cached(('texts',) + tuple(r.hex() for r in refs), build)


def _bucket_col(arr, num_buckets) -> pa.Array:
    from ..state.sketches import hash64_array
    h = hash64_array(arr.combine_chunks() if hasattr(arr, 'combine_chunks')
                     else arr)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int64))


def minhash_duplicate_pairs(ds, id_column, text_column, *, threshold=0.8,
                            num_perm=128, bands=16, shingle_k=5,
                            concurrency=None, num_buckets=None,
                            broadcast_text_limit=1 << 30, coalesce=True):
    """Near-duplicate pairs via MinHash-LSH: returns a Dataset of
    (id_a, id_b, jaccard) with id_a < id_b and exact shingle-Jaccard ≥
    threshold.

    Shuffle discipline: only (band, band_hash, id) triples move through the
    LSH groupby — never the text (b small rows per doc); the groupby key is
    the band id (``bands`` coarse groups) with vectorized in-group
    bucketing.
    Verification is fully distributed: candidate texts are selected by an
    object-store-broadcast id semi-join (ids only — never texts — touch
    the driver, and only as ObjectRefs), then joined to the pairs with two
    hash-bucketed co-groups (by id_a, then id_b), so the exchanges move
    candidate pairs + candidate texts only — both proportional to the dup
    rate, not the corpus.

    ``bands=16`` (r=8 rows/band) keeps the candidate rate sane: a pair
    at similarity s collides with probability 1-(1-s**r)**bands, i.e.
    ~95% at s=0.8 but only ~6% at s=0.5 (r=4 would pass ~87% of
    0.5-similar pairs - a candidate explosion at corpus scale).  More
    bands => higher recall at the threshold AND more candidates.  NOTE:
    this default changed from bands=32/r=4 (which had ~100% recall at
    s=0.8 exactly); recall-sensitive small corpora can pass bands=32
    explicitly to restore it."""
    stage = MinHashBandStage(id_column, text_column, num_perm, bands,
                             shingle_k, carry_text=False)
    kwargs = {'batch_format': 'pandas'}
    if concurrency:
        kwargs['concurrency'] = concurrency
    banded = ds.select_columns([id_column, text_column]).map_batches(
        stage, **kwargs)
    if coalesce:
        # The band triples are tiny ((id, band, band_hash) x bands rows per
        # doc) while the LSH groupby's sort fixed cost is TASK-count-driven:
        # merge the many signature blocks to ~cpus/4 before the shuffle.
        # Disable at extreme corpus scale where a coalesced block would
        # exceed the target block size.
        from ..pipelines.constraints import _default_buckets
        banded = banded.repartition(_default_buckets() // 8 or 1)

    def band_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # One group = one whole band (32 groups total): bucket by band_hash
        # inside the group with vectorized pandas/numpy, avoiding per-bucket
        # map_groups overhead across hundreds of thousands of tiny buckets.
        g = group.sort_values(['band_hash', id_column])
        hashes = g['band_hash'].to_numpy()
        ids = g[id_column].to_numpy()
        boundaries = np.nonzero(np.diff(hashes))[0] + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [len(hashes)]])
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            bucket = np.unique(ids[s:e])
            n = len(bucket)
            if n < 2:
                continue
            ii, jj = np.triu_indices(n, k=1)
            out_a.append(bucket[ii])
            out_b.append(bucket[jj])
        # Arrow out (from numpy, no pandas metadata): typed empties stay
        # typed AND Ray's block-schema dedup can hash the schema (pandas
        # metadata makes pa.Schema unhashable in this pyarrow build).
        if not out_a:
            empty = np.array([], dtype=ids.dtype)
            return pa.table({'id_a': empty, 'id_b': empty})
        return pa.table({'id_a': np.concatenate(out_a),
                         'id_b': np.concatenate(out_b)})

    candidate_pairs = banded.groupby('band').map_groups(
        band_pairs, batch_format='pandas')
    # Materialize the candidate PAIRS (∝ dup rate, not corpus) so the
    # expensive LSH lineage runs once while the pairs feed two consumers
    # (the id semi-join and the co-group join).  Blocks stay in the object
    # store; the driver holds refs only.
    pairs_m = candidate_pairs.materialize()
    return _verify_candidate_pairs(
        ds, pairs_m, id_column, text_column, threshold=threshold,
        shingle_k=shingle_k, num_buckets=num_buckets,
        broadcast_text_limit=broadcast_text_limit)


def _verify_candidate_pairs(ds, pairs_m, id_column, text_column, *,
                            threshold, shingle_k, num_buckets,
                            broadcast_text_limit):
    """Exact-Jaccard verification of a materialized candidate-pair set
    against the corpus ``ds``: returns (id_a, id_b, jaccard) for the
    candidates whose exact shingle Jaccard ≥ ``threshold``.

    Shared tail of every near-dup candidate generator (MinHash-LSH
    banding, AllPairs prefix filtering): candidate texts are selected by
    an object-store-broadcast id semi-join (ids only — never texts —
    touch the driver, and only as ObjectRefs), then either verified in
    one broadcast map_batches (small candidate sets, gated by
    ``broadcast_text_limit``) or joined to the pairs with two
    hash-bucketed co-groups (by id_a, then id_b) so the exchanges move
    candidate pairs + candidate texts only — both proportional to the
    dup rate, not the corpus."""
    import ray
    import ray.data

    if num_buckets is None:
        num_buckets = max(
            32, 2 * int(ray.cluster_resources().get('CPU', 8)))
    # The authoritative id type comes from a non-empty pairs block (empty
    # blocks from pandas map_groups carry a fake float64 schema; a
    # pandas-backed input Dataset reports numpy dtypes, not Arrow types).
    id_type = None
    for ref in pairs_m.to_arrow_refs():
        t = _as_arrow(ray.get(ref))
        if t.num_rows and 'id_a' in t.schema.names:
            id_type = t.schema.field('id_a').type
            break
    if id_type is None:
        _sch = ds.schema()
        schema_t = (dict(zip(_sch.names, _sch.types)).get(id_column)
                    if _sch is not None else None)
        if isinstance(schema_t, pa.DataType):
            id_type = schema_t
        else:
            try:
                id_type = pa.from_numpy_dtype(schema_t)
            except Exception:
                id_type = pa.string()
    if pairs_m.count() == 0:
        return ray.data.from_arrow(pa.table({
            'id_a': pa.array([], type=id_type),
            'id_b': pa.array([], type=id_type),
            'jaccard': pa.array([], type=pa.float64())}))  # schema-stable empty

    def ids_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # Cast defensively: empty pandas blocks surface float64 id columns
        # which would otherwise poison Arrow type promotion downstream.
        both = pa.concat_arrays([
            batch.column('id_a').combine_chunks().cast(id_type),
            batch.column('id_b').combine_chunks().cast(id_type)])
        return pa.table({id_column: pc.unique(both)})

    id_refs = pairs_m.map_batches(
        ids_only, batch_format='pyarrow').to_arrow_refs()

    n_cpus = max(1, int(ray.cluster_resources().get('CPU', 2)) // 2)

    def semi(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keys = _keys_from_refs(id_refs)
        sub = batch.select([id_column, text_column])
        if keys is None:
            return sub.slice(0, 0)
        hit = pc.is_in(sub.column(id_column), value_set=keys)
        if hit.null_count:
            hit = hit.fill_null(False)
        return sub.filter(hit)

    texts_cand = ds.map_batches(semi, batch_format='pyarrow')
    # Candidate texts feed BOTH co-group phases: materialize (∝ dup rate)
    # so the corpus semi-join scan runs once, blocks in the object store.
    texts_cand = texts_cand.materialize()

    # Fast path: when the candidate texts fit comfortably in a worker's
    # object store, broadcast them as refs and verify in ONE map_batches
    # over the pairs — the two bucketed co-group shuffles below each cost
    # seconds of fixed sort overhead that dwarfs small candidate sets.
    # The co-group path takes over past the gate (candidate texts at a
    # 100 TB / high-dup-rate corpus outgrow a single node's store).
    if texts_cand.size_bytes() <= broadcast_text_limit:
        text_refs = texts_cand.to_arrow_refs()

        def dedup_pairs(batch: pa.Table) -> pa.Table:
            return pa.table({
                'id_a': batch.column('id_a').combine_chunks().cast(id_type),
                'id_b': batch.column('id_b').combine_chunks().cast(id_type),
            }).group_by(['id_a', 'id_b']).aggregate([])

        if pairs_m.count() <= 1_000_000:
            # One block for the cross-generator dedup (pair set small),
            # then spread verification back over the pool.
            unique_pairs = pairs_m.repartition(1).map_batches(
                dedup_pairs, batch_format='pyarrow')
        else:
            # Large candidate sets (prefix filtering on low-entropy
            # corpora): dedup distributed — bucket by id_a (all copies
            # of a pair share id_a, so per-bucket dedup is global) and
            # collapse each bucket with one Arrow group_by.
            def add_pair_bucket(batch: pa.Table) -> pa.Table:
                t = dedup_pairs(batch)    # per-block pre-dedup + cast
                return t.append_column(
                    '_bucket', _bucket_col(t.column('id_a'), num_buckets))

            unique_pairs = pairs_m.map_batches(
                add_pair_bucket, batch_format='pyarrow') \
                .groupby('_bucket').map_groups(
                    lambda g: g.select(['id_a', 'id_b'])
                    .group_by(['id_a', 'id_b']).aggregate([]),
                    batch_format='pyarrow')

        def broadcast_verify(batch: pa.Table) -> pa.Table:
            text_of, cache = _textmap_from_refs(text_refs, id_column,
                                                text_column)

            def sh(doc_id):
                s = cache.get(doc_id)
                if s is None:
                    s = cache[doc_id] = _shingle_hashes(
                        text_of.get(doc_id) or '', shingle_k)
                return s

            keep, out_j = [], []
            ids_a = batch.column('id_a').to_pylist()
            ids_b = batch.column('id_b').to_pylist()
            for i, (a, b) in enumerate(zip(ids_a, ids_b)):
                sa, sb = sh(a), sh(b)
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                sim = inter / union if union else 1.0
                if sim >= threshold:
                    keep.append(i)
                    # raw double, not rounded: int/int division is
                    # bit-identical to any SQL oracle computing the same
                    # ratio, while pre-rounding can diverge from the
                    # oracle at exact .5e-6 ties (banker's vs half-away)
                    out_j.append(sim)
            taken = batch.take(pa.array(keep, type=pa.int64()))
            return pa.table({'id_a': taken.column('id_a'),
                             'id_b': taken.column('id_b'),
                             'jaccard': pa.array(out_j, type=pa.float64())})

        return unique_pairs.map_batches(
            broadcast_verify, batch_format='pyarrow', batch_size=8192)

    # Two-phase bucketed co-group join: attach text_a (bucket by id_a),
    # then text_b (bucket by id_b) + exact-Jaccard verify.  Union schema:
    # (_bucket, _side, id_a, id_b, text_a?, text).
    def tag_pairs_a(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        id_a = batch.column('id_a').combine_chunks().cast(id_type)
        id_b = batch.column('id_b').combine_chunks().cast(id_type)
        return pa.table({
            '_bucket': _bucket_col(id_a, num_buckets),
            '_side': pa.array(['P'] * n, type=pa.string()),
            'id_a': id_a,
            'id_b': id_b,
            'text': pa.nulls(n, type=pa.string()),
        })

    def tag_texts(batch: pa.Table, join_col) -> pa.Table:
        n = batch.num_rows
        ids = batch.column(id_column)
        cols = {
            '_bucket': _bucket_col(ids, num_buckets),
            '_side': pa.array(['T'] * n, type=pa.string()),
            'id_a': ids if join_col == 'id_a' else pa.nulls(n, type=ids.type),
            'id_b': ids if join_col == 'id_b' else pa.nulls(n, type=ids.type),
            'text': batch.column(text_column).cast(pa.string()),
        }
        return pa.table(cols)

    phase1 = pairs_m.map_batches(tag_pairs_a, batch_format='pyarrow').union(
        texts_cand.map_batches(lambda b: tag_texts(b, 'id_a'),
                               batch_format='pyarrow'))

    def join_a(group: pa.Table) -> pa.Table:
        # Arrow end to end: a pandas group would coerce the nullable int id
        # columns to float64, silently changing the bucket hashes.
        import pyarrow.compute as pc
        tmask = pc.equal(group.column('_side'), 'T')
        t = group.filter(tmask)
        p = group.filter(pc.invert(tmask))
        p = p.select(['id_a', 'id_b']).group_by(['id_a', 'id_b']) \
            .aggregate([])  # cross-band pair dedup
        text_of = dict(zip(t.column('id_a').to_pylist(),
                           t.column('text').to_pylist()))
        texts = [text_of.get(i) for i in p.column('id_a').to_pylist()]
        return pa.table({'id_a': p.column('id_a'),
                         'id_b': p.column('id_b'),
                         'text_a': pa.array(texts, type=pa.string())})

    with_text_a = phase1.groupby('_bucket').map_groups(
        join_a, batch_format='pyarrow')

    def tag_pairs_b(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        id_a = batch.column('id_a').combine_chunks().cast(id_type)
        id_b = batch.column('id_b').combine_chunks().cast(id_type)
        return pa.table({
            '_bucket': _bucket_col(id_b, num_buckets),
            '_side': pa.array(['P'] * n, type=pa.string()),
            'id_a': id_a,
            'id_b': id_b,
            'text_a': batch.column('text_a').combine_chunks()
            .cast(pa.string()),
            'text': pa.nulls(n, type=pa.string()),
        })

    def tag_texts_b(batch: pa.Table) -> pa.Table:
        t = tag_texts(batch, 'id_b')
        return t.add_column(4, 'text_a',
                            pa.nulls(t.num_rows, type=pa.string()))

    phase2 = with_text_a.map_batches(
        tag_pairs_b, batch_format='pyarrow').union(
        texts_cand.map_batches(tag_texts_b, batch_format='pyarrow'))

    def verify(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        tmask = pc.equal(group.column('_side'), 'T')
        t = group.filter(tmask)
        p = group.filter(pc.invert(tmask))
        text_of = dict(zip(t.column('id_b').to_pylist(),
                           t.column('text').to_pylist()))
        cache = {}

        def shingles(doc_id, text):
            s = cache.get(doc_id)
            if s is None:
                s = cache[doc_id] = _shingle_hashes(text or '', shingle_k)
            return s

        keep, out_j = [], []
        ids_a = p.column('id_a').to_pylist()
        ids_b = p.column('id_b').to_pylist()
        for i, (a, b, ta) in enumerate(zip(ids_a, ids_b,
                                           p.column('text_a').to_pylist())):
            sa = shingles(a, ta)
            sb = shingles(b, text_of.get(b))
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            sim = inter / union if union else 1.0
            if sim >= threshold:
                keep.append(i)
                out_j.append(sim)      # raw double — see broadcast_verify
        taken = p.take(pa.array(keep, type=pa.int64()))
        return pa.table({'id_a': taken.column('id_a'),
                         'id_b': taken.column('id_b'),
                         'jaccard': pa.array(out_j, type=pa.float64())})

    return phase2.groupby('_bucket').map_groups(verify, batch_format='pyarrow')


class ShingleExplodeStage:
    """doc → one row per DISTINCT shingle hash: (id, sh, n) where ``n`` is
    the document's distinct-shingle count, carried on every row so no
    later size join is needed.  Fully batch-vectorized: one rolling-hash
    pass over the batch's concatenated bytes (``_batch_shingle_hashes``),
    then per-document distinct via a single lexsort + run mask."""

    def __init__(self, id_column, text_column, shingle_k=5):
        self.id_column = id_column
        self.text_column = text_column
        self.k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_column].fillna('').tolist()
        ids = batch[self.id_column].to_numpy()
        hashes, seg_starts = _batch_shingle_hashes(texts, self.k)
        total = len(hashes)
        if total == 0:
            return pd.DataFrame({self.id_column: ids[:0],
                                 'sh': np.array([], dtype=np.int64),
                                 'n': np.array([], dtype=np.int64)})
        counts = np.diff(np.append(seg_starts, total))
        doc_idx = np.repeat(np.arange(len(texts)), counts)
        # int64 view: same distinctness as uint64, SIMD-fast sort path.
        h = hashes.view(np.int64)
        order = np.lexsort((h, doc_idx))
        hs, dxs = h[order], doc_idx[order]
        first = np.empty(total, dtype=bool)
        first[0] = True
        first[1:] = (hs[1:] != hs[:-1]) | (dxs[1:] != dxs[:-1])
        hs, dxs = hs[first], dxs[first]
        n_per_doc = np.bincount(dxs, minlength=len(texts))
        return pd.DataFrame({self.id_column: ids[dxs],
                             'sh': hs,
                             'n': n_per_doc[dxs].astype(np.int64)})


def ngram_jaccard_pairs(ds, id_column, text_column, *, threshold=0.8,
                        shingle_k=5, num_buckets=None, concurrency=None,
                        coalesce=True, broadcast_text_limit=1 << 30):
    """EXACT character-n-gram Jaccard near-duplicate pairs: every
    (id_a, id_b, jaccard) with id_a < id_b and distinct-shingle Jaccard
    ≥ ``threshold`` — no LSH approximation, exact recall.

    Candidate generation is AllPairs/PPJoin-style prefix filtering
    (Bayardo, Ma & Srikant WWW'07; Xiao et al. WWW'08): under ANY global
    total order on shingles, two sets with J ≥ t must share one of their
    first ``|X| - ceil(t·|X|) + 1`` shingles (the smallest common shingle
    sits inside both prefixes by pigeonhole), so only that ~(1-t)
    fraction of each document is indexed.  Ordering shingles by
    ascending document frequency keeps stop-shingles — which every
    document shares — OUT of every prefix: candidate volume stays ∝ the
    near-dup rate instead of the full O(Σ df²) inverted-index blowup.

    Three hash-bucketed exchanges, each moving (id, shingle-hash) tuples
    only — never text: (1) per-shingle document frequency (all rows of a
    shingle co-locate in its bucket, so df is a local group size), (2)
    per-document prefix selection (sort by the global (df, sh) order,
    keep the first p), (3) prefix-token pair generation.  Exact
    verification reuses the distributed broadcast/co-group tail shared
    with ``minhash_duplicate_pairs``.  Cost grows with (1-t): below
    t≈0.5 prefixes stop excluding much — use MinHash-LSH there.
    """
    import ray

    if num_buckets is None:
        num_buckets = max(
            32, 2 * int(ray.cluster_resources().get('CPU', 8)))
    kwargs = {'batch_format': 'pandas'}
    if concurrency:
        kwargs['concurrency'] = concurrency
    exploded = ds.select_columns([id_column, text_column]).map_batches(
        ShingleExplodeStage(id_column, text_column, shingle_k), **kwargs)
    if coalesce:
        # Sort-shuffle fixed cost is task-count-driven; merge the many
        # explode blocks before the first bucket groupby.
        from ..pipelines.constraints import _default_buckets
        exploded = exploded.repartition(_default_buckets() // 8 or 1)

    def add_sh_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            '_bucket', _bucket_col(batch.column('sh'), num_buckets))

    def with_df(group: pd.DataFrame) -> pd.DataFrame:
        out = group[[id_column, 'sh', 'n']].copy()
        out['df'] = group.groupby('sh', sort=False)['sh'] \
            .transform('size').to_numpy()
        return out

    withdf = exploded.map_batches(add_sh_bucket, batch_format='pyarrow') \
        .groupby('_bucket').map_groups(with_df, batch_format='pandas')

    def add_id_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            '_bucket', _bucket_col(batch.column(id_column), num_buckets))

    def prefixes(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([id_column, 'df', 'sh'])
        rank = g.groupby(id_column, sort=False).cumcount().to_numpy()
        n = g['n'].to_numpy()
        # ceil with a tiny slack DOWN so float error can only ENLARGE
        # the prefix (larger stays correct; smaller would lose pairs).
        p = n - np.ceil(threshold * n - 1e-9).astype(np.int64) + 1
        out = g.loc[rank < p, [id_column, 'sh', 'n']].copy()
        out['rank'] = rank[rank < p]
        return out

    prefix_rows = withdf.map_batches(add_id_bucket, batch_format='pyarrow') \
        .groupby('_bucket').map_groups(prefixes, batch_format='pandas')

    def token_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # One group = one bucket of prefix tokens: runs of equal sh give
        # each token's posting list; emit its C(n,2) id pairs, pruned by
        # the PPJoin length filter (min(n) ≥ t·max(n)) and position
        # filter (overlap upper bound min(nA-rA, nB-rB) + min(rA, rB)
        # must reach α = ceil(t/(1+t)·(nA+nB))) — both sound for every
        # shared token, so no true pair is lost.
        g = group.sort_values(['sh', id_column])
        shs = g['sh'].to_numpy()
        ids = g[id_column].to_numpy()
        ns = g['n'].to_numpy()
        rs = g['rank'].to_numpy()
        boundaries = np.nonzero(shs[1:] != shs[:-1])[0] + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [len(shs)]])
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            m = e - s
            ii, jj = np.triu_indices(m, k=1)
            na, nb = ns[s:e][ii], ns[s:e][jj]
            ra, rb = rs[s:e][ii], rs[s:e][jj]
            alpha = np.ceil(
                threshold / (1 + threshold) * (na + nb) - 1e-9)
            keep = (
                (np.minimum(na, nb) >=
                 threshold * np.maximum(na, nb) - 1e-9)
                & (np.minimum(na - ra, nb - rb)
                   + np.minimum(ra, rb) >= alpha))
            if keep.any():
                out_a.append(ids[s:e][ii[keep]])
                out_b.append(ids[s:e][jj[keep]])
        # Arrow out (from numpy, no pandas metadata): typed empties stay
        # typed AND Ray's block-schema dedup can hash the schema (pandas
        # metadata makes pa.Schema unhashable in this pyarrow build).
        if not out_a:
            empty = np.array([], dtype=ids.dtype)
            return pa.table({'id_a': empty, 'id_b': empty})
        return pa.table({'id_a': np.concatenate(out_a),
                         'id_b': np.concatenate(out_b)})

    candidate_pairs = prefix_rows.map_batches(
        add_sh_bucket, batch_format='pyarrow') \
        .groupby('_bucket').map_groups(token_pairs, batch_format='pandas')
    pairs_m = candidate_pairs.materialize()
    return _verify_candidate_pairs(
        ds, pairs_m, id_column, text_column, threshold=threshold,
        shingle_k=shingle_k, num_buckets=num_buckets,
        broadcast_text_limit=broadcast_text_limit)


def dedup_minhash(ds, id_column, text_column, transitive=False, **kwargs):
    """Near-dup removal: drop the higher id of every duplicate pair, or —
    with ``transitive=True`` — collapse each CONNECTED COMPONENT of the
    pair graph to its minimum id (a chain a~b~c keeps only a, even when
    a and c are not pairwise similar).  Pair-wise removal is the standard
    first-order policy at threshold ≥0.8; transitive collapse is the
    cluster-level policy (see stages/components.py).

    The loser-id set is broadcast as object-store refs (ids only, one
    8-byte value per duplicate) — the driver and worker heaps never hold
    texts or the full pair set."""
    import ray
    import pyarrow.compute as pc

    pairs = minhash_duplicate_pairs(ds, id_column, text_column, **kwargs)

    if transitive:
        from .components import connected_components
        comp = connected_components(pairs)

        def losers_only(batch: pa.Table) -> pa.Table:
            keep = pc.not_equal(batch.column('id'),
                                batch.column('component_id'))
            return pa.table({id_column: batch.filter(keep).column('id')})

        loser_src = comp
    else:
        def losers_only(batch: pa.Table) -> pa.Table:
            return pa.table(
                {id_column: pc.unique(batch.column('id_b').combine_chunks())})

        loser_src = pairs

    loser_refs = loser_src.map_batches(
        losers_only, batch_format='pyarrow').to_arrow_refs()
    if sum(len(ray.get(r)) for r in loser_refs) == 0:
        return ds

    def drop(batch: pa.Table) -> pa.Table:
        keys = _keys_from_refs(loser_refs)
        if keys is None:
            return batch
        hit = pc.is_in(batch.column(id_column), value_set=keys)
        if hit.null_count:
            hit = hit.fill_null(False)
        return batch.filter(pc.invert(hit))

    return ds.map_batches(drop, batch_format='pyarrow')


# ---------------------------------------------------------------------------
# SimHash


class SimHashStage:
    """64-bit SimHash over whitespace tokens, batch-vectorized.

    Per batch: tokenize once, factorize to the batch's UNIQUE tokens
    (blake2b hashed once each, per-actor cache amortizes across batches),
    unpack each unique hash to a (U, 64) bit matrix, then segment-sum the
    per-occurrence bit rows per document (64 ``np.bincount`` passes) —
    vote[d, i] = 2·ones[d, i] − n_tokens[d], bit i set iff vote > 0.
    No per-document Python; the only per-unique-token loop is the hash
    cache probe."""

    def __init__(self, id_column, text_column):
        self.id_column = id_column
        self.text_column = text_column
        self._cache = {}

    def _token_hash(self, token: str) -> np.uint64:
        h = self._cache.get(token)
        if h is None:
            h = self._cache[token] = _hash_bytes_array([token])[0]
            if len(self._cache) > 1_000_000:
                self._cache.clear()
        return h

    def _unique_hashes(self, uniques) -> np.ndarray:
        cache = self._cache
        missing = [t for t in uniques if t not in cache]
        if missing:
            hashed = _hash_bytes_array(missing)
            if len(cache) + len(missing) > 1_000_000:
                cache.clear()
            cache.update(zip(missing, hashed))
        return np.fromiter((cache[t] for t in uniques), dtype=np.uint64,
                           count=len(uniques))

    def simhash(self, text: str) -> int:
        """Scalar reference path (tests assert batch ≡ scalar)."""
        tokens = text.lower().split()
        if not tokens:
            return 0
        hashes = np.array([self._token_hash(t) for t in tokens],
                          dtype=np.uint64)
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64))
                & np.uint64(1)).astype(np.int64)
        vote = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for i in np.nonzero(vote > 0)[0]:
            sig |= np.uint64(1) << np.uint64(i)
        return int(sig.astype(np.int64))

    def simhash_batch(self, texts) -> np.ndarray:
        """Vectorized kernel: int64 signatures for a sequence of texts."""
        tok_lists = [t.lower().split() for t in texts]
        n = len(tok_lists)
        counts = np.fromiter(map(len, tok_lists), dtype=np.int64, count=n)
        sigs = np.zeros(n, dtype=np.int64)
        total = int(counts.sum())
        if not total:
            return sigs
        flat = np.empty(total, dtype=object)
        pos = 0
        for toks in tok_lists:
            flat[pos:pos + len(toks)] = toks
            pos += len(toks)
        codes, uniques = pd.factorize(flat)
        uh = self._unique_hashes(uniques)
        # One small gather of the 64-bit hashes per occurrence, then a
        # per-bit prefix-sum segmented reduction: ones[d, i] =
        # csum_i[end_d] - csum_i[start_d].  int64 cumsum is the one fast
        # segmented primitive on this numpy build (add.reduceat and a
        # (tokens, 64) gather+bincount both measured 3-25x slower).
        h_occ = uh.view(np.int64)[codes]
        hb = h_occ.view(np.uint8).reshape(-1, 8)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        ends = starts[1:]
        csum = np.empty(total + 1, dtype=np.int64)
        csum[0] = 0
        ones = np.empty((n, 64), dtype=np.int64)
        for j in range(8):
            col = hb[:, j]
            for k in range(8):
                np.cumsum((col >> k) & 1, dtype=np.int64, out=csum[1:])
                ones[:, j * 8 + k] = csum[ends] - csum[starts[:-1]]
        votes = 2 * ones - counts[:, None]
        packed = np.packbits((votes > 0).astype(np.uint8), axis=1,
                             bitorder='little')
        sigs[:] = packed.view(np.uint64).ravel().view(np.int64)
        sigs[counts == 0] = 0
        return sigs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch['simhash'] = self.simhash_batch(
            batch[self.text_column].fillna('').tolist())
        return batch


def simhash_buckets(ds, id_column, text_column, *, concurrency=None):
    """Groups of documents sharing an identical 64-bit SimHash.

    Signatures are near-unique per document, so a raw
    ``groupby('simhash')`` would be a per-distinct-key sort-aggregate
    (~0.5 ms/group).  Instead the duplicate count reuses the
    check_unique shape: per-batch value_counts partials, then a
    coarse-bucket fold — ≤1 row per distinct signature per block ever
    shuffles."""
    from ..pipelines.constraints import check_unique

    kwargs = {'batch_format': 'pandas'}
    if concurrency:
        kwargs['concurrency'] = concurrency
    sigs = ds.select_columns([id_column, text_column]).map_batches(
        SimHashStage(id_column, text_column), **kwargs)
    dup_sigs = check_unique(sigs.select_columns(['simhash']), ['simhash'])
    return sigs, dup_sigs


# ---------------------------------------------------------------------------
# Embedding near-dup (cosine)


class HyperplaneLSHStage:
    """Random-hyperplane bucket id for unit-normalized embeddings."""

    def __init__(self, embedding_column, dim, n_planes=16, seed=7):
        rng = np.random.default_rng(seed)
        self.embedding_column = embedding_column
        self.planes = rng.standard_normal((dim, n_planes))
        self.weights = (1 << np.arange(n_planes)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.arrowutil import (drop_null_embeddings,
                                           embedding_matrix)
        batch = drop_null_embeddings(batch, self.embedding_column)
        if batch.num_rows == 0:
            return batch.append_column('bucket',
                                       pa.array([], type=pa.int64()))
        emb = embedding_matrix(batch.column(self.embedding_column))
        signs = (emb @ self.planes) > 0
        bucket = (signs * self.weights).sum(axis=1)
        return batch.append_column('bucket', pa.array(bucket, type=pa.int64()))


def _cosine_pairs_tiled(unit, threshold, tile=2048):
    """All (i, j, cos) with j > i and cos >= threshold over a unit-row
    matrix, in ``tile``x``tile`` BLAS blocks: a hot bucket of n vectors
    costs O(n^2 d) matmul FLOPs but never materializes the full n x n
    similarity matrix (peak extra memory = one tile^2 float64 block,
    ~32 MB at the default) and emits pairs via np.nonzero — zero
    per-pair Python."""
    n = len(unit)
    out_i, out_j, out_c = [], [], []
    for s in range(0, n, tile):
        a = unit[s:s + tile]
        for t in range(s, n, tile):
            blk = a @ unit[t:t + tile].T
            ii, jj = np.nonzero(blk >= threshold)
            gi = ii + s
            gj = jj + t
            keep = gj > gi
            if keep.any():
                out_i.append(gi[keep])
                out_j.append(gj[keep])
                out_c.append(blk[ii[keep], jj[keep]])
    if not out_i:
        z = np.empty(0, dtype=np.int64)
        return z, z, np.empty(0, dtype=np.float64)
    return (np.concatenate(out_i), np.concatenate(out_j),
            np.concatenate(out_c))


def embedding_duplicate_pairs(ds, id_column, embedding_column, dim, *,
                              threshold=0.95, n_planes=12, concurrency=None):
    """Near-identical embeddings: hyperplane-LSH bucket → exact cosine
    verification within buckets.  (High thresholds ⇒ near-identical vectors
    ⇒ same bucket with high probability; raise recall by lowering
    n_planes.)

    Hot buckets (e.g. many near-zero vectors landing in one hyperplane
    cell) verify in tiled BLAS blocks (:func:`_cosine_pairs_tiled`):
    O(n^2 d) FLOPs but bounded memory and no per-pair Python — 10k
    identical-bucket vectors verify in well under a second."""
    kwargs = {'batch_format': 'pyarrow'}
    if concurrency:
        kwargs['concurrency'] = concurrency
    bucketed = ds.select_columns([id_column, embedding_column]).map_batches(
        HyperplaneLSHStage(embedding_column, dim, n_planes), **kwargs)

    _schema = ds.schema()
    id_type = (dict(zip(_schema.names, _schema.types)).get(id_column)
               if _schema is not None else None)
    if not isinstance(id_type, pa.DataType):
        id_type = pa.string()  # fully-empty input: no pairs anyway
    empty = pa.table({'id_a': pa.nulls(0, id_type),
                      'id_b': pa.nulls(0, id_type),
                      'cosine': pa.nulls(0, pa.float64())})

    def verify(group: pa.Table) -> pa.Table:
        from ..functions.arrowutil import embedding_matrix
        if group.num_rows < 2:
            return empty
        group = group.sort_by([(id_column, 'ascending')])
        ids = group.column(id_column).combine_chunks()
        emb = embedding_matrix(group.column(embedding_column)) \
            .astype(np.float64, copy=False)
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        unit = emb / norms[:, None]
        gi, gj, cos = _cosine_pairs_tiled(unit, threshold)
        if not len(gi):
            return empty
        return pa.table({'id_a': ids.take(pa.array(gi)),
                         'id_b': ids.take(pa.array(gj)),
                         'cosine': pa.array(np.round(cos, 6))})

    return bucketed.groupby('bucket').map_groups(verify,
                                                 batch_format='pyarrow')


# ---------------------------------------------------------------------------
# Hamming near-dup over 64-bit signatures (phash / simhash)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 (SWAR; int64 ops for the fast loops)."""
    v = x.view(np.int64).copy()
    m1 = np.int64(0x5555555555555555)
    m2 = np.int64(0x3333333333333333)
    m4 = np.int64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over='ignore'):
        v = v - (_lshr_i64(v, 1) & m1)
        v = (v & m2) + (_lshr_i64(v, 2) & m2)
        v = (v + _lshr_i64(v, 4)) & m4
        v = (v * np.int64(0x0101010101010101))
    return _lshr_i64(v, 56).astype(np.int64)


def _lshr_i64(v: np.ndarray, k: int) -> np.ndarray:
    if k == 0:
        return v
    return (v >> k) & np.int64((1 << (64 - k)) - 1)


def _hamming_pairs_tiled(hh, max_dist, tile=4096):
    """All (i, j, dist) with j > i and popcount(hh[i]^hh[j]) <= max_dist,
    in ``tile``x``tile`` blocks: a hot bucket (e.g. the all-zero chunk of
    near-blank images) never materializes the full n^2 index/XOR arrays
    — peak extra memory is one tile^2 int64 block (~128 MB at the
    default; pass a smaller tile for tighter workers)."""
    n = len(hh)
    out_i, out_j, out_d = [], [], []
    for s in range(0, n, tile):
        a = hh[s:s + tile]
        for t in range(s, n, tile):
            with np.errstate(over='ignore'):
                d = _popcount64(
                    (a[:, None] ^ hh[None, t:t + tile]).view(np.uint64))
            ii, jj = np.nonzero(d <= max_dist)
            gi = ii + s
            gj = jj + t
            keep = gj > gi
            if keep.any():
                out_i.append(gi[keep])
                out_j.append(gj[keep])
                out_d.append(d[ii[keep], jj[keep]])
    if not out_i:
        z = np.empty(0, dtype=np.int64)
        return z, z, z.copy()
    return (np.concatenate(out_i), np.concatenate(out_j),
            np.concatenate(out_d))


def hamming_near_dup(ds, id_column, hash_column, *, max_dist=3, bands=None):
    """Near-duplicate pairs among 64-bit signatures (image phash, document
    simhash): (id_a, id_b, dist) with id_a < id_b and popcount(a^b) <=
    max_dist.

    Pigeonhole banding: the 64 bits split into ``bands`` equal chunks; a
    pair within distance d < bands must agree EXACTLY on at least one
    chunk, so bucketing by (band, chunk value) has guaranteed recall when
    ``bands >= max_dist + 1`` (the default).  One shuffle total: only
    (band, chunk, id, hash) rows move — the 8-byte signature rides along,
    so verification happens inline in the bucket group (no second join,
    unlike text minhash).  At 10^12 rows the hot buckets are the all-zero
    chunks of near-blank images; verification runs in tiled popcount
    blocks (:func:`_hamming_pairs_tiled`) so a hot bucket costs O(n^2)
    vectorized XOR-popcount but bounded memory — still pre-filter
    degenerate signatures upstream when the corpus is dominated by
    them (the FLOPs, not the memory, become the bill)."""
    if bands is None:
        # Smallest divisor of 64 exceeding max_dist (pigeonhole needs
        # bands > max_dist for guaranteed recall; chunks must tile 64 bits).
        bands = next(b for b in (1, 2, 4, 8, 16, 32, 64) if b > max_dist)
    assert 64 % bands == 0, 'bands must divide 64'
    chunk_bits = 64 // bands
    mask = np.int64((1 << chunk_bits) - 1) if chunk_bits < 64 \
        else np.int64(-1)

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids_all = batch.column(id_column).combine_chunks()
        h_all = batch.column(hash_column).combine_chunks()
        # Null ids/hashes are skipped (engine-wide null-key policy): they
        # carry no identity to pair on and break sort-based bucketing.
        keep = pc.and_(ids_all.is_valid(), h_all.is_valid())
        ids = ids_all.filter(keep)
        h = np.asarray(h_all.filter(keep).cast(pa.int64())).astype(np.int64)
        n = len(h)
        out_band = np.tile(np.arange(bands, dtype=np.int64), n)
        chunks = np.empty((n, bands), dtype=np.int64)
        for b in range(bands):
            chunks[:, b] = _lshr_i64(h, b * chunk_bits) & mask
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
        return pa.table({
            'band': pa.array(out_band),
            'chunk': pa.array(chunks.reshape(-1)),
            id_column: ids.take(idx),
            '_hash': pa.array(np.repeat(h, bands)),
        })

    exploded = ds.map_batches(explode, batch_format='pyarrow')

    def band_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(['chunk', id_column])
        chunks_v = g['chunk'].to_numpy()
        ids = g[id_column].to_numpy()
        hashes = g['_hash'].to_numpy().astype(np.int64)
        bounds = np.nonzero(np.diff(chunks_v))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(ids)]])
        out_a, out_b, out_d = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            bucket_ids = ids[s:e]
            bucket_h = hashes[s:e]
            uniq, first = np.unique(bucket_ids, return_index=True)
            if len(uniq) < 2:
                continue
            hh = bucket_h[first]
            gi, gj, dist = _hamming_pairs_tiled(hh, max_dist)
            if len(gi):
                out_a.append(uniq[gi])
                out_b.append(uniq[gj])
                out_d.append(dist)
        if not out_a:
            e1 = pd.Series([], dtype=ids.dtype)
            return pd.DataFrame({'id_a': e1, 'id_b': e1,
                                 'dist': pd.Series([], dtype=np.int64)})
        return pd.DataFrame({'id_a': np.concatenate(out_a),
                             'id_b': np.concatenate(out_b),
                             'dist': np.concatenate(out_d)})

    pairs = exploded.groupby('band').map_groups(band_pairs,
                                                batch_format='pandas')

    # Cross-band dedup: coarse bucket on the pair hash, vectorized
    # drop_duplicates per bucket (pairs ∝ dup rate, not corpus).
    def add_bucket(batch: pa.Table) -> pa.Table:
        from ..state.sketches import hash64_array
        a = hash64_array(batch.column('id_a').combine_chunks())
        b = hash64_array(batch.column('id_b').combine_chunks())
        with np.errstate(over='ignore'):
            h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ b
        return batch.append_column(
            '_bucket', pa.array((h % np.uint64(64)).astype(np.int64)))

    def dedup_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(['id_a', 'id_b'])[
            ['id_a', 'id_b', 'dist']]

    return pairs.map_batches(add_bucket, batch_format='pyarrow') \
        .groupby('_bucket').map_groups(dedup_bucket, batch_format='pandas')

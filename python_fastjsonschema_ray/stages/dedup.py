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
    """Vectorized rolling-hash values of all k-char shingles (uint64)."""
    data = np.frombuffer(text.lower().encode('utf-8'), dtype=np.uint8)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)), constant_values=32)
    windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    powers = np.power(np.uint64(257), np.arange(k, dtype=np.uint64))
    with np.errstate(over='ignore'):
        raw = (windows * powers).sum(axis=1)
    return np.unique(_splitmix64(raw))


class MinHasher:
    """num_perm universal-hash minhash signatures over shingle hashes."""

    def __init__(self, num_perm: int = 128, seed: int = 1337):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over='ignore'):
            # (num_perm, n_shingles) universal hashes; min over shingles.
            h = (np.outer(self.a, shingles) + self.b[:, None]) % _MERSENNE
        return h.min(axis=1)


class MinHashBandStage:
    """doc → b rows of (band, band_hash, id, text?) for the LSH groupby."""

    def __init__(self, id_column, text_column, num_perm=128, bands=32,
                 shingle_k=5, carry_text=True, seed=1337):
        assert num_perm % bands == 0
        self.id_column = id_column
        self.text_column = text_column
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.carry_text = carry_text
        self.hasher = MinHasher(num_perm, seed)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, texts = batch[self.id_column], batch[self.text_column].fillna('')
        out_band, out_hash, out_id, out_text = [], [], [], []
        r = self.rows_per_band
        for doc_id, text in zip(ids, texts):
            sig = self.hasher.signature(
                _shingle_hashes(text, self.shingle_k))
            bands = sig.reshape(self.bands, r)
            with np.errstate(over='ignore'):
                band_hashes = _splitmix64(
                    (bands * np.power(np.uint64(1099511628211),
                                      np.arange(r, dtype=np.uint64))).sum(axis=1))
            for band_idx in range(self.bands):
                out_band.append(band_idx)
                out_hash.append(int(band_hashes[band_idx].astype(np.int64)))
                out_id.append(doc_id)
                if self.carry_text:
                    out_text.append(text)
        data = {'band': out_band, 'band_hash': out_hash,
                self.id_column: out_id}
        if self.carry_text:
            data[self.text_column] = out_text
        return pd.DataFrame(data)


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    a = set(_shingle_hashes(text_a, k).tolist())
    b = set(_shingle_hashes(text_b, k).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / max(len(a | b), 1)


def minhash_duplicate_pairs(ds, id_column, text_column, *, threshold=0.8,
                            num_perm=128, bands=32, shingle_k=5,
                            concurrency=None):
    """Near-duplicate pairs via MinHash-LSH: returns a Dataset of
    (id_a, id_b, jaccard) with id_a < id_b and exact shingle-Jaccard ≥
    threshold.

    Shuffle discipline: only (band, band_hash, id) triples move through the
    LSH groupby — never the text (b small rows per doc); the groupby key is
    the band id (32 coarse groups) with vectorized in-group bucketing, and
    ONLY candidate ids' texts are fetched (semi-join via a broadcast id
    set) for the distributed exact-Jaccard verification."""
    import ray

    stage = MinHashBandStage(id_column, text_column, num_perm, bands,
                             shingle_k, carry_text=False)
    kwargs = {'batch_format': 'pandas'}
    if concurrency:
        kwargs['concurrency'] = concurrency
    banded = ds.select_columns([id_column, text_column]).map_batches(
        stage, **kwargs)

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
        if not out_a:
            return pd.DataFrame({'id_a': [], 'id_b': []})
        return pd.DataFrame({'id_a': np.concatenate(out_a),
                             'id_b': np.concatenate(out_b)})

    candidate_pairs = banded.groupby('band').map_groups(
        band_pairs, batch_format='pandas')
    # Cross-band dedup on the driver: candidate pairs are proportional to
    # the near-dup rate, not the corpus (Ray's sort-based aggregate costs
    # ~0.5 ms per group at 10^5+ tiny groups — measured 190 s for 350 k
    # pairs — while a pandas drop_duplicates is milliseconds).  If the pair
    # set ever outgrows the driver, shard it by hash(id_a) with map_batches
    # and dedupe per shard.
    pair_ids = candidate_pairs.to_pandas().drop_duplicates(
        ['id_a', 'id_b'], ignore_index=True)
    import ray.data
    if pair_ids.empty:
        return ray.data.from_pandas(
            pd.DataFrame({'id_a': [], 'id_b': [], 'jaccard': []}))
    cand_ids = set(pair_ids['id_a']) | set(pair_ids['id_b'])
    cand_ref = ray.put(cand_ids)

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        cand = ray.get(cand_ref)
        return batch[batch[id_column].isin(cand)]

    texts_df = ds.select_columns([id_column, text_column]).map_batches(
        pick, batch_format='pandas').to_pandas()
    texts_ref = ray.put(dict(zip(texts_df[id_column],
                                 texts_df[text_column])))
    n_cpus = max(1, int(ray.cluster_resources().get('CPU', 2)) // 2)
    n_parts = min(max(1, len(pair_ids) // 4096), 4 * n_cpus) or 1
    pairs_ds = ray.data.from_pandas(pair_ids).repartition(max(n_parts, 1))

    class VerifyStage:
        def __init__(self):
            self.text_of = ray.get(texts_ref)
            # Shingle-set cache: each id's set computed once per actor.
            self.cache = {}

        def _shingles(self, doc_id):
            s = self.cache.get(doc_id)
            if s is None:
                s = self.cache[doc_id] = set(
                    _shingle_hashes(self.text_of.get(doc_id, ''),
                                    shingle_k).tolist())
            return s

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out_a, out_b, out_j = [], [], []
            for a, b in zip(batch['id_a'], batch['id_b']):
                sa, sb = self._shingles(a), self._shingles(b)
                union = len(sa | sb)
                sim = len(sa & sb) / union if union else 1.0
                if sim >= threshold:
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(round(sim, 6))
            return pd.DataFrame({'id_a': out_a, 'id_b': out_b,
                                 'jaccard': out_j})

    return pairs_ds.map_batches(
        VerifyStage, batch_format='pandas', batch_size=8192,
        concurrency=max(1, min(n_cpus, n_parts)), num_cpus=0.5)


def dedup_minhash(ds, id_column, text_column, **kwargs):
    """Near-dup removal: drop the higher id of every duplicate pair.
    (Connected components collapse transitively-linked groups; for the
    common near-dup threshold ≥0.8 pair-wise removal is the standard
    first-order policy.)"""
    pairs = minhash_duplicate_pairs(ds, id_column, text_column, **kwargs)
    losers = {row['id_b'] for row in pairs.take_all()}
    if not losers:
        return ds
    import ray
    losers_ref = ray.put(losers)

    def drop(batch: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray
        drop_set = _ray.get(losers_ref)
        return batch[~batch[id_column].isin(drop_set)]

    return ds.map_batches(drop, batch_format='pandas')


# ---------------------------------------------------------------------------
# SimHash


class SimHashStage:
    """64-bit SimHash over whitespace tokens (per-actor hash cache)."""

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

    def simhash(self, text: str) -> int:
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

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch['simhash'] = [
            self.simhash(t) for t in batch[self.text_column].fillna('')]
        return batch


def simhash_buckets(ds, id_column, text_column, *, concurrency=None):
    """Groups of documents sharing an identical 64-bit SimHash."""
    kwargs = {'batch_format': 'pandas'}
    if concurrency:
        kwargs['concurrency'] = concurrency
    from ray.data.aggregate import Count
    sigs = ds.select_columns([id_column, text_column]).map_batches(
        SimHashStage(id_column, text_column), **kwargs)
    counts = sigs.groupby('simhash').aggregate(Count(alias_name='n'))
    return sigs, counts.filter(expr='n > 1')


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
        from ..functions.arrowutil import embedding_matrix
        emb = embedding_matrix(batch.column(self.embedding_column))
        signs = (emb @ self.planes) > 0
        bucket = (signs * self.weights).sum(axis=1)
        return batch.append_column('bucket', pa.array(bucket, type=pa.int64()))


def embedding_duplicate_pairs(ds, id_column, embedding_column, dim, *,
                              threshold=0.95, n_planes=12, concurrency=None):
    """Near-identical embeddings: hyperplane-LSH bucket → exact cosine
    verification within buckets.  (High thresholds ⇒ near-identical vectors
    ⇒ same bucket with high probability; raise recall by lowering
    n_planes.)"""
    import pandas as pd

    kwargs = {'batch_format': 'pyarrow'}
    if concurrency:
        kwargs['concurrency'] = concurrency
    bucketed = ds.select_columns([id_column, embedding_column]).map_batches(
        HyperplaneLSHStage(embedding_column, dim, n_planes), **kwargs)

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({'id_a': [], 'id_b': [], 'cosine': []})
        group = group.sort_values(id_column)
        ids = group[id_column].tolist()
        emb = np.stack(group[embedding_column].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        unit = emb / norms[:, None]
        sims = unit @ unit.T
        out_a, out_b, out_c = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_c.append(round(float(sims[i, j]), 6))
        return pd.DataFrame({'id_a': out_a, 'id_b': out_b, 'cosine': out_c})

    return bucketed.groupby('bucket').map_groups(verify, batch_format='pandas')

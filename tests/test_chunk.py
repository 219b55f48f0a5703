"""Chunking, repetition scoring, and mixture resampling.

Window math and duplicate-mass are pinned against scalar Python
references; the mixture sampler against an exact per-group hash-order
selection computed in pandas."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data


def _py_chunks(text, chunk, overlap):
    stride = chunk - overlap
    L = len(text)
    n = 1 if L <= chunk else math.ceil((L - chunk) / stride) + 1
    return [text[i * stride:i * stride + chunk] for i in range(n)]


def test_chunk_text_matches_scalar_reference(ray_session):
    from python_fastjsonschema_ray.stages.chunk import chunk_text
    rng = np.random.default_rng(7)
    texts = [''.join(chr(97 + c) for c in rng.integers(0, 26, size=n))
             for n in [0, 1, 9, 10, 11, 19, 20, 21, 57, 200]]
    ds = ray.data.from_items(
        [{'doc_id': i, 'text': t} for i, t in enumerate(texts)])
    out = chunk_text(ds, 'doc_id', 'text', chunk_chars=10, overlap=3) \
        .to_pandas().sort_values(['doc_id', 'chunk_idx'])
    for i, t in enumerate(texts):
        got = out[out.doc_id == i]['chunk_text'].tolist()
        assert got == _py_chunks(t, 10, 3), (i, len(t))
    # empty text still yields exactly one (empty) chunk
    assert (out.groupby('doc_id').size() >= 1).all()


def test_chunk_text_rejects_bad_params():
    from python_fastjsonschema_ray.stages.chunk import ChunkStage
    with pytest.raises(ValueError):
        ChunkStage('id', 't', chunk_chars=8, overlap=8)
    with pytest.raises(ValueError):
        ChunkStage('id', 't', chunk_chars=0, overlap=0)


def test_chunk_text_no_overlap_roundtrip(ray_session):
    """overlap=0 chunks concatenate back to the original text."""
    from python_fastjsonschema_ray.stages.chunk import chunk_text
    texts = ['abcdefghij' * 7, 'x', '']
    ds = ray.data.from_items(
        [{'doc_id': i, 'text': t} for i, t in enumerate(texts)])
    out = chunk_text(ds, 'doc_id', 'text', chunk_chars=16, overlap=0) \
        .to_pandas().sort_values(['doc_id', 'chunk_idx'])
    for i, t in enumerate(texts):
        assert ''.join(out[out.doc_id == i]['chunk_text']) == t


def _py_repetition(text, sep=' '):
    segs = text.split(sep)
    from collections import Counter
    c = Counter(segs)
    total = sum(len(s) for s in segs)
    dup = sum(len(s) for s in segs if c[s] > 1)
    return (dup / total if total else 0.0), len(segs)


def test_repetition_stats_matches_scalar_reference(ray_session):
    from python_fastjsonschema_ray.stages.chunk import repetition_stats
    texts = ['a b c a b a', 'unique words only here', '', ' ', 'x x x x',
             'aa  bb  aa', 'one']
    ds = ray.data.from_items(
        [{'doc_id': i, 'text': t} for i, t in enumerate(texts)])
    out = repetition_stats(ds, 'doc_id', 'text') \
        .to_pandas().set_index('doc_id').sort_index()
    for i, t in enumerate(texts):
        ratio, n = _py_repetition(t)
        assert out.loc[i, 'dup_char_ratio'] == pytest.approx(ratio), (i, t)
        assert out.loc[i, 'n_segments'] == n


def test_repetition_stats_batch_boundaries(ray_session):
    """Duplicate mass is strictly per-document: the same word in two
    different documents is NOT a duplicate."""
    from python_fastjsonschema_ray.stages.chunk import repetition_stats
    ds = ray.data.from_items(
        [{'doc_id': i, 'text': 'shared'} for i in range(50)])
    out = repetition_stats(ds, 'doc_id', 'text').to_pandas()
    assert (out['dup_char_ratio'] == 0.0).all()


def test_mixture_quotas_largest_remainder():
    from python_fastjsonschema_ray.stages.sample import mixture_quotas
    q = mixture_quotas({'en': 0.5, 'fr': 0.3, 'de': 0.2}, 10)
    assert q == {'en': 5, 'fr': 3, 'de': 2}
    q = mixture_quotas({'a': 1, 'b': 1, 'c': 1}, 10)
    assert sum(q.values()) == 10 and sorted(q.values()) == [3, 3, 4]
    # deterministic tie-break by group key: 'a' gets the extra row
    assert q['a'] == 4
    with pytest.raises(ValueError):
        mixture_quotas({'a': 0.0}, 5)


def test_mixture_sample_exact_matches_pandas(ray_session):
    from python_fastjsonschema_ray.stages.sample import (
        KNUTH, mixture_sample_exact)
    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        'k': np.arange(n, dtype=np.int64),
        'g': rng.choice(['en', 'fr', 'de', 'zh'], size=n),
    })
    quotas = {'en': 17, 'fr': 5, 'de': 1000, 'xx': 3}  # de > group size
    ds = ray.data.from_pandas(df).repartition(7)
    out = mixture_sample_exact(ds, 'g', 'k', quotas).to_pandas()

    ref = df.copy()
    ref['_r'] = (ref['k'] * KNUTH) % 1_000_000_000
    ref = ref.sort_values(['_r', 'k'])
    keep = ref.groupby('g', sort=False).cumcount() < \
        ref['g'].map(quotas).fillna(0).to_numpy()
    ref = ref[keep]

    got = set(map(tuple, out[['g', 'k']].itertuples(index=False)))
    want = set(map(tuple, ref[['g', 'k']].itertuples(index=False)))
    assert got == want
    sizes = out.groupby('g').size()
    assert sizes['en'] == 17 and sizes['fr'] == 5
    assert sizes['de'] == (df['g'] == 'de').sum()   # quota exceeds group
    assert 'zh' not in sizes.index                  # absent from quotas


def test_chunk_then_pack_pipeline(ray_session):
    """End-to-end pretraining prep: chunk documents, count words per
    chunk, lay chunks into fixed token sequences via packing_plan.
    Spans must tile the concatenated stream exactly."""
    import numpy as np
    import ray.data
    from python_fastjsonschema_ray.stages.chunk import chunk_text
    from python_fastjsonschema_ray.stages.pack import packing_plan

    docs = [{'doc_id': i, 'text': ' '.join(
        'w%d' % ((i * 37 + j) % 11) for j in range(20 + i * 5))}
        for i in range(12)]
    ds = ray.data.from_items(docs)
    chunks = chunk_text(ds, 'doc_id', 'text', chunk_chars=40, overlap=0)

    def count(batch):
        batch = batch.copy()
        batch['chunk_id'] = batch['doc_id'] * 1000 + batch['chunk_idx']
        batch['n_tokens'] = batch['chunk_text'].str.split().str.len()
        return batch[['chunk_id', 'n_tokens']]

    counted = chunks.map_batches(count, batch_format='pandas')
    plan = packing_plan(counted, 'chunk_id', 'n_tokens',
                        max_tokens=16).to_pandas().sort_values('id')

    ref = counted.to_pandas().sort_values('chunk_id')
    starts = np.concatenate(([0], np.cumsum(
        np.maximum(ref['n_tokens'].to_numpy(), 1))[:-1]))
    assert plan['id'].tolist() == ref['chunk_id'].tolist()
    assert plan['seq_first'].tolist() == (starts // 16).tolist()
    assert plan['seq_offset'].tolist() == (starts % 16).tolist()


def test_deterministic_split_disjoint_exhaustive(ray_session):
    """Splits are disjoint, exhaustive, reproducible, and the first
    split's membership equals deterministic_sample at the same
    fraction/salt (same hash-range rule)."""
    import numpy as np
    import pandas as pd
    import ray.data
    from python_fastjsonschema_ray.stages.sample import (
        deterministic_sample, deterministic_split)

    df = pd.DataFrame({'id': np.arange(2000, dtype='int64')})
    ds = ray.data.from_pandas(df).repartition(4)
    out = deterministic_split(ds, 'id',
                              {'train': 0.8, 'val': 0.1, 'test': 0.1}) \
        .to_pandas()
    assert len(out) == 2000
    counts = out['split'].value_counts()
    assert set(counts.index) == {'train', 'val', 'test'}
    assert abs(counts['train'] - 1600) < 80      # hash-range tolerance
    # reproducible
    again = deterministic_split(ds, 'id',
                                {'train': 0.8, 'val': 0.1, 'test': 0.1}) \
        .to_pandas().sort_values('id')
    assert again['split'].tolist() == \
        out.sort_values('id')['split'].tolist()
    # split 0 == deterministic_sample membership at the same fraction
    sample = set(deterministic_sample(ds, 'id', 0.8)
                 .to_pandas()['id'])
    train = set(out[out['split'] == 'train']['id'])
    assert train == sample

    import pytest
    with pytest.raises(ValueError):
        deterministic_split(ds, 'id', {'a': 0.5, 'b': 0.2})


def test_token_budget_sample_matches_pandas(ray_session):
    """Per-group hash-ordered prefix under a token budget equals the
    pandas window reference; groups without a budget drop."""
    import numpy as np
    import pandas as pd
    import ray.data
    from python_fastjsonschema_ray.stages.sample import (
        KNUTH, token_budget_sample)

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        'k': np.arange(300, dtype='int64'),
        'g': rng.choice(['en', 'zh', 'xx'], 300),
        'tok': rng.integers(10, 100, 300).astype('int64'),
    })
    budgets = {'en': 1500, 'zh': 400}
    ds = ray.data.from_pandas(df).repartition(6)
    out = token_budget_sample(ds, 'g', 'k', 'tok', budgets).to_pandas()

    ref = df.copy()
    ref['_h'] = (ref['k'] * KNUTH) % 1_000_000_000
    ref = ref.sort_values(['_h', 'k'])
    ref['_run'] = ref.groupby('g')['tok'].cumsum()
    want = ref[ref['_run'] <= ref['g'].map(budgets).fillna(-1)]
    assert set(out['k']) == set(want['k'])
    assert set(out['g']) <= {'en', 'zh'}
    # each group's spend is within budget
    spend = out.groupby('g')['tok'].sum()
    for g, b in budgets.items():
        if g in spend.index:
            assert spend[g] <= b

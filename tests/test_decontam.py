"""Benchmark decontamination vs an exact string-n-gram reference."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(ids, texts, blocks=3):
    import ray.data
    return ray.data.from_arrow(pa.table({
        'doc_id': pa.array(ids, type=pa.int64()),
        'text': pa.array(texts, type=pa.string()),
    })).repartition(blocks)


def _grams(text, n):
    toks = text.lower().split(' ')
    return {' '.join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _exact_hits(corpus, bench_texts, n):
    bench = set()
    for t in bench_texts:
        bench |= _grams(t, n)
    return {i: len(_grams(t, n) & bench)
            for i, t in corpus if _grams(t, n) & bench}


def _mk_corpus(seed=3, n_docs=80, words=200):
    rng = np.random.default_rng(seed)
    vocab = ['w%d' % i for i in range(50)]
    return [' '.join(rng.choice(vocab, words)) for _ in range(n_docs)]


def test_decontaminate_matches_exact_reference(ray_session):
    from python_fastjsonschema_ray.stages.decontam import (
        benchmark_ngrams, decontaminate)
    n = 8
    texts = _mk_corpus()
    # Plant contamination: doc 7 embeds a full benchmark sentence, doc
    # 13 shares exactly one 8-gram, doc 21 shares a 7-gram only (no hit).
    bench_texts = ['alpha beta gamma delta epsilon zeta eta theta iota '
                   'kappa lam mu']
    btoks = bench_texts[0].split(' ')
    texts[7] = texts[7] + ' ' + bench_texts[0]
    texts[13] = ' '.join(btoks[:8]) + ' ' + texts[13]
    texts[21] = texts[21] + ' ' + ' '.join(btoks[:7])
    corpus = list(enumerate(texts))

    bench = benchmark_ngrams(_ds([0], bench_texts, blocks=1), 'text', n=n)
    out = decontaminate(_ds([i for i, _ in corpus], texts), 'doc_id',
                        'text', bench, n=n).to_pandas()
    got = dict(zip(out['doc_id'], out['n_hits']))
    exp = _exact_hits(corpus, bench_texts, n)
    assert got == exp
    assert 7 in got and 13 in got and 21 not in got
    assert got[13] == 1


def test_decontaminate_min_hits_threshold(ray_session):
    from python_fastjsonschema_ray.stages.decontam import (
        benchmark_ngrams, decontaminate)
    texts = _mk_corpus(seed=9, n_docs=30)
    bench_text = 'b0 b1 b2 b3 b4 b5 b6 b7 b8 b9'     # 3 distinct 8-grams
    texts[4] += ' ' + bench_text                      # 3 hits
    texts[9] += ' ' + ' '.join(bench_text.split(' ')[:8])   # 1 hit
    bench = benchmark_ngrams(_ds([0], [bench_text], blocks=1), 'text')
    out = decontaminate(_ds(range(len(texts)), texts), 'doc_id', 'text',
                        bench, min_hits=2).to_pandas()
    assert dict(zip(out['doc_id'], out['n_hits'])) == {4: 3}


def test_decontaminate_short_and_empty_docs(ray_session):
    from python_fastjsonschema_ray.stages.decontam import (
        benchmark_ngrams, decontaminate)
    texts = ['one two three', '', 'a b c d e f g h', 'a b c d e f g h i']
    bench = benchmark_ngrams(_ds([0], ['a b c d e f g h'], blocks=1),
                             'text')
    out = decontaminate(_ds(range(4), texts), 'doc_id', 'text',
                        bench).to_pandas()
    got = dict(zip(out['doc_id'], out['n_hits']))
    assert got == {2: 1, 3: 1}     # <8-token docs produce no grams


def test_decontaminate_empty_benchmark(ray_session):
    from python_fastjsonschema_ray.stages.decontam import decontaminate
    out = decontaminate(_ds([0, 1], ['x ' * 20, 'y ' * 20]), 'doc_id',
                        'text', np.zeros(0, dtype=np.uint64)).to_pandas()
    assert len(out) == 0

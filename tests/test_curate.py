"""Composed curation pipeline: each stage's effect pinned with planted
documents (exact dup, near dup, contaminated, repetitive, junk)."""

import ray.data


BASE = ('the quick brown fox jumps over the lazy dog while many other '
        'words follow in a natural flowing sentence about nothing much')


def _corpus():
    docs = [
        {'doc_id': 0, 'text': BASE},
        {'doc_id': 1, 'text': BASE},                      # exact dup of 0
        {'doc_id': 2, 'text': BASE.replace('dog', 'cat')},  # near dup of 0
        {'doc_id': 3, 'text': ('benchmark eval question one two three '
                               'four five six seven eight nine ten and '
                               'some trailing words for length here')},
        {'doc_id': 4, 'text': 'spam ' * 40},              # pure repetition
        {'doc_id': 5, 'text': ('completely different content with many '
                               'unique tokens covering various topics '
                               'like science history art and music')},
    ]
    return ray.data.from_items(docs)


def test_curate_corpus_stage_effects(ray_session):
    from python_fastjsonschema_ray.pipelines.curate import curate_corpus

    bench = ray.data.from_items([{'text': (
        'benchmark eval question one two three four five six seven '
        'eight nine ten')}])
    out, stats = curate_corpus(
        _corpus(), near_dup_threshold=0.6, bench_ds=bench,
        max_dup_char_ratio=0.9,
        split_fractions={'train': 0.8, 'val': 0.2}, stats=True)
    df = out.to_pandas()
    ids = set(df['doc_id'])
    assert 0 in ids                 # winner of the dup cluster survives
    assert 1 not in ids             # exact dup dropped
    assert 2 not in ids             # near dup dropped
    assert 3 not in ids             # contaminated dropped
    assert 4 not in ids             # repetitive dropped
    assert 5 in ids                 # clean doc survives
    assert set(df['split']) <= {'train', 'val'}
    assert stats['input'] == 6 and stats['output'] == len(df)
    # counts are monotone non-increasing until chunking
    seq = [stats['input'], stats['after_exact_dedup'],
           stats['after_near_dedup'], stats['after_decontamination'],
           stats['after_repetition']]
    assert all(a >= b for a, b in zip(seq, seq[1:]))


def test_curate_corpus_lazy_no_stats(ray_session):
    """Without stats the pipeline stays lazy (a Dataset comes back) and
    optional stages are skipped cleanly."""
    from python_fastjsonschema_ray.pipelines.curate import curate_corpus

    out = curate_corpus(_corpus(), near_dup_threshold=None,
                        chunk_chars=50, overlap=10)
    df = out.to_pandas()
    assert set(df.columns) == {'doc_id', 'chunk_idx', 'chunk_text'}
    assert df['doc_id'].nunique() == 5      # only exact dup removed


def test_curate_corpus_checkpoint_resume(ray_session, tmp_path):
    """Per-stage parquet checkpoints: a second run reuses committed
    stage directories (mtimes unchanged) and produces identical
    output; deleting a late stage re-runs only from there."""
    import os
    from python_fastjsonschema_ray.pipelines.curate import curate_corpus

    root = str(tmp_path / 'ckpt')
    os.makedirs(root)
    kwargs = dict(near_dup_threshold=0.6, max_dup_char_ratio=0.9,
                  split_fractions={'train': 0.8, 'val': 0.2},
                  stats=True, checkpoint_dir=root)
    out1, stats1 = curate_corpus(_corpus(), **kwargs)
    df1 = out1.to_pandas().sort_values('doc_id').reset_index(drop=True)
    assert sorted(os.listdir(root)) == [
        'after_exact_dedup', 'after_near_dedup', 'after_repetition',
        'input', 'output']
    mtimes = {d: os.path.getmtime(os.path.join(root, d))
              for d in os.listdir(root)}

    out2, stats2 = curate_corpus(_corpus(), **kwargs)
    df2 = out2.to_pandas().sort_values('doc_id').reset_index(drop=True)
    assert stats1 == stats2
    assert df1.equals(df2)
    for d, m in mtimes.items():          # nothing rewritten
        assert os.path.getmtime(os.path.join(root, d)) == m

    # delete the final stage: only it is recomputed, earlier stand
    import shutil
    shutil.rmtree(os.path.join(root, 'output'))
    out3, stats3 = curate_corpus(_corpus(), **kwargs)
    assert stats3 == stats1
    assert out3.to_pandas().sort_values('doc_id') \
        .reset_index(drop=True).equals(df1)
    for d in ('input', 'after_exact_dedup', 'after_near_dedup'):
        assert os.path.getmtime(os.path.join(root, d)) == mtimes[d]

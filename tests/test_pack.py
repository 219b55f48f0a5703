"""Concat-then-chunk packing plan: distributed prefix sum vs a local
reference computation, layout-independent."""

import numpy as np
import pyarrow as pa


def _reference_plan(ids, tokens, L):
    order = np.argsort(ids)
    start = 0
    out = {}
    for i in order:
        n = int(tokens[i])
        end = start + max(n, 1)
        out[int(ids[i])] = (start // L, start % L, (end - 1) // L)
        start += n
    return out


def test_packing_plan_matches_reference(ray_session):
    import ray.data
    from python_fastjsonschema_ray.stages.pack import packing_plan
    rng = np.random.default_rng(5)
    ids = rng.permutation(300)
    tokens = rng.integers(0, 900, size=300)
    t = pa.table({'id': pa.array(ids, pa.int64()),
                  'n': pa.array(tokens, pa.int64())})
    for blocks in (1, 7):
        out = packing_plan(ray.data.from_arrow(t).repartition(blocks),
                           'id', 'n', 512).to_pandas()
        got = {int(r.id): (r.seq_first, r.seq_offset, r.seq_last)
               for r in out.itertuples()}
        assert got == _reference_plan(ids, tokens, 512), blocks


def test_packing_plan_boundaries(ray_session):
    import ray.data
    from python_fastjsonschema_ray.stages.pack import packing_plan
    t = pa.table({'id': pa.array([1, 2, 3, 4], pa.int64()),
                  'n': pa.array([100, 28, 5, 130], pa.int64())})
    out = packing_plan(ray.data.from_arrow(t), 'id', 'n', 128) \
        .to_pandas().set_index('id')
    # doc1 [0,100) seq0; doc2 [100,128) exactly fills seq0;
    # doc3 [128,133) starts seq1 at offset 0; doc4 [133,263) straddles
    # seq1->seq2.
    assert tuple(out.loc[1]) == (0, 0, 0)
    assert tuple(out.loc[2]) == (0, 100, 0)
    assert tuple(out.loc[3]) == (1, 0, 1)
    assert tuple(out.loc[4]) == (1, 5, 2)

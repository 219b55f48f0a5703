"""Connected components over near-duplicate pair lists (transitive
dedup clusters).

No reference counterpart (``/root/reference`` validates one document at
a time); this is the standard missing piece of training-data dedup:
pairwise near-dup relations are NOT transitive, so cluster-level keep
policies (one survivor per group of mutually-similar documents) need the
transitive closure of the pair list.

Two paths, same contract — every id that appears in the pair list maps
to ``component_id`` = the minimum id in its component:

* :func:`connected_components` (driver fold, the default): near-dup edge
  lists are dup-rate-bounded (|pairs| ~ dup_rate x corpus), orders of
  magnitude smaller than the corpus, and ids-only (8-16 bytes/edge).
  The fold is vectorized min-label propagation with pointer jumping
  (numpy, O(E log d)); ``driver_pair_limit`` gates how many edges may
  be pulled to the driver (default 20M ~ 320 MB of id pairs).
* :func:`connected_components_distributed`: hash-to-min label
  propagation as Ray Data rounds (Rastogi et al., "Finding Connected
  Components in Map-Reduce") for beyond-gate edge volumes.  Each round
  is one bucketed co-group (labels meet edges on the node key) plus one
  bucketed min-fold; rounds ~ O(graph diameter), which for near-dup
  clusters is small.  Only (node, label) and edge endpoint rows ever
  shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _components_numpy(ea: np.ndarray, eb: np.ndarray,
                      n_nodes: int) -> np.ndarray:
    """Min-label propagation + pointer jumping over edge code arrays.

    Labels are node CODES (positions in the sorted unique-id array), so
    the component minimum over codes is the minimum over original ids.
    Labels only decrease => terminates; pointer jumping keeps rounds
    ~O(log diameter)."""
    label = np.arange(n_nodes, dtype=np.int64)
    while True:
        m = np.minimum(label[ea], label[eb])
        np.minimum.at(label, ea, m)
        np.minimum.at(label, eb, m)
        label = np.minimum(label, label[label])
        stable_ptr = bool((label[label] == label).all())
        m2 = np.minimum(label[ea], label[eb])
        stable_edge = bool((label[ea] == m2).all()
                           and (label[eb] == m2).all())
        if stable_ptr and stable_edge:
            return label


def connected_components(pairs, id_a='id_a', id_b='id_b', *,
                         driver_pair_limit=20_000_000):
    """Transitive closure of a near-dup pair Dataset on the driver.

    Returns a (small) Ray Dataset with columns (id, component_id) — one
    row per distinct id in the pair list, component_id = min id of the
    component.  Raises if the edge count exceeds ``driver_pair_limit``;
    switch to :func:`connected_components_distributed` past the gate.
    Only the two id columns are ever collected — never texts or payload
    columns."""
    import ray
    import ray.data

    refs = pairs.select_columns([id_a, id_b]).to_arrow_refs()
    tables = [t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
              for t in ray.get(refs)]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return ray.data.from_arrow(pa.table({
            'id': pa.array([], type=pa.int64()),
            'component_id': pa.array([], type=pa.int64())}))
    edges = pa.concat_tables(t.select([id_a, id_b]) for t in tables)
    if edges.num_rows > driver_pair_limit:
        raise ValueError(
            'pair list has {} edges > driver_pair_limit={}; use '
            'connected_components_distributed'.format(
                edges.num_rows, driver_pair_limit))
    a = edges.column(id_a).combine_chunks()
    b = edges.column(id_b).combine_chunks()
    both = pa.concat_arrays([a.cast(a.type), b.cast(a.type)])
    codes_arr = both.dictionary_encode()
    uniq = codes_arr.dictionary
    # Re-encode against SORTED uniques so code order == id order and the
    # min code in a component is the min id.
    order = pa.compute.sort_indices(uniq)
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[np.asarray(order, dtype=np.int64)] = np.arange(len(uniq))
    codes = rank[np.asarray(codes_arr.indices, dtype=np.int64)]
    n_edges = edges.num_rows
    label = _components_numpy(codes[:n_edges], codes[n_edges:], len(uniq))
    sorted_ids = uniq.take(order)
    return ray.data.from_arrow(pa.table({
        'id': sorted_ids,
        'component_id': sorted_ids.take(pa.array(label, type=pa.int64())),
    }))


def connected_components_distributed(pairs, id_a='id_a', id_b='id_b', *,
                                     num_buckets=None, max_rounds=50):
    """Hash-to-min connected components as Ray Data rounds.

    Per round, each node's current label is sent across every incident
    edge and nodes fold the min of what they hear; a pointer-jumping
    step (label <- label[label], one more bucketed co-group) then
    short-circuits chains, so rounds ~ O(log diameter) instead of
    O(diameter).  Labels only decrease; the edge-relax fixpoint (zero
    changes in a round) implies labels are constant-per-component and
    equal to the component minimum, so termination is exact regardless
    of jumps.  State (one (node, label) row per node) and edge endpoints
    are the ONLY shuffled rows; both sides move on a coarse hash bucket
    of the node key so the Ray-level group count stays O(cluster).  The
    state is materialized once per round (pair-list-sized, never
    corpus-sized)."""
    import pandas as pd
    import ray
    import ray.data
    from ..pipelines.constraints import _AddKeyBucket, _default_buckets

    num_buckets = num_buckets or _default_buckets()
    # Each bucketed co-group emits ~num_buckets blocks; feeding those
    # straight into the NEXT round's sort-groupby compounds (sort fixed
    # cost is task-count-driven), making round cost grow round over
    # round.  Coalesce the (tiny, pair-list-bounded) label state to
    # ~cpus/2 blocks between rounds so every round pays the same cost.
    state_blocks = max(4, int(ray.cluster_resources().get('CPU', 8)) // 2)

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch.column(id_a).combine_chunks()
        b = batch.column(id_b).combine_chunks().cast(a.type)
        return pa.table({'u': pa.concat_arrays([a, b]),
                         'v': pa.concat_arrays([b, a])})

    edges = pairs.select_columns([id_a, id_b]).map_batches(
        symmetrize, batch_format='pyarrow').materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        sub = batch.group_by('u').aggregate([('v', 'min')])
        u = sub.column('u').combine_chunks()
        vmin = sub.column('v_min').combine_chunks()
        lab = pa.compute.min_element_wise(u, vmin)
        return pa.table({'node': u, 'label': lab})

    # Local min per block, then bucketed min fold — partials only.
    labels = edges.map_batches(init_labels, batch_format='pyarrow')
    labels = _min_fold(labels, 'node', 'label', num_buckets) \
        .repartition(state_blocks).materialize()
    id_type = edges.schema().types[0]

    def tag_edges(b: pa.Table) -> pa.Table:
        return b.rename_columns(['node', 'v']).append_column(
            'label', pa.nulls(b.num_rows, type=id_type))

    def tag_labels(b: pa.Table) -> pa.Table:
        return b.append_column(
            'v', pa.nulls(b.num_rows, type=id_type)) \
            .select(['node', 'v', 'label'])

    for _ in range(max_rounds):
        # Messages: co-group edges (bucket of u) with labels (bucket of
        # node); each edge forwards its source label to the target node.
        tagged_edges = edges.map_batches(tag_edges, batch_format='pyarrow')
        tagged_labels = labels.map_batches(tag_labels,
                                           batch_format='pyarrow')
        both = tagged_edges.union(tagged_labels).map_batches(
            _AddKeyBucket(['node'], num_buckets), batch_format='pyarrow')

        def forward(group: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            is_lab = pc.is_valid(group.column('label'))
            lab = group.filter(is_lab)
            edge = group.filter(pc.invert(is_lab))
            # Vectorized lookup (total: every edge source holds a label
            # row in its bucket) — no per-row dict probes.
            idx = pc.index_in(edge.column('node').combine_chunks(),
                              value_set=lab.column('node')
                              .combine_chunks())
            out_lab = lab.column('label').combine_chunks().take(idx)
            # (target node, forwarded label) ++ the label rows themselves
            # (tagged old=True) so the fold can detect change.
            fwd = pa.table({
                'node': edge.column('v').cast(lab.column('node').type),
                'label': out_lab,
                'old': pa.array(np.zeros(edge.num_rows, dtype=bool))})
            keep = pa.table({
                'node': lab.column('node'),
                'label': lab.column('label'),
                'old': pa.array(np.ones(lab.num_rows, dtype=bool))})
            return pa.concat_tables([fwd, keep])

        msgs = both.groupby('_bucket').map_groups(
            forward, batch_format='pyarrow')

        def local_fold(batch: pa.Table) -> pa.Table:
            # Min over all rows (messages + the old-label row) is the
            # candidate new label; the old label rides along separately
            # so the final fold can count changes.
            g = batch.group_by('node').aggregate([('label', 'min')])
            olds = batch.filter(batch.column('old'))
            og = olds.group_by('node').aggregate([('label', 'min')])
            return _join_old(g, og)

        folded = msgs.map_batches(local_fold, batch_format='pyarrow')
        bucketed = folded.map_batches(
            _AddKeyBucket(['node'], num_buckets), batch_format='pyarrow')

        def final_fold(group: pd.DataFrame) -> pd.DataFrame:
            merged = group.groupby('node', sort=False, as_index=False).agg(
                label=('label_min', 'min'), old=('old_label', 'min'))
            merged['changed'] = (
                merged['label'] < merged['old']).astype('int64')
            merged['label'] = merged['label'].astype('int64') \
                if merged['label'].dtype.kind in 'iu' else merged['label']
            return merged[['node', 'label', 'changed']]

        new_state = bucketed.groupby('_bucket').map_groups(
            final_fold, batch_format='pandas') \
            .repartition(state_blocks).materialize()
        n_changed = new_state.sum('changed') or 0
        labels = new_state.drop_columns(['changed'])
        if not n_changed:
            labels = labels.materialize()
            break
        labels = _pointer_jump(labels, num_buckets) \
            .repartition(state_blocks).materialize()
    return labels.map_batches(
        lambda b: b.rename_columns(['id', 'component_id']),
        batch_format='pyarrow')


def _pointer_jump(labels, num_buckets):
    """One label <- label[label] step: co-group each (node, label) row
    (keyed on its LABEL) with the label rows themselves (keyed on node)
    and rewrite through the lookup.  Labels always point at real nodes
    (they are min-folded node ids), so the lookup is total."""
    from ..pipelines.constraints import _AddKeyBucket

    def tag_ref(b: pa.Table) -> pa.Table:
        # Row (n, l) keyed by l: asks "what is l's label?"
        return pa.table({
            'jkey': b.column('label'),
            'node': b.column('node'),
            'lab': pa.nulls(b.num_rows, type=b.column('label').type)})

    def tag_src(b: pa.Table) -> pa.Table:
        # Row (n, l) keyed by n: answers "n's label is l".
        return pa.table({
            'jkey': b.column('node'),
            'node': pa.nulls(b.num_rows, type=b.column('node').type),
            'lab': b.column('label')})

    both = labels.map_batches(tag_ref, batch_format='pyarrow').union(
        labels.map_batches(tag_src, batch_format='pyarrow')).map_batches(
        _AddKeyBucket(['jkey'], num_buckets), batch_format='pyarrow')

    def rewrite(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        is_src = pc.is_valid(group.column('lab'))
        src = group.filter(is_src)
        ref = group.filter(pc.invert(is_src))
        idx = pc.index_in(ref.column('jkey').combine_chunks(),
                          value_set=src.column('jkey').combine_chunks())
        jumped = src.column('lab').combine_chunks().take(idx)
        return pa.table({
            'node': ref.column('node'),
            'label': jumped})

    return both.groupby('_bucket').map_groups(rewrite,
                                              batch_format='pyarrow')


def _min_fold(partials, key, value, num_buckets):
    """Bucketed distributed min: partials (≤1 row per key per block) meet
    on a coarse hash bucket of the key; Arrow-native fold per bucket."""
    from ..pipelines.constraints import _AddKeyBucket

    bucketed = partials.map_batches(_AddKeyBucket([key], num_buckets),
                                    batch_format='pyarrow')

    def fold(group: pa.Table) -> pa.Table:
        sub = group.select([key, value]).group_by(key) \
            .aggregate([(value, 'min')])
        return sub.rename_columns([key, value])

    return bucketed.groupby('_bucket').map_groups(fold,
                                                  batch_format='pyarrow')


def _join_old(g: pa.Table, og: pa.Table) -> pa.Table:
    """Left-join the per-node old label onto the folded mins (small,
    in-block tables)."""
    import pyarrow.compute as pc

    idx = pc.index_in(g.column('node').combine_chunks(),
                      value_set=og.column('node').combine_chunks())
    old_vals = og.column('label_min').combine_chunks().take(idx)
    return pa.table({
        'node': g.column('node'),
        'label_min': g.column('label_min'),
        'old_label': old_vals})

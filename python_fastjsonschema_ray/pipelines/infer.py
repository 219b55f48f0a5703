"""Schema inference: profile a Dataset into a JSON-Schema table spec.

The reference compiles a hand-written schema into a validator; large
curation pipelines usually need the REVERSE first — profile a landed
table into a draft spec (types, nullability, numeric ranges, string
length bounds), eyeball/tighten it, then enforce it with
``validate_dataset`` on the next ingest.  One streaming partial pass
per block (each block emits a single tiny stats row per column, folded
on the driver) — no shuffle, nothing materialized.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _json_type(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return 'boolean'
    if pa.types.is_integer(t):
        return 'integer'
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return 'number'
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return 'string'
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return 'string'          # payload bytes; contentEncoding applies
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return 'array'
    if pa.types.is_struct(t) or pa.types.is_map(t):
        return 'object'
    return 'string'


def profile_columns(ds, columns=None):
    """Per-column profile rows: (column, type, nullable, min, max,
    min_length, max_length).  min/max cover numeric columns; the length
    bounds cover string columns (characters)."""
    import ray

    schema = ds.schema()
    names = list(columns or schema.names)
    types = dict(zip(schema.names, schema.types))

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        rows = {'column': [], 'n': [], 'nulls': [], 'vmin': [], 'vmax': [],
                'lmin': [], 'lmax': []}
        for name in names:
            col = batch.column(name)
            t = types[name]
            rows['column'].append(name)
            rows['n'].append(batch.num_rows)
            rows['nulls'].append(col.null_count)
            vmin = vmax = lmin = lmax = None
            if (pa.types.is_integer(t) or pa.types.is_floating(t)) \
                    and batch.num_rows > col.null_count:
                mm = pc.min_max(col)
                vmin = float(mm['min'].as_py())
                vmax = float(mm['max'].as_py())
            if (pa.types.is_string(t) or pa.types.is_large_string(t)) \
                    and batch.num_rows > col.null_count:
                lens = pc.utf8_length(col)
                mm = pc.min_max(lens)
                lmin = int(mm['min'].as_py())
                lmax = int(mm['max'].as_py())
            rows['vmin'].append(vmin)
            rows['vmax'].append(vmax)
            rows['lmin'].append(lmin)
            rows['lmax'].append(lmax)
        return pa.table({
            'column': pa.array(rows['column'], pa.string()),
            'n': pa.array(rows['n'], pa.int64()),
            'nulls': pa.array(rows['nulls'], pa.int64()),
            'vmin': pa.array(rows['vmin'], pa.float64()),
            'vmax': pa.array(rows['vmax'], pa.float64()),
            'lmin': pa.array(rows['lmin'], pa.int64()),
            'lmax': pa.array(rows['lmax'], pa.int64()),
        })

    folded = {name: {'n': 0, 'nulls': 0, 'vmin': math.inf, 'vmax': -math.inf,
                     'lmin': None, 'lmax': None} for name in names}
    partials = ds.map_batches(partial, batch_format='pyarrow')
    for t in ray.get(partials.to_arrow_refs()):
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t)
        for row in t.to_pylist():
            f = folded[row['column']]
            f['n'] += row['n']
            f['nulls'] += row['nulls']
            if row['vmin'] is not None:
                f['vmin'] = min(f['vmin'], row['vmin'])
                f['vmax'] = max(f['vmax'], row['vmax'])
            if row['lmin'] is not None:
                f['lmin'] = (row['lmin'] if f['lmin'] is None
                             else min(f['lmin'], row['lmin']))
                f['lmax'] = (row['lmax'] if f['lmax'] is None
                             else max(f['lmax'], row['lmax']))
    out = []
    for name in names:
        f = folded[name]
        out.append({
            'column': name,
            'type': _json_type(types[name]),
            'nullable': f['nulls'] > 0,
            'min': None if f['vmin'] == math.inf else f['vmin'],
            'max': None if f['vmax'] == -math.inf else f['vmax'],
            'min_length': f['lmin'],
            'max_length': f['lmax'],
        })
    return out


def infer_table_spec(ds, columns=None) -> dict:
    """A JSON-Schema table spec (the shape TableValidator consumes)
    inferred from the data: observed types, required for never-null
    columns, numeric [min, max] and string length bounds.  Meant as a
    DRAFT to tighten by hand — observed bounds are not invariants."""
    profile = profile_columns(ds, columns)
    props, required = {}, []
    for row in profile:
        sub = {'type': ([row['type'], 'null'] if row['nullable']
                        else row['type'])}
        if row['min'] is not None:
            if row['type'] == 'integer':
                sub['minimum'] = int(row['min'])
                sub['maximum'] = int(row['max'])
            else:
                sub['minimum'] = row['min']
                sub['maximum'] = row['max']
        if row['min_length'] is not None:
            sub['minLength'] = row['min_length']
            sub['maxLength'] = row['max_length']
        props[row['column']] = sub
        if not row['nullable']:
            required.append(row['column'])
    return {'type': 'object', 'properties': props, 'required': required}

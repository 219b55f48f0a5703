"""Text cleaning stages: normalization and PII redaction.

Standard pre-training corpus hygiene (the reference engine validates
documents; a training pipeline must also canonicalize and scrub them).
Both operators are pure per-batch Arrow-kernel maps — zero-copy
batches, RE2 regexes compiled once inside the kernel, no shuffle, no
Python rows — so they stream at I/O speed and compose with any other
stage.

RE2 parity note: Arrow's ``replace_substring_regex`` and DuckDB's
``regexp_replace(..., 'g')`` are both RE2, so the driver oracles
compare the exact same regex semantics (no lookarounds/backrefs in the
default rules, by construction).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Order matters: URLs first (emails/IPs inside a URL are already
# consumed), then emails, then bare IPv4s.
DEFAULT_PII_RULES = (
    ('url', r'https?://[^\s]+', '<URL>'),
    ('email', r'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
     '<EMAIL>'),
    ('ipv4', r'\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>'),
)


def redact_text(ds, column, *, rules=DEFAULT_PII_RULES, out_column=None,
                count_matches=False):
    """Replace every rule match with its placeholder.

    ``out_column`` defaults to replacing ``column`` in place.  With
    ``count_matches`` a ``{rule_name}_matches`` int64 column is added
    per rule (counted BEFORE redaction, on the partially-redacted text
    the rule actually saw, i.e. counts equal replacements made)."""
    rules = tuple(rules)
    target = out_column or column

    def batch_redact(batch: pa.Table) -> pa.Table:
        arr = batch.column(column)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        counts = {}
        for name, pattern, repl in rules:
            if count_matches:
                counts[name] = pc.count_substring_regex(arr, pattern)
            arr = pc.replace_substring_regex(arr, pattern=pattern,
                                             replacement=repl)
        if target in batch.column_names:
            batch = batch.set_column(
                batch.column_names.index(target),
                target, arr)
        else:
            batch = batch.append_column(target, arr)
        for name, c in counts.items():
            batch = batch.append_column(
                '{}_matches'.format(name), pc.cast(c, pa.int64()))
        return batch

    return ds.map_batches(batch_redact, batch_format='pyarrow')


def normalize_text(ds, column, *, lower=True, collapse_whitespace=True,
                   strip=True, nfkc=False, out_column=None):
    """Canonicalize a text column: lowercase, collapse every whitespace
    run to one space, trim the ends — all Arrow kernels.  ``nfkc=True``
    additionally applies Unicode NFKC (pandas ``str.normalize``, the
    one non-Arrow step — a per-row C loop, still batch-local)."""
    target = out_column or column

    def batch_norm(batch: pa.Table) -> pa.Table:
        arr = batch.column(column)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if nfkc:
            s = arr.to_pandas().str.normalize('NFKC')
            arr = pa.array(s, type=pa.string())
        if lower:
            arr = pc.utf8_lower(arr)
        if collapse_whitespace:
            arr = pc.replace_substring_regex(arr, pattern=r'\s+',
                                             replacement=' ')
        if strip:
            arr = pc.utf8_trim_whitespace(arr)
        if target in batch.column_names:
            return batch.set_column(
                batch.column_names.index(target), target, arr)
        return batch.append_column(target, arr)

    return ds.map_batches(batch_norm, batch_format='pyarrow')

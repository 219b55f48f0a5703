"""Vectorized Arrow-level schema compiler.

Compiles one JSON Schema against one concrete Arrow type into a plan of
vectorized rule evaluators (`pyarrow.compute` / numpy kernels) that validate a
whole column (or a whole table viewed as a struct array) per batch, emitting
reference-identical violation records.

Key design points (vs the reference's per-document codegen,
``fastjsonschema/generator.py:17-190``):

* **Compile-time type guards.** The reference guards every keyword with
  ``isinstance`` checks at runtime (e.g. ``minLength`` silently passes for
  non-strings, ``draft04.py:268``).  Against a typed Arrow column the guard is
  decided once at compile time: a rule that cannot apply to the column's type
  compiles to a no-op; only *null* handling remains a runtime mask.

* **A table is a struct view.** ``TableValidator`` wraps the batch's columns
  in a ``pa.StructArray`` (zero-copy) and validates it as a root ``object``
  node, so required/properties/dependencies/if-then-else across columns fall
  out of the generic struct-node compilation.

* **Element-major fast-fail ordering.**  The reference raises on the *first*
  failing check in document-traversal order (SURVEY.md §2.4).  Each exc site
  gets an int64 order key; list elements expand keys as
  ``base + elem_pos * child_span + child_key`` so per-row ``min(key)``
  reproduces the traversal order exactly.

* **Per-rule row kernels as escape hatch.**  Rules with no Arrow kernel
  (Decimal-exact float ``multipleOf``, deep enum over structs, Python-``re``
  regexes that RE2 cannot run) fall back to a per-row kernel *for that rule
  only*; ordering, messages and the violation payload stay uniform.

* **Whole-column scalar fallback** only where semantics demand it
  ($ref in collect mode, transforms under composition); handled by
  :class:`ScalarFallbackPlan` which runs the interpreted validator per row.
"""

from __future__ import annotations

import base64 as _base64
import json as _json
import re
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..exceptions import JsonSchemaDefinitionException, JsonSchemaValueException
from .formats import FORMAT_REGEXS_BY_DRAFT
from .scalar import (
    _DOLLAR_FINDER,
    _MISSING,
    _embed_in_source,
    _freeze,
    ScalarCompiler,
    enum_value_match,
    keyword_order,
)

_MAXKEY = np.int64(2**62)


def _json_default(obj):
    if isinstance(obj, bytes):
        try:
            return obj.decode('utf-8')
        except UnicodeDecodeError:
            return _base64.b64encode(obj).decode('ascii')
    if isinstance(obj, Decimal):
        return float(obj)
    return str(obj)


def json_dump(value) -> str:
    return _json.dumps(value, default=_json_default, ensure_ascii=False)


# ---------------------------------------------------------------------------
# Views


class View:
    """One nesting level of a column during evaluation: the Arrow array of
    values at this level plus the mapping back to root rows and lazy
    per-element display names."""

    __slots__ = ('arr', 'n', 'root_rows', 'name_fn', '_np_cache')

    def __init__(self, arr: pa.Array, root_rows: np.ndarray, name_fn):
        self.arr = arr
        self.n = len(arr)
        self.root_rows = root_rows
        self.name_fn = name_fn      # (local_idx: int) -> str
        self._np_cache = {}

    def valid_mask(self) -> np.ndarray:
        m = self._np_cache.get('valid')
        if m is None:
            if self.arr.null_count == 0:
                m = np.ones(self.n, dtype=bool)
            else:
                m = np.asarray(self.arr.is_valid())
            self._np_cache['valid'] = m
        return m

    def values_at(self, idx: np.ndarray):
        """Python values for the given local indices (violating rows only)."""
        if len(idx) == 0:
            return []
        return self.arr.take(pa.array(idx, type=pa.int64())).to_pylist()


class Emit:
    """One batch of violations from a single exc site."""

    __slots__ = ('idx', 'key', 'rule', 'definition', 'messages', 'values_override')

    def __init__(self, idx, key, rule, definition, messages, values_override=None):
        self.idx = idx                  # np.int64 view-local indices
        self.key = key                  # np.int64 order keys, same length
        self.rule = rule                # keyword str or None
        self.definition = definition    # expanded definition (python object)
        self.messages = messages        # callable(view, idx) -> list[str]
        self.values_override = values_override  # callable(view, idx) -> list | None


class NodeResult:
    __slots__ = ('fail', 'emits')

    def __init__(self, fail: np.ndarray, emits):
        self.fail = fail
        self.emits = emits


def _or(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a | b


# ---------------------------------------------------------------------------
# Rule / node plans


class Rule:
    """One keyword at one node.  ``span`` counts exc-site slots in this rule's
    subtree (for order-key allocation); ``offset`` is assigned by the node."""

    span = 1

    def __init__(self):
        self.offset = 0

    def evaluate(self, view: View, collect: bool) -> NodeResult:
        raise NotImplementedError


class SimpleRule(Rule):
    """A leaf rule: one fail-mask function + one message site."""

    def __init__(self, rule, definition, mask_fn, message_tail=None, message_fn=None):
        super().__init__()
        self.rule = rule
        self.definition = definition
        self.mask_fn = mask_fn          # (view) -> np.bool_[n] | None
        self.message_tail = message_tail
        self.message_fn = message_fn    # overrides tail: (view, idx) -> [str]

    def evaluate(self, view, collect):
        fail = self.mask_fn(view)
        if fail is None or not fail.any():
            return NodeResult(None, [])
        idx = np.nonzero(fail)[0].astype(np.int64)
        key = np.full(len(idx), self.offset, dtype=np.int64)
        if self.message_fn is not None:
            messages = self.message_fn
        else:
            tail = self.message_tail

            def messages(v, i, _tail=tail):
                return [v.name_fn(j) + _tail for j in i]

        return NodeResult(fail, [Emit(idx, key, self.rule, self.definition, messages)])


class ConstantRule(Rule):
    """A rule whose outcome is the same for every non-null element
    (e.g. ``required`` against a struct type, ``minProperties`` vs a fixed
    field count).  ``applies_to_null``: object-guarded rules skip null rows."""

    def __init__(self, rule, definition, fails: bool, message_tail,
                 applies_to_null=False):
        super().__init__()
        self.rule = rule
        self.definition = definition
        self.fails = fails
        self.message_tail = message_tail
        self.applies_to_null = applies_to_null

    def evaluate(self, view, collect):
        if not self.fails:
            return NodeResult(None, [])
        fail = np.ones(view.n, dtype=bool) if self.applies_to_null \
            else view.valid_mask().copy()
        if not fail.any():
            return NodeResult(None, [])
        idx = np.nonzero(fail)[0].astype(np.int64)
        key = np.full(len(idx), self.offset, dtype=np.int64)
        tail = self.message_tail

        def messages(v, i):
            return [v.name_fn(j) + tail for j in i]

        return NodeResult(fail, [Emit(idx, key, self.rule, self.definition, messages)])


class NodePlan:
    """Ordered rules for one (definition, arrow type) pair."""

    def __init__(self, rules):
        self.rules = rules
        offset = 0
        for r in rules:
            r.offset = offset
            offset += r.span
        self.span = max(offset, 1)

    def evaluate(self, view: View, collect: bool) -> NodeResult:
        fail = None
        emits = []
        for rule in self.rules:
            res = rule.evaluate(view, collect)
            fail = _or(fail, res.fail)
            emits.extend(res.emits)
        return NodeResult(fail, emits)


class AlwaysFailNode(NodePlan):
    """Boolean schema ``False`` (draft06.py:46-54): every present value fails."""

    def __init__(self, rule, definition, message_tail=' must not be there'):
        super().__init__([ConstantRule(rule, definition, True, message_tail,
                                       applies_to_null=True)])


# ---------------------------------------------------------------------------
# The compiler


class Unsupported(Exception):
    """Raised during plan compilation when a construct cannot be vectorized;
    the caller falls back to the interpreted scalar path for the column."""


_NUMERIC_TYPES = ('int8', 'int16', 'int32', 'int64', 'uint8', 'uint16',
                  'uint32', 'uint64', 'float', 'double', 'halffloat',
                  'decimal128', 'decimal256')


def _is_string(dt):
    return pa.types.is_string(dt) or pa.types.is_large_string(dt)


def _is_binary(dt):
    return pa.types.is_binary(dt) or pa.types.is_large_binary(dt)


def _is_number(dt):
    return (pa.types.is_integer(dt) or pa.types.is_floating(dt)
            or pa.types.is_decimal(dt))


def _is_list(dt):
    return pa.types.is_list(dt) or pa.types.is_large_list(dt) \
        or pa.types.is_fixed_size_list(dt)


def _np_bool(arrow_bool_arr, n) -> np.ndarray:
    """Arrow boolean array (possibly with nulls) -> numpy bool, null=False."""
    if arrow_bool_arr.null_count:
        arrow_bool_arr = arrow_bool_arr.fill_null(False)
    out = np.asarray(arrow_bool_arr)
    if out.dtype != bool:
        out = out.astype(bool)
    return out


# Regex constructs RE2 (Arrow's engine) cannot run or runs differently from
# Python `re`; their presence forces the per-row Python kernel.
_RE2_UNSUPPORTED = re.compile(
    r'\(\?[=!<]'      # lookahead / lookbehind
    r'|\\[1-9]'       # backreferences
    r'|\(\?P?[<>]'    # named-group syntax variations
    r'|\\Z|\\A|\\G'
)


class VectorCompiler:
    """Compiles (definition, arrow type) into a :class:`NodePlan`.

    Shares draft config, registry and flags with a :class:`ScalarCompiler`
    (which also provides the per-row fallback kernels)."""

    def __init__(self, scalar: ScalarCompiler):
        self.scalar = scalar
        self.draft = scalar.draft
        self.registry = scalar.registry
        self.order = keyword_order(self.draft)
        self.format_regexs = FORMAT_REGEXS_BY_DRAFT[4 if self.draft <= 4 else self.draft]
        self._ref_depth = 0

    # -- helpers --------------------------------------------------------

    def _expand(self, definition):
        return self.registry.expand_refs(definition)

    def compile_node(self, definition, dtype: pa.DataType) -> NodePlan:
        if isinstance(definition, bool):
            if self.draft <= 4:
                raise JsonSchemaDefinitionException('definition must be an object')
            if definition:
                return NodePlan([])
            return AlwaysFailNode(None, definition)
        if not isinstance(definition, dict):
            raise JsonSchemaDefinitionException('definition must be an object')
        if '$ref' in definition:
            # Inline the target: recursion is bounded by the finite nesting
            # depth of the Arrow type (each inline consumes a nesting level
            # for list/struct rules; scalar rules terminate immediately).
            if self._ref_depth > 64:
                raise Unsupported('$ref nesting too deep to inline')
            self._ref_depth += 1
            try:
                with self.registry.resolving(definition['$ref']) as target:
                    return self.compile_node(target, dtype)
            finally:
                self._ref_depth -= 1

        rules = []
        for keyword in self.order:
            if keyword in definition:
                method = getattr(self, '_v_' + keyword.replace('$', ''), None)
                if method is None:
                    raise Unsupported('keyword {} not vectorized'.format(keyword))
                rule = method(definition, dtype)
                if rule is not None:
                    rules.append(rule)
        return NodePlan(rules)

    def _simple(self, definition, rule, mask_fn, tail=None, message_fn=None):
        return SimpleRule(rule, self._expand(definition), mask_fn, tail, message_fn)

    def _row_kernel(self, definition, rule, fn, tail=None, message_fn=None):
        """Per-row kernel rule: fn(python_value) -> fails? (bool).
        Only invoked for non-null values."""
        def mask(view):
            valid = view.valid_mask()
            if not valid.any():
                return None
            values = view.arr.to_pylist()
            fail = np.fromiter(
                (bool(v is not None and fn(v)) for v in values),
                dtype=bool, count=view.n)
            return fail
        return self._simple(definition, rule, mask, tail, message_fn)

    # -- scalar keywords ------------------------------------------------

    def _v_type(self, definition, dtype):
        types = definition['type']
        types = types if isinstance(types, list) else [types]
        for t in types:
            if t not in ('null', 'boolean', 'number', 'integer', 'string',
                         'array', 'object'):
                raise JsonSchemaDefinitionException('Unknown type')
        tail = ' must be {}'.format(' or '.join(types))

        def static_ok():
            if _is_string(dtype):
                return 'string' in types
            if pa.types.is_boolean(dtype):
                return 'boolean' in types
            if pa.types.is_integer(dtype) or pa.types.is_decimal(dtype):
                return 'integer' in types or 'number' in types
            if pa.types.is_floating(dtype):
                return 'number' in types  # integral floats handled below
            if _is_list(dtype):
                return 'array' in types
            if pa.types.is_struct(dtype):
                return 'object' in types
            if pa.types.is_null(dtype):
                return 'null' in types
            if pa.types.is_timestamp(dtype) or pa.types.is_date(dtype) \
                    or pa.types.is_time(dtype) or _is_binary(dtype):
                # Engine extension: physical types with no JSON equivalent
                # never satisfy a JSON 'type' assertion except via raw check
                # columns; treat timestamps as strings for 'string' schemas.
                return 'string' in types and (
                    pa.types.is_timestamp(dtype) or pa.types.is_date(dtype)
                    or pa.types.is_time(dtype))
            raise Unsupported('type check on arrow type {}'.format(dtype))

        null_ok = 'null' in types
        integral_float_ok = (self.draft >= 6 and 'integer' in types
                             and pa.types.is_floating(dtype))
        if pa.types.is_floating(dtype) and 'integer' in types \
                and 'number' not in types and self.draft <= 4:
            # draft-04: floats are never integers.
            ok = False
        else:
            ok = static_ok() or integral_float_ok

        if ok and not integral_float_ok:
            if null_ok:
                return None

            def mask(view):
                if view.arr.null_count == 0:
                    return None
                return ~view.valid_mask()
            return self._simple(definition, 'type', mask, tail)

        if integral_float_ok and not (static_ok() and 'number' in types):
            # Only integral floats pass.
            def mask(view):
                valid = view.valid_mask()
                vals = np.asarray(view.arr.fill_null(0.0), dtype=np.float64)
                integral = np.equal(vals, np.floor(vals)) & np.isfinite(vals)
                fail = valid & ~integral
                if not null_ok:
                    fail |= ~valid
                return fail
            return self._simple(definition, 'type', mask, tail)

        if not ok:
            def mask(view):
                fail = view.valid_mask().copy()
                if not null_ok:
                    fail |= ~view.valid_mask()
                return fail
            return self._simple(definition, 'type', mask, tail)
        return None

    def _v_enum(self, definition, dtype):
        enum = definition['enum']
        if not isinstance(enum, (list, tuple)):
            raise JsonSchemaDefinitionException('enum must be an array')
        tail = ' must be one of ' + _embed_in_source(str(enum))

        scalarish = all(
            isinstance(x, (str, int, float, bool)) or x is None for x in enum)
        if scalarish and (_is_string(dtype) or _is_number(dtype)
                          or pa.types.is_boolean(dtype)):
            # Type-strict filtering mirrors _enum_value_matches
            # (draft04.py:120-155): bools only match bools, numbers only
            # numbers (ints and floats cross-match).
            if _is_string(dtype):
                options = [x for x in enum if isinstance(x, str)]
            elif pa.types.is_boolean(dtype):
                options = [x for x in enum if isinstance(x, bool)]
            else:
                options = [x for x in enum
                           if isinstance(x, (int, float)) and not isinstance(x, bool)]
            null_ok = any(x is None for x in enum)
            if not options:
                def mask(view, _null_ok=null_ok):
                    fail = view.valid_mask().copy()
                    if not _null_ok:
                        fail |= ~view.valid_mask()
                    return fail
                return self._simple(definition, 'enum', mask, tail)

            def mask(view, _options=options, _null_ok=null_ok):
                try:
                    isin = pc.is_in(view.arr,
                                    value_set=pa.array(_options), skip_nulls=True)
                except pa.ArrowError:
                    vals = view.arr.to_pylist()
                    hit = np.fromiter(
                        (any(enum_value_match(v, o) for o in _options)
                         for v in vals), dtype=bool, count=view.n)
                    fail = ~hit
                    if _null_ok:
                        fail &= view.valid_mask()
                    return fail
                fail = ~_np_bool(isin, view.n)
                if _null_ok:
                    fail &= view.valid_mask()
                else:
                    fail |= ~view.valid_mask()
                return fail
            return self._simple(definition, 'enum', mask, tail)

        # Deep / mixed enum: per-row kernel with reference-exact matching.
        null_ok = any(x is None for x in enum)

        def mask(view):
            vals = view.arr.to_pylist()
            fail = np.fromiter(
                (not any(enum_value_match(v, o) for o in enum) for v in vals),
                dtype=bool, count=view.n)
            return fail
        return self._simple(definition, 'enum', mask, tail)

    def _v_const(self, definition, dtype):
        const = definition['const']
        tail = ' must be same as const definition: {}'.format(
            const if isinstance(const, str) else _embed_in_source(str(const)))
        sub = {'enum': [const]}
        inner = self._v_enum({'enum': [const]}, dtype)

        def mask(view, _inner=inner):
            return _inner.mask_fn(view)
        return self._simple(definition, 'const', mask, tail)

    def _v_minLength(self, definition, dtype):
        n = definition['minLength']
        if not isinstance(n, (int, float)):
            raise JsonSchemaDefinitionException('minLength must be a number')
        if not _is_string(dtype):
            return None
        tail = ' must be longer than or equal to {} characters'.format(n)

        def mask(view):
            lens = pc.utf8_length(view.arr)
            return _np_bool(pc.less(lens, n), view.n)
        return self._simple(definition, 'minLength', mask, tail)

    def _v_maxLength(self, definition, dtype):
        n = definition['maxLength']
        if not isinstance(n, (int, float)):
            raise JsonSchemaDefinitionException('maxLength must be a number')
        if not _is_string(dtype):
            return None
        tail = ' must be shorter than or equal to {} characters'.format(n)

        def mask(view):
            lens = pc.utf8_length(view.arr)
            return _np_bool(pc.greater(lens, n), view.n)
        return self._simple(definition, 'maxLength', mask, tail)

    def _compile_search_regex(self, pattern):
        """Return (vectorized: bool, compiled) for a Python `re.search`
        pattern with the reference's `$ -> \\Z` rewrite (draft04.py:283-290).
        RE2-incompatible patterns use the Python kernel."""
        fixed = _DOLLAR_FINDER.sub(r'\\Z', pattern)
        if not _RE2_UNSUPPORTED.search(fixed):
            try:
                pc.match_substring_regex(pa.array([], type=pa.string()),
                                         pattern=fixed)
                return True, fixed
            except pa.ArrowError:
                pass
        return False, re.compile(fixed)

    def _v_pattern(self, definition, dtype):
        pattern = definition['pattern']
        if not _is_string(dtype):
            return None
        tail = ' must match pattern ' + pattern
        vectorized, compiled = self._compile_search_regex(pattern)
        if vectorized:
            def mask(view):
                hit = pc.match_substring_regex(view.arr, pattern=compiled)
                fail = ~_np_bool(hit, view.n)
                fail &= view.valid_mask()
                return fail
            return self._simple(definition, 'pattern', mask, tail)
        rx = compiled
        return self._row_kernel(definition, 'pattern',
                                lambda v: not rx.search(v), tail)

    def _compile_match_regex(self, pattern):
        """Anchored-at-start `re.match` semantics used by `format`
        (draft04.py:328-333): RE2 path wraps the pattern in a group with a
        leading anchor."""
        if not _RE2_UNSUPPORTED.search(pattern):
            anchored = '^(?:' + pattern + ')' if not pattern.startswith('^') else pattern
            try:
                pc.match_substring_regex(pa.array([], type=pa.string()),
                                         pattern=anchored)
                return True, anchored
            except pa.ArrowError:
                pass
        return False, re.compile(pattern)

    def _v_format(self, definition, dtype):
        if not self.scalar.use_formats:
            return None
        format_ = definition['format']
        if not _is_string(dtype):
            return None
        tail = ' must be ' + format_

        if format_ in self.scalar.custom_formats:
            custom = self.scalar.custom_formats[format_]
            if isinstance(custom, str):
                vectorized, compiled = self._compile_match_regex(custom)
                if vectorized:
                    def mask(view):
                        hit = pc.match_substring_regex(view.arr, pattern=compiled)
                        fail = ~_np_bool(hit, view.n)
                        fail &= view.valid_mask()
                        return fail
                    return self._simple(definition, 'format', mask, tail)
                rx = compiled
                return self._row_kernel(definition, 'format',
                                        lambda v: not rx.match(v), tail)
            fn = custom
            return self._row_kernel(definition, 'format',
                                    lambda v: not fn(v), tail)

        if format_ in self.format_regexs:
            vectorized, compiled = self._compile_match_regex(
                self.format_regexs[format_])
            if vectorized:
                def mask(view):
                    hit = pc.match_substring_regex(view.arr, pattern=compiled)
                    fail = ~_np_bool(hit, view.n)
                    fail &= view.valid_mask()
                    return fail
                return self._simple(definition, 'format', mask, tail)
            rx = compiled
            return self._row_kernel(definition, 'format',
                                    lambda v: not rx.match(v), tail)

        if format_ == 'regex':
            def bad_regex(v):
                try:
                    re.compile(v)
                    return False
                except Exception:
                    return True
            return self._row_kernel(definition, 'format', bad_regex,
                                    ' must be a valid regex')
        return None

    def _bound_rule(self, definition, keyword, dtype, cmp_fail, tail):
        bound = definition[keyword]
        if not isinstance(bound, (int, float, Decimal)):
            article = ('an integer, a float or a decimal'
                       if keyword.startswith('exclusive') else 'a number')
            raise JsonSchemaDefinitionException(
                '{} must be {}'.format(keyword, article))
        if not _is_number(dtype):
            return None
        runtime = float(str(bound)) if isinstance(bound, Decimal) else bound

        def mask(view):
            res = cmp_fail(view.arr, runtime)
            fail = _np_bool(res, view.n)
            fail &= view.valid_mask()
            return fail
        return self._simple(definition, keyword, mask, tail.format(bound))

    def _v_minimum(self, definition, dtype):
        if definition.get('exclusiveMinimum', False):
            return self._bound_rule(definition, 'minimum', dtype,
                                    pc.less_equal, ' must be bigger than {}')
        return self._bound_rule(definition, 'minimum', dtype, pc.less,
                                ' must be bigger than or equal to {}')

    def _v_maximum(self, definition, dtype):
        if definition.get('exclusiveMaximum', False):
            return self._bound_rule(definition, 'maximum', dtype,
                                    pc.greater_equal, ' must be smaller than {}')
        return self._bound_rule(definition, 'maximum', dtype, pc.greater,
                                ' must be smaller than or equal to {}')

    def _v_exclusiveMinimum(self, definition, dtype):
        if self.draft <= 4:
            return None
        return self._bound_rule(definition, 'exclusiveMinimum', dtype,
                                pc.less_equal, ' must be bigger than {}')

    def _v_exclusiveMaximum(self, definition, dtype):
        if self.draft <= 4:
            return None
        return self._bound_rule(definition, 'exclusiveMaximum', dtype,
                                pc.greater_equal, ' must be smaller than {}')

    def _v_multipleOf(self, definition, dtype):
        mo = definition['multipleOf']
        if not isinstance(mo, (int, float, Decimal)):
            raise JsonSchemaDefinitionException('multipleOf must be a number')
        if not _is_number(dtype):
            return None
        tail = ' must be multiple of {}'.format(mo)
        use_decimal = isinstance(mo, float)
        mo_rt = float(str(mo)) if isinstance(mo, Decimal) else mo

        if not use_decimal and pa.types.is_integer(dtype):
            def mask(view):
                rem = pc.subtract(
                    view.arr, pc.multiply(pc.divide(view.arr, mo_rt), mo_rt))
                fail = _np_bool(pc.not_equal(rem, 0), view.n)
                fail &= view.valid_mask()
                return fail
            return self._simple(definition, 'multipleOf', mask, tail)

        if use_decimal:
            # Decimal-exact per-row check (draft04.py:361-368): 19.01/0.01
            # must be exactly 1901; no float kernel can guarantee this.
            dec_mo = 'repr'

            def fails(v):
                quotient = Decimal(repr(v)) / Decimal(repr(mo_rt))
                return int(quotient) != quotient
            return self._row_kernel(definition, 'multipleOf', fails, tail)

        def fails(v):
            quotient = v / mo_rt
            return int(quotient) != quotient
        return self._row_kernel(definition, 'multipleOf', fails, tail)

    # -- array keywords -------------------------------------------------

    def _list_lengths(self, view):
        lens = view._np_cache.get('list_len')
        if lens is None:
            raw = pc.list_value_length(view.arr)
            if raw.null_count:
                raw = raw.fill_null(0)
            lens = np.asarray(raw).astype(np.int64)
            view._np_cache['list_len'] = lens
        return lens

    def _v_minItems(self, definition, dtype):
        n = definition['minItems']
        if not isinstance(n, (int, float)):
            raise JsonSchemaDefinitionException('minItems must be a number')
        if not _is_list(dtype):
            return None
        tail = ' must contain at least {} items'.format(n)

        def mask(view):
            fail = self._list_lengths(view) < n
            fail &= view.valid_mask()
            return fail
        return self._simple(definition, 'minItems', mask, tail)

    def _v_maxItems(self, definition, dtype):
        n = definition['maxItems']
        if not isinstance(n, (int, float)):
            raise JsonSchemaDefinitionException('maxItems must be a number')
        if not _is_list(dtype):
            return None
        tail = ' must contain less than or equal to {} items'.format(n)

        def mask(view):
            fail = self._list_lengths(view) > n
            fail &= view.valid_mask()
            return fail
        return self._simple(definition, 'maxItems', mask, tail)

    def _v_uniqueItems(self, definition, dtype):
        if not definition['uniqueItems']:
            return None
        if not _is_list(dtype):
            return None
        value_type = dtype.value_type
        tail = ' must contain unique items'

        if (_is_string(value_type) or _is_number(value_type)
                or pa.types.is_boolean(value_type)):
            def mask(view):
                lens = self._list_lengths(view)
                if not lens.any():
                    return None
                flat = pc.list_flatten(view.arr)
                rows = np.repeat(np.arange(view.n, dtype=np.int64), lens)
                if len(flat) == 0:
                    return None
                # Encode values as integer codes (equal value = equal code;
                # nulls get their own code, None == None per reference).
                if _is_string(value_type):
                    codes_arr = flat.dictionary_encode().indices
                    codes = np.asarray(codes_arr.fill_null(-1)).astype(np.int64)
                else:
                    vals = np.asarray(flat.cast(pa.float64()).fill_null(np.nan))
                    uniq, codes = np.unique(vals, return_inverse=True)
                    nullmask = ~np.asarray(
                        flat.is_valid()) if flat.null_count else None
                    if nullmask is not None:
                        codes = codes.copy()
                        codes[nullmask] = -1
                order = np.lexsort((codes, rows))
                srows, scodes = rows[order], codes[order]
                dup = np.zeros(len(flat), dtype=bool)
                if len(flat) > 1:
                    dup[1:] = (srows[1:] == srows[:-1]) & (scodes[1:] == scodes[:-1])
                fail = np.zeros(view.n, dtype=bool)
                if dup.any():
                    fail[np.unique(srows[dup])] = True
                return fail
            return self._simple(definition, 'uniqueItems', mask, tail)

        def fails(v):
            return isinstance(v, (list, tuple)) and \
                len(v) > len({_freeze(x) for x in v})
        return self._row_kernel(definition, 'uniqueItems', fails, tail)

    def _v_items(self, definition, dtype):
        items_definition = definition['items']
        if items_definition is True:
            return None
        if not _is_list(dtype):
            return None
        if items_definition is False:
            def mask(view):
                fail = self._list_lengths(view) > 0
                fail &= view.valid_mask()
                return fail
            return self._simple(definition, 'items', mask, ' must not be there')
        if isinstance(items_definition, list):
            # Tuple schemas over homogeneous Arrow lists: per-index plans.
            return TupleItemsRule(self, definition, dtype)
        if not items_definition:
            return None
        return ListItemsRule(self, definition, items_definition, dtype)

    def _v_contains(self, definition, dtype):
        contains_definition = definition['contains']
        if self.draft <= 4:
            return None
        if not _is_list(dtype):
            return None
        if contains_definition is False:
            def mask(view):
                return view.valid_mask().copy()
            return self._simple(definition, 'contains', mask, ' is always invalid')
        if contains_definition is True:
            def mask(view):
                fail = self._list_lengths(view) == 0
                fail &= view.valid_mask()
                return fail
            return self._simple(definition, 'contains', mask, ' must not be empty')
        return ContainsRule(self, definition, contains_definition, dtype)

    # -- object keywords (struct columns / root table) -------------------

    def _struct_keys(self, dtype):
        return [f.name for f in dtype]

    def _v_minProperties(self, definition, dtype):
        n = definition['minProperties']
        if not isinstance(n, (int, float)):
            raise JsonSchemaDefinitionException('minProperties must be a number')
        if not pa.types.is_struct(dtype):
            return None
        fails = dtype.num_fields < n
        return ConstantRule('minProperties', self._expand(definition), fails,
                            ' must contain at least {} properties'.format(n))

    def _v_maxProperties(self, definition, dtype):
        n = definition['maxProperties']
        if not isinstance(n, (int, float)):
            raise JsonSchemaDefinitionException('maxProperties must be a number')
        if not pa.types.is_struct(dtype):
            return None
        fails = dtype.num_fields > n
        return ConstantRule('maxProperties', self._expand(definition), fails,
                            ' must contain less than or equal to {} properties'.format(n))

    def _v_required(self, definition, dtype):
        required = definition['required']
        if not isinstance(required, (list, tuple)):
            raise JsonSchemaDefinitionException('required must be an array')
        if len(required) != len(set(required)):
            raise JsonSchemaDefinitionException('required must contain unique elements')
        if not definition.get('additionalProperties', True):
            not_possible = [
                prop for prop in required
                if prop not in definition.get('properties', {})
                and not any(re.search(rx, prop)
                            for rx in definition.get('patternProperties', {}))
            ]
            if not_possible:
                raise JsonSchemaDefinitionException(
                    'data: items {} are required but not allowed'.format(not_possible))
        if not pa.types.is_struct(dtype):
            return None
        present = set(self._struct_keys(dtype))
        missing = sorted(set(required) - present)
        return ConstantRule(
            'required', self._expand(definition), bool(missing),
            ' must contain {} properties'.format(missing))

    def _v_dependencies(self, definition, dtype):
        if not pa.types.is_struct(dtype):
            return None
        present = set(self._struct_keys(dtype))
        rules = []
        for key, values in definition['dependencies'].items():
            if values == [] or values is True or key not in present:
                continue
            if values is False:
                rules.append(ConstantRule(
                    'dependencies', self._expand(definition), True,
                    None))
                rules[-1].message_tail = None
                # message needs key prefix; use custom constant below
                rules[-1] = _DependencyForbidRule(
                    self._expand(definition), key)
            elif isinstance(values, list):
                for dep in values:
                    if dep not in present:
                        rules.append(_DependencyMissingRule(
                            self._expand(definition), dep, key))
            else:
                rules.append(SubSchemaRule(self, values, dtype))
        if not rules:
            return None
        return CompositeRule(rules)

    def _v_properties(self, definition, dtype):
        if not pa.types.is_struct(dtype):
            return None
        return PropertiesRule(self, definition, dtype)

    def _v_patternProperties(self, definition, dtype):
        if not pa.types.is_struct(dtype):
            return None
        return PatternPropertiesRule(self, definition, dtype)

    def _v_additionalProperties(self, definition, dtype):
        if not pa.types.is_struct(dtype):
            return None
        return AdditionalPropertiesRule(self, definition, dtype)

    def _v_propertyNames(self, definition, dtype):
        names_definition = definition.get('propertyNames', {})
        if self.draft <= 4:
            return None
        if not pa.types.is_struct(dtype):
            return None
        keys = self._struct_keys(dtype)
        expanded = self._expand(definition)
        if names_definition is True:
            return None
        if names_definition is False:
            return ConstantRule('propertyNames', expanded, bool(keys),
                                ' must not be there')
        if not keys:
            return None
        # Field names are static: evaluate the name schema once at compile
        # time with the interpreted validator.
        checker = ScalarCompiler(
            names_definition, draft=self.draft,
            use_formats=self.scalar.use_formats,
            formats=self.scalar.custom_formats).compile_root()
        ok = True
        for key in keys:
            try:
                checker(key)
            except JsonSchemaValueException:
                ok = False
            except Exception:
                ok = False
        return ConstantRule('propertyNames', expanded, not ok,
                            ' must be named by propertyName definition')

    # -- composition ----------------------------------------------------

    def _v_allOf(self, definition, dtype):
        subs = [SubSchemaRule(self, item, dtype) for item in definition['allOf']]
        return CompositeRule(subs)

    def _v_anyOf(self, definition, dtype):
        return AnyOfRule(self, definition, dtype)

    def _v_oneOf(self, definition, dtype):
        return OneOfRule(self, definition, dtype)

    def _v_not(self, definition, dtype):
        return NotRule(self, definition, dtype)

    def _v_if(self, definition, dtype):
        if self.draft <= 6:
            return None
        return IfThenElseRule(self, definition, dtype)

    # -- content transforms ---------------------------------------------

    def _v_contentEncoding(self, definition, dtype):
        # Transforms are handled at column level by TableValidator; inside a
        # nested vector plan we cannot rebind values, so fall back.
        raise Unsupported('contentEncoding inside vector plan')

    def _v_contentMediaType(self, definition, dtype):
        raise Unsupported('contentMediaType inside vector plan')


class _DependencyForbidRule(Rule):
    def __init__(self, definition, key):
        super().__init__()
        self.definition = definition
        self.key = key

    def evaluate(self, view, collect):
        fail = view.valid_mask().copy()
        if not fail.any():
            return NodeResult(None, [])
        idx = np.nonzero(fail)[0].astype(np.int64)
        key = np.full(len(idx), self.offset, dtype=np.int64)
        dep_key = self.key

        def messages(v, i):
            return ['{} in {} must not be there'.format(dep_key, v.name_fn(j))
                    for j in i]
        return NodeResult(fail, [Emit(idx, key, 'dependencies',
                                      self.definition, messages)])


class _DependencyMissingRule(Rule):
    def __init__(self, definition, dep, key):
        super().__init__()
        self.definition = definition
        self.dep = dep
        self.key = key

    def evaluate(self, view, collect):
        fail = view.valid_mask().copy()
        if not fail.any():
            return NodeResult(None, [])
        idx = np.nonzero(fail)[0].astype(np.int64)
        key = np.full(len(idx), self.offset, dtype=np.int64)
        dep, kk = self.dep, self.key

        def messages(v, i):
            return ['{} missing dependency {} for {}'.format(v.name_fn(j), dep, kk)
                    for j in i]
        return NodeResult(fail, [Emit(idx, key, 'dependencies',
                                      self.definition, messages)])


class CompositeRule(Rule):
    """Sequence of sub-rules sharing this slot range (allOf, dependencies)."""

    def __init__(self, rules):
        super().__init__()
        self.rules = rules
        offset = 0
        for r in rules:
            r._rel = offset
            offset += r.span
        self.span = max(offset, 1)

    @property
    def offset(self):
        return self._offset

    @offset.setter
    def offset(self, value):
        self._offset = value
        for r in self.rules:
            r.offset = value + r._rel

    def evaluate(self, view, collect):
        fail = None
        emits = []
        for r in self.rules:
            res = r.evaluate(view, collect)
            fail = _or(fail, res.fail)
            emits.extend(res.emits)
        return NodeResult(fail, emits)


class SubSchemaRule(Rule):
    """A nested full schema evaluated on the same view (allOf items,
    dependency schemas)."""

    def __init__(self, compiler, definition, dtype):
        super().__init__()
        self.plan = compiler.compile_node(definition, dtype)
        self.span = self.plan.span

    @property
    def offset(self):
        return self._offset

    @offset.setter
    def offset(self, value):
        self._offset = value
        base = value
        for r in self.plan.rules:
            r.offset = base + r._abs_offset if hasattr(r, '_abs_offset') else r.offset
        # Re-assign plan rule offsets relative to our slot.
        off = value
        for r in self.plan.rules:
            r.offset = off
            off += r.span

    def evaluate(self, view, collect):
        return self.plan.evaluate(view, collect)


class _MaskOnly:
    """Evaluates a plan but discards emits (suppressed branches)."""

    @staticmethod
    def fail_mask(plan, view, collect):
        res = plan.evaluate(view, collect)
        if res.fail is None:
            return np.zeros(view.n, dtype=bool)
        return res.fail


class AnyOfRule(Rule):
    def __init__(self, compiler, definition, dtype):
        super().__init__()
        self.plans = [compiler.compile_node(item, dtype)
                      for item in definition['anyOf']]
        self.definition = compiler._expand(definition)
        self.has_branches = bool(self.plans)

    def evaluate(self, view, collect):
        if collect:
            # Reference collect-mode quirk (generator.py:273-295 + anyOf
            # try/except): branches append their errors and always count as
            # passing, so sub-violations surface and the anyOf-level error
            # fires only with zero branches.
            fail = None
            emits = []
            for p in self.plans:
                res = p.evaluate(view, collect)
                emits.extend(res.emits)
            if self.has_branches:
                return NodeResult(None, emits)
            all_fail = np.ones(view.n, dtype=bool)
            emits.append(self._own_emit(view, all_fail))
            return NodeResult(all_fail, emits)
        ok = np.zeros(view.n, dtype=bool)
        for p in self.plans:
            ok |= ~_MaskOnly.fail_mask(p, view, collect)
            if ok.all():
                break
        fail = ~ok
        if not fail.any():
            return NodeResult(None, [])
        return NodeResult(fail, [self._own_emit(view, fail)])

    def _own_emit(self, view, fail):
        idx = np.nonzero(fail)[0].astype(np.int64)
        key = np.full(len(idx), self.offset, dtype=np.int64)

        def messages(v, i):
            return [v.name_fn(j) + ' cannot be validated by any definition'
                    for j in i]
        return Emit(idx, key, 'anyOf', self.definition, messages)


class OneOfRule(Rule):
    def __init__(self, compiler, definition, dtype):
        super().__init__()
        self.plans = [compiler.compile_node(item, dtype)
                      for item in definition['oneOf']]
        self.definition = compiler._expand(definition)

    def evaluate(self, view, collect):
        if collect:
            # Collect-mode quirk: every branch "passes", so count ==
            # min(len(plans), 2) for every row.
            emits = []
            for p in self.plans:
                emits.extend(p.evaluate(view, collect).emits)
            count = min(len(self.plans), 2)
            if count == 1:
                return NodeResult(None, emits)
            fail = np.ones(view.n, dtype=bool)
            counts = np.full(view.n, count, dtype=np.int64)
            emits.append(self._own_emit(view, fail, counts))
            return NodeResult(fail, emits)
        counts = np.zeros(view.n, dtype=np.int64)
        for p in self.plans:
            active = counts < 2
            branch_ok = ~_MaskOnly.fail_mask(p, view, collect)
            counts += (active & branch_ok).astype(np.int64)
        fail = counts != 1
        if not fail.any():
            return NodeResult(None, [])
        return NodeResult(fail, [self._own_emit(view, fail, counts)])

    def _own_emit(self, view, fail, counts):
        idx = np.nonzero(fail)[0].astype(np.int64)
        key = np.full(len(idx), self.offset, dtype=np.int64)

        def messages(v, i, _c=counts):
            return [
                '{} must be valid exactly by one definition ({} matches found)'
                .format(v.name_fn(j), int(_c[j])) for j in i
            ]
        return Emit(idx, key, 'oneOf', self.definition, messages)


class NotRule(Rule):
    def __init__(self, compiler, definition, dtype):
        super().__init__()
        self.definition = compiler._expand(definition)
        nd = definition['not']
        self.mode = 'schema'
        if nd is True:
            self.mode = 'always'
        elif nd is False:
            self.mode = 'never'
        elif not nd:
            self.mode = 'always_disallowed'
        else:
            self.plan = compiler.compile_node(nd, dtype)

    def evaluate(self, view, collect):
        if self.mode == 'never':
            return NodeResult(None, [])
        if self.mode == 'always':
            fail = np.ones(view.n, dtype=bool)
            return NodeResult(fail, [self._own_emit(view, fail, ' must not be there')])
        if self.mode == 'always_disallowed':
            fail = np.ones(view.n, dtype=bool)
            return NodeResult(fail, [self._own_emit(
                view, fail, ' must NOT match a disallowed definition')])
        if collect:
            # Collect-mode quirk: sub never raises, so `not` always fails,
            # and sub-errors leak into the list first.
            emits = list(self.plan.evaluate(view, collect).emits)
            fail = np.ones(view.n, dtype=bool)
            emits.append(self._own_emit(
                view, fail, ' must NOT match a disallowed definition'))
            return NodeResult(fail, emits)
        sub_fail = _MaskOnly.fail_mask(self.plan, view, collect)
        fail = ~sub_fail
        if not fail.any():
            return NodeResult(None, [])
        return NodeResult(fail, [self._own_emit(
            view, fail, ' must NOT match a disallowed definition')])

    def _own_emit(self, view, fail, tail):
        idx = np.nonzero(fail)[0].astype(np.int64)
        key = np.full(len(idx), self.offset, dtype=np.int64)

        def messages(v, i, _tail=tail):
            return [v.name_fn(j) + _tail for j in i]
        return Emit(idx, key, 'not', self.definition, messages)


class IfThenElseRule(Rule):
    def __init__(self, compiler, definition, dtype):
        super().__init__()
        self.if_plan = compiler.compile_node(definition['if'], dtype)
        self.then_plan = (compiler.compile_node(definition['then'], dtype)
                          if 'then' in definition else None)
        self.else_plan = (compiler.compile_node(definition['else'], dtype)
                          if 'else' in definition else None)
        then_span = self.then_plan.span if self.then_plan else 0
        else_span = self.else_plan.span if self.else_plan else 0
        self.span = max(then_span + else_span, 1)
        self._then_rel = 0
        self._else_rel = then_span

    @property
    def offset(self):
        return self._offset

    @offset.setter
    def offset(self, value):
        self._offset = value
        off = value
        if self.then_plan:
            for r in self.then_plan.rules:
                r.offset = off
                off += r.span
        if self.else_plan:
            for r in self.else_plan.rules:
                r.offset = off
                off += r.span

    def evaluate(self, view, collect):
        if collect:
            # Collect-mode quirk: the `if` branch appends its errors and
            # never raises, so `then` always runs and `else` never does.
            emits = list(self.if_plan.evaluate(view, collect).emits)
            fail = None
            if self.then_plan:
                res = self.then_plan.evaluate(view, collect)
                fail = _or(fail, res.fail)
                emits.extend(res.emits)
            return NodeResult(fail, emits)
        cond_fail = _MaskOnly.fail_mask(self.if_plan, view, collect)
        fail = None
        emits = []
        if self.then_plan:
            res = self.then_plan.evaluate(view, collect)
            if res.fail is not None:
                branch_fail = res.fail & ~cond_fail
                fail = _or(fail, branch_fail)
                for e in res.emits:
                    keep = ~cond_fail[e.idx]
                    emits.append(Emit(e.idx[keep], e.key[keep], e.rule,
                                      e.definition, e.messages,
                                      e.values_override))
        if self.else_plan:
            res = self.else_plan.evaluate(view, collect)
            if res.fail is not None:
                branch_fail = res.fail & cond_fail
                fail = _or(fail, branch_fail)
                for e in res.emits:
                    keep = cond_fail[e.idx]
                    emits.append(Emit(e.idx[keep], e.key[keep], e.rule,
                                      e.definition, e.messages,
                                      e.values_override))
        return NodeResult(fail, emits)


class ListItemsRule(Rule):
    """Homogeneous ``items`` schema over list columns: flatten, evaluate the
    child plan on the flattened view, roll failures back up via offsets."""

    def __init__(self, compiler, definition, items_definition, dtype):
        super().__init__()
        self.child = compiler.compile_node(items_definition, dtype.value_type)
        self.span = self.child.span
        self.compiler = compiler

    def evaluate(self, view, collect):
        lens = self.compiler._list_lengths(view)
        total = int(lens.sum())
        if total == 0:
            return NodeResult(None, [])
        flat = pc.list_flatten(view.arr)
        parents = np.repeat(np.arange(view.n, dtype=np.int64), lens)
        positions = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens)
        parent_name = view.name_fn

        def name_fn(i):
            return '{}[{}]'.format(parent_name(int(parents[i])), int(positions[i]))

        child_view = View(flat, view.root_rows[parents], name_fn)
        res = self.child.evaluate(child_view, collect)
        if res.fail is None and not res.emits:
            return NodeResult(None, [])
        fail = np.zeros(view.n, dtype=bool)
        if res.fail is not None and res.fail.any():
            fail[np.unique(parents[res.fail])] = True
        emits = []
        span = self.span
        base = self.offset
        for e in res.emits:
            # Element-major ordering: earlier positions outrank later rules.
            new_key = base + positions[e.idx] * span + (e.key - base_child(e, self))
            emits.append(_rebased_emit(e, child_view, parents, new_key))
        return NodeResult(fail, emits)


def base_child(e, rule):
    # Child emit keys were assigned offsets starting at rule.offset (the
    # parent assigns child rule offsets from its own offset); normalize to a
    # 0-based relative key.
    return rule.offset


def _rebased_emit(e, child_view, parents, new_key):
    """Wrap a child emit so message/value generation keeps using the child
    view while indices remain child-local (idx unchanged) but the emit's
    order keys are parent-level."""
    cv = child_view

    def messages(v, i, _e=e):
        return _e.messages(cv, i)

    def values(v, i, _e=e):
        if _e.values_override is not None:
            return _e.values_override(cv, i)
        return cv.values_at(i)

    out = Emit(e.idx, new_key, e.rule, e.definition, messages, values)
    out._child_view = cv            # keep alive
    out._parents = parents          # map child idx -> parent idx at collection
    return out


class TupleItemsRule(Rule):
    """Tuple-form ``items`` (+ additionalItems) over a homogeneous Arrow list
    column: each index gets its own sub-plan over the element at that
    position."""

    def __init__(self, compiler, definition, dtype):
        super().__init__()
        self.compiler = compiler
        items = definition['items']
        vt = dtype.value_type
        self.defn = compiler._expand(definition)
        self.plans = [compiler.compile_node(d, vt) for d in items]
        for d in items:
            if compiler.scalar.use_default and isinstance(d, dict) and 'default' in d:
                raise Unsupported('tuple items defaults need the scalar path')
        self.n_tuple = len(items)
        self.additional = definition.get('additionalItems', _MISSING)
        self.add_plan = None
        if self.additional is not _MISSING and self.additional is not False \
                and self.additional is not True:
            self.add_plan = compiler.compile_node(self.additional, vt)
        spans = [p.span for p in self.plans]
        self.span = sum(spans) + 1 + (self.add_plan.span if self.add_plan else 0)
        self._spans = spans

    @property
    def offset(self):
        return self._offset

    @offset.setter
    def offset(self, value):
        self._offset = value
        off = value
        for p in self.plans:
            for r in p.rules:
                r.offset = off
                off += r.span
        self._extra_off = off
        off += 1
        if self.add_plan:
            for r in self.add_plan.rules:
                r.offset = off
                off += r.span

    def evaluate(self, view, collect):
        lens = self.compiler._list_lengths(view)
        total = int(lens.sum())
        flat = pc.list_flatten(view.arr) if total else None
        starts = np.cumsum(lens) - lens
        fail = None
        emits = []
        parent_name = view.name_fn
        for pos, plan in enumerate(self.plans):
            has = lens > pos
            if not has.any():
                continue
            rows = np.nonzero(has)[0].astype(np.int64)
            elem_idx = starts[rows] + pos
            sub_arr = flat.take(pa.array(elem_idx, type=pa.int64()))

            def name_fn(i, _rows=rows, _pos=pos):
                return '{}[{}]'.format(parent_name(int(_rows[i])), _pos)

            sub_view = View(sub_arr, view.root_rows[rows], name_fn)
            res = plan.evaluate(sub_view, collect)
            if res.fail is not None and res.fail.any():
                f = np.zeros(view.n, dtype=bool)
                f[rows[res.fail]] = True
                fail = _or(fail, f)
            for e in res.emits:
                emits.append(_tuple_emit(e, sub_view, rows))
        if self.additional is False:
            over = lens > self.n_tuple
            over &= view.valid_mask()
            if over.any():
                idx = np.nonzero(over)[0].astype(np.int64)
                key = np.full(len(idx), self._extra_off, dtype=np.int64)

                def messages(v, i):
                    return [v.name_fn(j) + ' must contain only specified items'
                            for j in i]
                emits.append(Emit(idx, key, 'items', self.defn, messages))
                fail = _or(fail, over)
        elif self.add_plan is not None:
            extra = lens - self.n_tuple
            extra[extra < 0] = 0
            tot_extra = int(extra.sum())
            if tot_extra:
                rows = np.repeat(np.arange(view.n, dtype=np.int64), extra)
                pos_in_row = (np.arange(tot_extra, dtype=np.int64)
                              - np.repeat(np.cumsum(extra) - extra, extra)
                              + self.n_tuple)
                elem_idx = starts[rows] + pos_in_row
                sub_arr = flat.take(pa.array(elem_idx, type=pa.int64()))

                def name_fn(i, _rows=rows, _pos=pos_in_row):
                    return '{}[{}]'.format(parent_name(int(_rows[i])), int(_pos[i]))

                sub_view = View(sub_arr, view.root_rows[rows], name_fn)
                res = self.add_plan.evaluate(sub_view, collect)
                if res.fail is not None and res.fail.any():
                    f = np.zeros(view.n, dtype=bool)
                    f[np.unique(rows[res.fail])] = True
                    fail = _or(fail, f)
                for e in res.emits:
                    base = self._extra_off + 1
                    new_key = base + pos_in_row[e.idx] * self.add_plan.span \
                        + (e.key - base)
                    emits.append(_tuple_emit(e, sub_view, rows, new_key))
        return NodeResult(fail, emits)


def _tuple_emit(e, sub_view, rows, new_key=None):
    sv = sub_view

    def messages(v, i, _e=e):
        return _e.messages(sv, i)

    def values(v, i, _e=e):
        if _e.values_override is not None:
            return _e.values_override(sv, i)
        return sv.values_at(i)

    out = Emit(e.idx, e.key if new_key is None else new_key, e.rule,
               e.definition, messages, values)
    out._child_view = sv
    out._parents = rows
    return out


class ContainsRule(Rule):
    def __init__(self, compiler, definition, contains_definition, dtype):
        super().__init__()
        self.compiler = compiler
        self.definition = compiler._expand(definition)
        self.child = compiler.compile_node(contains_definition, dtype.value_type)

    def evaluate(self, view, collect):
        lens = self.compiler._list_lengths(view)
        total = int(lens.sum())
        any_ok = np.zeros(view.n, dtype=bool)
        if total:
            flat = pc.list_flatten(view.arr)
            parents = np.repeat(np.arange(view.n, dtype=np.int64), lens)
            child_view = View(flat, view.root_rows[parents], lambda i: 'x')
            child_fail = _MaskOnly.fail_mask(self.child, child_view, False)
            ok_parents = parents[~child_fail]
            if len(ok_parents):
                any_ok[np.unique(ok_parents)] = True
        fail = ~any_ok
        fail &= view.valid_mask()
        if not fail.any():
            return NodeResult(None, [])
        idx = np.nonzero(fail)[0].astype(np.int64)
        key = np.full(len(idx), self.offset, dtype=np.int64)

        def messages(v, i):
            return [v.name_fn(j) + ' must contain one of contains definition'
                    for j in i]
        return NodeResult(fail, [Emit(idx, key, 'contains',
                                      self.definition, messages)])


class PropertiesRule(Rule):
    """``properties`` over a struct: per-field sub-plans. Field access is
    zero-copy (``StructArray.field``); child checks are masked where the
    parent struct row is null (the document value is not a dict there)."""

    def __init__(self, compiler, definition, dtype):
        super().__init__()
        self.fields = []
        names = {f.name: i for i, f in enumerate(dtype)}
        for key, prop_definition in definition['properties'].items():
            if not isinstance(prop_definition, (dict, bool)):
                raise JsonSchemaDefinitionException(
                    'data[{}] must be object'.format(
                        re.sub(r'($[^a-zA-Z]|[^a-zA-Z0-9])', '', key)))
            if key in names:
                plan = compiler.compile_node(
                    prop_definition, dtype.field(names[key]).type)
                self.fields.append((key, names[key], plan))
            else:
                if compiler.scalar.use_default and isinstance(prop_definition, dict) \
                        and 'default' in prop_definition:
                    raise Unsupported('nested defaults need the scalar path')
                # Key absent from the struct: nothing to validate (presence
                # is `required`'s business).
        spans = [p.span for _, _, p in self.fields]
        self.span = max(sum(spans), 1)

    @property
    def offset(self):
        return self._offset

    @offset.setter
    def offset(self, value):
        self._offset = value
        off = value
        for _, _, plan in self.fields:
            for r in plan.rules:
                r.offset = off
                off += r.span

    def evaluate(self, view, collect):
        if not self.fields:
            return NodeResult(None, [])
        arr = view.arr
        parent_valid = view.valid_mask()
        parent_name = view.name_fn
        fail = None
        emits = []
        for key, field_idx, plan in self.fields:
            child = arr.field(field_idx)

            def name_fn(i, _key=key):
                return '{}.{}'.format(parent_name(int(i)), _key)

            child_view = View(child, view.root_rows, name_fn)
            res = plan.evaluate(child_view, collect)
            if res.fail is None and not res.emits:
                continue
            if res.fail is not None:
                f = res.fail & parent_valid
                fail = _or(fail, f)
            for e in res.emits:
                keep = parent_valid[_emit_parent_idx(e)]
                emits.append(_filter_emit(e, keep))
        return NodeResult(fail, emits)


def _emit_parent_idx(e):
    """Map an emit's (possibly child-level) indices to this view's rows."""
    if hasattr(e, '_parents'):
        return e._parents[e.idx]
    return e.idx


def _filter_emit(e, keep):
    if keep.all():
        return e
    out = Emit(e.idx[keep], e.key[keep], e.rule, e.definition,
               e.messages, e.values_override)
    for attr in ('_child_view', '_parents'):
        if hasattr(e, attr):
            setattr(out, attr, getattr(e, attr))
    return out


class PatternPropertiesRule(Rule):
    def __init__(self, compiler, definition, dtype):
        super().__init__()
        self.inner = []
        keys = [f.name for f in dtype]
        names = {f.name: i for i, f in enumerate(dtype)}
        for pattern, sub_definition in definition['patternProperties'].items():
            rx = re.compile(pattern)
            for key in keys:
                if rx.search(key):
                    plan = compiler.compile_node(
                        sub_definition, dtype.field(names[key]).type)
                    self.inner.append((key, names[key], plan))
        self.span = max(sum(p.span for _, _, p in self.inner), 1)

    @property
    def offset(self):
        return self._offset

    @offset.setter
    def offset(self, value):
        self._offset = value
        off = value
        for _, _, plan in self.inner:
            for r in plan.rules:
                r.offset = off
                off += r.span

    def evaluate(self, view, collect):
        if not self.inner:
            return NodeResult(None, [])
        parent_valid = view.valid_mask()
        parent_name = view.name_fn
        fail = None
        emits = []
        for key, field_idx, plan in self.inner:
            child = view.arr.field(field_idx)

            def name_fn(i, _key=key):
                return '{}.{}'.format(parent_name(int(i)), _key)

            child_view = View(child, view.root_rows, name_fn)
            res = plan.evaluate(child_view, collect)
            if res.fail is not None:
                fail = _or(fail, res.fail & parent_valid)
            for e in res.emits:
                keep = parent_valid[_emit_parent_idx(e)]
                emits.append(_filter_emit(e, keep))
        return NodeResult(fail, emits)


class AdditionalPropertiesRule(Rule):
    def __init__(self, compiler, definition, dtype):
        super().__init__()
        add = definition['additionalProperties']
        self.definition = compiler._expand(definition)
        keys = [f.name for f in dtype]
        consumed = set(definition.get('properties', {}).keys())
        for pattern in definition.get('patternProperties', {}):
            rx = re.compile(pattern)
            consumed |= {k for k in keys if rx.search(k)}
        self.leftover = [k for k in keys if k not in consumed]
        self.mode = 'noop'
        self.plans = []
        if add is True or add == {}:
            return
        if add is False:
            self.mode = 'forbid' if self.leftover else 'noop'
        else:
            self.mode = 'validate'
            names = {f.name: i for i, f in enumerate(dtype)}
            prop_keys = list(definition.get('properties', {}).keys())
            # Reference semantics: additionalProperties validates keys left
            # in the keys-set (i.e. not matched by properties/pattern) that
            # are also not declared in `properties` (draft04.py:619-628).
            for k in self.leftover:
                if k not in prop_keys:
                    self.plans.append(
                        (k, names[k], compiler.compile_node(add, dtype.field(names[k]).type)))
        self.span = max(sum(p.span for _, _, p in self.plans), 1)

    @property
    def offset(self):
        return self._offset

    @offset.setter
    def offset(self, value):
        self._offset = value
        off = value
        for _, _, plan in self.plans:
            for r in plan.rules:
                r.offset = off
                off += r.span

    def evaluate(self, view, collect):
        if self.mode == 'noop':
            return NodeResult(None, [])
        parent_valid = view.valid_mask()
        if self.mode == 'forbid':
            fail = parent_valid.copy()
            if not fail.any():
                return NodeResult(None, [])
            idx = np.nonzero(fail)[0].astype(np.int64)
            key = np.full(len(idx), self.offset, dtype=np.int64)
            leftover_set = set(self.leftover)

            def messages(v, i):
                return ['{} must not contain {} properties'.format(
                    v.name_fn(j), leftover_set) for j in i]
            return NodeResult(fail, [Emit(idx, key, 'additionalProperties',
                                          self.definition, messages)])
        parent_name = view.name_fn
        fail = None
        emits = []
        for k, field_idx, plan in self.plans:
            child = view.arr.field(field_idx)

            def name_fn(i, _key=k):
                return '{}.{}'.format(parent_name(int(i)), _key)

            child_view = View(child, view.root_rows, name_fn)
            res = plan.evaluate(child_view, collect)
            if res.fail is not None:
                fail = _or(fail, res.fail & parent_valid)
            for e in res.emits:
                keep = parent_valid[_emit_parent_idx(e)]
                emits.append(_filter_emit(e, keep))
        return NodeResult(fail, emits)

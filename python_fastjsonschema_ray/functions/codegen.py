"""Readable straight-line source emitter for ``compile_to_code``.

The reference ships generated Python source as its deployment artifact
(``fastjsonschema/__init__.py:294-341`` + ``generator.py``); this engine's
primary validators are closure trees (``functions/scalar.py``) and Arrow
plans (``functions/vector.py``), so the artifact needs its own emitter.
This module walks the schema with the SAME keyword-order tables and the
same cell-passing convention as :class:`ScalarCompiler` — one emitted
function per subschema scope, ``vN(cell, name)``, sharing or forking the
one-element ``cell`` exactly where the closure tree shares or forks it —
so the emitted module reproduces the interpreter's behavior (and therefore
the reference's, which the interpreter is differentially tested against)
by construction.

The artifact is fully self-contained and dependency-free: a short readable
prologue inlines the exception classes (preferring the installed package's
classes when available, so ``except engine.JsonSchemaValueException``
keeps catching) and the two value-semantics helpers (``_enum_match``,
``_freeze``).  No string-template machinery is shared with the reference's
``CodeGenerator``; the emission is driven by the interpreter's own
compile-time analysis.

Coverage: fast-fail mode, detailed or plain exceptions, regex custom
formats, all draft-04/06/07 keywords including transforms (``default``
fill, ``contentEncoding``/``contentMediaType`` replacement) and local or
handler-resolved ``$ref``.  Out of scope (the caller falls back to the
vendored-runtime artifact): collect mode, callable custom formats, and
plugin keywords.
"""

from __future__ import annotations

import re
from decimal import Decimal

from ..exceptions import JsonSchemaDefinitionException
from .scalar import (
    _JSON_TYPES,
    _MISSING,
    _embed_in_source,
    _strip_key,
)


class Unemittable(Exception):
    """Schema/flags combination the straight-line emitter does not cover;
    the caller falls back to the vendored-runtime artifact."""


_PROLOGUE = '''\
import base64
import json
import re
from decimal import Decimal

try:
    # Prefer the installed engine's exception classes so artifact
    # violations are caught by code written against the package.
    from python_fastjsonschema_ray.exceptions import (
        JsonSchemaException,
        JsonSchemaValueException,
        JsonSchemaDefinitionException,
    )
except ImportError:
    class JsonSchemaException(ValueError):
        pass

    class JsonSchemaValueException(JsonSchemaException):
        def __init__(self, message, value=None, name=None, definition=None,
                     rule=None):
            super().__init__(message)
            self.message = message
            self.value = value
            self.name = name
            self.definition = definition
            self.rule = rule

        @property
        def path(self):
            return [p for p in re.split(r"[\\.\\[\\]]+", self.name) if p]

        @property
        def rule_definition(self):
            if not self.rule or not self.definition:
                return None
            return self.definition.get(self.rule)

    class JsonSchemaDefinitionException(JsonSchemaException):
        pass


def _enum_match(value, target):
    """Type-strict deep equality for enum/const (bool is not 1/0;
    int and float cross-match; containers compare element-wise)."""
    if isinstance(target, bool):
        return isinstance(value, bool) and value is target
    if isinstance(target, (int, float)):
        return (isinstance(value, (int, float))
                and not isinstance(value, bool) and value == target)
    if target is None:
        return value is None
    if isinstance(target, str):
        return isinstance(value, str) and value == target
    if isinstance(target, dict):
        if not isinstance(value, dict):
            return False
        if not target:
            return not value
        if len(value) != len(target):
            return False
        return all(k in value and _enum_match(value[k], v)
                   for k, v in target.items())
    if isinstance(target, (list, tuple)):
        if not isinstance(value, (list, tuple)):
            return False
        if not target:
            return not value
        if len(value) != len(target):
            return False
        return all(_enum_match(value[i], v) for i, v in enumerate(target))
    return value == target


def _freeze(var):
    """Deep-hashable form for uniqueItems; bools stringified so True is
    distinct from 1."""
    if hasattr(var, 'items'):
        return frozenset({k: _freeze(v) for k, v in var.items()}.items())
    if isinstance(var, (dict, list)):
        return tuple(_freeze(v) for v in var)
    if isinstance(var, bool):
        return str(var)
    return var
'''


class SourceEmitter:
    """Emit a standalone module's source for one compiled schema.

    Construction takes an already-validated :class:`ScalarCompiler`
    (whose registry holds the $ref-rewritten schema); ``emit_module()``
    returns the artifact source or raises :class:`Unemittable`.
    """

    def __init__(self, compiler):
        if not compiler.fast_fail:
            raise Unemittable('collect mode (fast_fail=False) is not '
                              'straight-line emittable')
        if any(not isinstance(v, str)
               for v in compiler.custom_formats.values()):
            raise Unemittable('callable custom formats cannot be '
                              'serialized')
        from .plugins import REGISTRY as _PLUGINS
        self._plugin_names = set(_PLUGINS)
        self.c = compiler
        self.registry = compiler.registry
        self._funcs = []            # emitted function sources, in order
        self._fn_by_uri = {}        # resolved $ref uri -> function name
        self._ref_worklist = []
        self._regexes = {}          # (pattern, dollar_fix) -> const name
        self._counter = 0

    # -- naming ----------------------------------------------------------

    def _new_fn(self, hint):
        self._counter += 1
        return 'v{}_{}'.format(self._counter, _strip_key(hint)[:30] or 'x')

    def _regex_const(self, pattern, *, dollar_fix=False):
        key = (pattern, dollar_fix)
        name = self._regexes.get(key)
        if name is None:
            name = 'RE_{}'.format(len(self._regexes))
            self._regexes[key] = name
        return name

    # -- exception sites --------------------------------------------------

    def _raise(self, message_expr, definition, rule, value_expr='cell[0]'):
        """Source for one raise site.  ``message_expr`` is a source
        expression (usually ``name + <tail literal>``)."""
        if not self.c.detailed:
            return ('raise JsonSchemaValueException({})'
                    .format(message_expr))
        expanded = self.registry.expand_refs(definition)
        return ('raise JsonSchemaValueException({}, {}, name, {!r}, {!r})'
                .format(message_expr, value_expr, expanded, rule))

    # -- function emission -------------------------------------------------

    def _fn_for_uri(self, uri):
        name = self._fn_by_uri.get(uri)
        if name is None:
            name = self._fn_by_uri[uri] = self._new_fn('ref')
            self._ref_worklist.append(uri)
        return name

    def _emit_node(self, definition, hint):
        """Emit a function for one subschema; returns its name."""
        fn = self._new_fn(hint)
        body = self._node_body(definition)
        src = ['def {}(cell, name):'.format(fn)]
        if _needs_keys(definition):
            src.append('    keys = None')
        src.extend('    ' + line for line in body)
        self._funcs.append('\n'.join(src))
        return fn

    def _node_body(self, definition):
        if isinstance(definition, bool):
            if self.c.draft <= 4:
                raise JsonSchemaDefinitionException(
                    'definition must be an object')
            if definition:
                return ['pass']
            return [self._raise("name + ' must not be there'",
                                definition, None)]
        if not isinstance(definition, dict):
            raise JsonSchemaDefinitionException('definition must be an object')
        if '$ref' in definition:
            ref = definition['$ref']
            with self.registry.in_scope(ref):
                uri = self.registry.current_uri()
            return ['{}(cell, name)'.format(self._fn_for_uri(uri))]

        if self._plugin_names & set(definition):
            raise Unemittable('plugin keywords cannot be serialized')

        lines = []
        state = {'keys_done': False}
        for keyword in self.c.order:
            if keyword in definition:
                block = getattr(self, '_e_' + _strip_key(keyword))(
                    definition, state)
                if block:
                    lines.append('# ' + keyword)
                    lines.extend(block)
        return lines or ['pass']

    def _sub_fn(self, sub_definition, hint):
        """Function name validating ``sub_definition`` (dedicated function,
        or the shared per-URI function for a $ref node)."""
        if isinstance(sub_definition, dict) and '$ref' in sub_definition:
            ref = sub_definition['$ref']
            with self.registry.in_scope(ref):
                uri = self.registry.current_uri()
            return self._fn_for_uri(uri)
        return self._emit_node(sub_definition, hint)

    # -- per-keyword emitters ----------------------------------------------
    # Each returns a list of source lines; every block reads the current
    # value directly from ``cell[0]`` (transform keywords write back to the
    # cell, matching the interpreter's shared-cell convention).

    def _e_type(self, definition, state):
        types = definition['type']
        types = types if isinstance(types, list) else [types]
        try:
            pytuple = tuple(t for jt in types for t in _JSON_TYPES[jt])
        except KeyError as exc:
            raise JsonSchemaDefinitionException('Unknown type') from exc
        names = []
        for t in pytuple:
            if t.__name__ not in names:
                names.append(t.__name__)
        iso = 'isinstance(cell[0], ({},))'.format(', '.join(
            'type(None)' if n == 'NoneType' else n for n in names))
        cond = 'not ' + iso
        if self.c.draft >= 6 and 'integer' in types:
            cond = ('not ({} or (isinstance(cell[0], float) '
                    'and cell[0].is_integer()))'.format(iso))
        if (('number' in types or 'integer' in types)
                and 'boolean' not in types):
            cond = '({}) or isinstance(cell[0], bool)'.format(cond)
        tail = ' must be {}'.format(' or '.join(types))
        return ['if {}:'.format(cond),
                '    ' + self._raise('name + {!r}'.format(tail),
                                     definition, 'type')]

    def _e_enum(self, definition, state):
        enum = definition['enum']
        if not isinstance(enum, (list, tuple)):
            raise JsonSchemaDefinitionException('enum must be an array')
        tail = ' must be one of ' + _embed_in_source(str(enum))
        return ['if not any(_enum_match(cell[0], o) for o in {!r}):'
                .format(list(enum)),
                '    ' + self._raise('name + {!r}'.format(tail),
                                     definition, 'enum')]

    def _e_allOf(self, definition, state):
        return ['{}(cell, name)'.format(
            self._sub_fn(item, 'allof'))
            for item in definition['allOf']]

    def _e_anyOf(self, definition, state):
        lines = ['for sub in ({},):'.format(', '.join(
                    self._sub_fn(item, 'anyof')
                    for item in definition['anyOf'])),
                 '    try:',
                 '        sub(cell, name)',
                 '        break',
                 '    except JsonSchemaValueException:',
                 '        pass',
                 'else:',
                 '    ' + self._raise(
                     "name + ' cannot be validated by any definition'",
                     definition, 'anyOf')]
        return lines

    def _e_oneOf(self, definition, state):
        lines = ['count = 0',
                 'for sub in ({},):'.format(', '.join(
                     self._sub_fn(item, 'oneof')
                     for item in definition['oneOf'])),
                 '    if count < 2:',
                 '        try:',
                 '            sub(cell, name)',
                 '            count += 1',
                 '        except JsonSchemaValueException:',
                 '            pass',
                 'if count != 1:',
                 '    ' + self._raise(
                     "name + ' must be valid exactly by one definition'"
                     " + ' ({} matches found)'.format(count)",
                     definition, 'oneOf')]
        return lines

    def _e_not(self, definition, state):
        nd = definition['not']
        if nd is True:
            return [self._raise("name + ' must not be there'",
                                definition, 'not')]
        if nd is False:
            return []
        if not nd:
            return [self._raise(
                "name + ' must NOT match a disallowed definition'",
                definition, 'not')]
        fn = self._sub_fn(nd, 'not')
        return ['try:',
                '    {}(cell, name)'.format(fn),
                'except JsonSchemaValueException:',
                '    pass',
                'else:',
                '    ' + self._raise(
                    "name + ' must NOT match a disallowed definition'",
                    definition, 'not')]

    def _len_check(self, definition, keyword, pytype, op, tail, state):
        n = definition[keyword]
        if not isinstance(n, (int, float)):
            raise JsonSchemaDefinitionException(
                '{} must be a number'.format(keyword))
        return ['if isinstance(cell[0], {}) and len(cell[0]) {} {!r}:'
                .format(pytype, op, n),
                '    ' + self._raise('name + {!r}'.format(tail.format(n)),
                                     definition, keyword)]

    def _e_minLength(self, definition, state):
        return self._len_check(
            definition, 'minLength', 'str', '<',
            ' must be longer than or equal to {} characters', state)

    def _e_maxLength(self, definition, state):
        return self._len_check(
            definition, 'maxLength', 'str', '>',
            ' must be shorter than or equal to {} characters', state)

    def _e_pattern(self, definition, state):
        pattern = definition['pattern']
        self.c._regex(pattern, dollar_fix=True)   # validate it compiles
        const = self._regex_const(pattern, dollar_fix=True)
        tail = ' must match pattern {}'.format(pattern)
        return ['if isinstance(cell[0], str) and not {}.search(cell[0]):'
                .format(const),
                '    ' + self._raise('name + {!r}'.format(tail),
                                     definition, 'pattern')]

    def _e_format(self, definition, state):
        if not self.c.use_formats:
            return []
        format_ = definition['format']
        tail = ' must be ' + format_
        if format_ in self.c.custom_formats:
            const = self._regex_const(self.c.custom_formats[format_])
            method = 'match'
        elif format_ in self.c.format_regexs:
            const = self._regex_const(self.c.format_regexs[format_])
            method = 'match'
        elif format_ == 'regex':
            return ['if isinstance(cell[0], str):',
                    '    try:',
                    '        re.compile(cell[0])',
                    '    except Exception:',
                    '        ' + self._raise(
                        "name + ' must be a valid regex'",
                        definition, 'format')]
        else:
            return []   # unknown formats are ignored
        return ['if isinstance(cell[0], str) and not {}.{}(cell[0]):'
                .format(const, method),
                '    ' + self._raise('name + {!r}'.format(tail),
                                     definition, 'format')]

    def _bound_lines(self, definition, keyword):
        bound = definition[keyword]
        if not isinstance(bound, (int, float, Decimal)):
            article = ('an integer, a float or a decimal'
                       if keyword.startswith('exclusive') else 'a number')
            raise JsonSchemaDefinitionException(
                '{} must be {}'.format(keyword, article))
        exclusive = (definition.get(
            'exclusive' + keyword[0].upper() + keyword[1:], False)
            if keyword in ('minimum', 'maximum') else True)
        runtime = (float(str(bound)) if isinstance(bound, Decimal)
                   else bound)
        lo = 'inimum' in keyword
        op = ('<=' if exclusive else '<') if lo else \
             ('>=' if exclusive else '>')
        word = 'bigger' if lo else 'smaller'
        tail = (' must be {} than {}'.format(word, bound) if exclusive
                else ' must be {} than or equal to {}'.format(word, bound))
        return ['if isinstance(cell[0], (int, float, Decimal)) '
                'and cell[0] {} {!r}:'.format(op, runtime),
                '    ' + self._raise('name + {!r}'.format(tail),
                                     definition, keyword)]

    def _e_minimum(self, definition, state):
        return self._bound_lines(definition, 'minimum')

    def _e_maximum(self, definition, state):
        return self._bound_lines(definition, 'maximum')

    def _e_exclusiveMinimum(self, definition, state):
        return self._bound_lines(definition, 'exclusiveMinimum')

    def _e_exclusiveMaximum(self, definition, state):
        return self._bound_lines(definition, 'exclusiveMaximum')

    def _e_multipleOf(self, definition, state):
        mo = definition['multipleOf']
        if not isinstance(mo, (int, float, Decimal)):
            raise JsonSchemaDefinitionException('multipleOf must be a number')
        use_decimal = isinstance(mo, float)
        runtime = float(str(mo)) if isinstance(mo, Decimal) else mo
        tail = ' must be multiple of {}'.format(mo)
        quotient = ('Decimal(repr(cell[0])) / Decimal(repr({!r}))'
                    .format(runtime) if use_decimal
                    else 'cell[0] / {!r}'.format(runtime))
        raise_site = self._raise('name + {!r}'.format(tail),
                                 definition, 'multipleOf')
        return [
            'if isinstance(cell[0], (int, float, Decimal)):',
            '    if isinstance(cell[0], float) and (cell[0] != cell[0] '
            "or cell[0] in (float('inf'), float('-inf'))):",
            '        ' + raise_site,
            '    quotient = ' + quotient,
            '    if int(quotient) != quotient:',
            '        ' + raise_site,
            "    if cell[0] / {!r} == float('inf'):".format(runtime),
            '        ' + self._raise("'inifinity reached'", definition,
                                     'multipleOf'),
        ]

    def _e_minItems(self, definition, state):
        return self._len_check(
            definition, 'minItems', '(list, tuple)', '<',
            ' must contain at least {} items', state)

    def _e_maxItems(self, definition, state):
        return self._len_check(
            definition, 'maxItems', '(list, tuple)', '>',
            ' must contain less than or equal to {} items', state)

    def _e_uniqueItems(self, definition, state):
        if not definition['uniqueItems']:
            return []
        return ['if isinstance(cell[0], (list, tuple)) and '
                'len(cell[0]) > len({_freeze(x) for x in cell[0]}):',
                '    ' + self._raise(
                    "name + ' must contain unique items'",
                    definition, 'uniqueItems')]

    def _e_items(self, definition, state):
        items_definition = definition['items']
        if items_definition is True:
            return []
        if items_definition is False:
            return ['if isinstance(cell[0], (list, tuple)) and cell[0]:',
                    '    ' + self._raise("name + ' must not be there'",
                                         definition, 'items')]
        if isinstance(items_definition, list):
            lines = ['if isinstance(cell[0], (list, tuple)):',
                     '    orig_len = len(cell[0])']
            for idx, d in enumerate(items_definition):
                fn = self._sub_fn(d, 'item{}'.format(idx))
                lines.append('    if orig_len > {}:'.format(idx))
                lines.append(
                    "        {}([cell[0][{}]], '{{}}[{}]'.format(name))"
                    .format(fn, idx, idx))
                if (self.c.use_default and isinstance(d, dict)
                        and 'default' in d):
                    lines.append('    elif isinstance(cell[0], list):')
                    lines.append('        cell[0].append({!r})'
                                 .format(d['default']))
            additional = definition.get('additionalItems', _MISSING)
            if additional is False:
                lines.append('    if orig_len > {}:'
                             .format(len(items_definition)))
                lines.append('        ' + self._raise(
                    "name + ' must contain only specified items'",
                    definition, 'items'))
            elif additional is not _MISSING:
                fn = self._sub_fn(additional, 'additem')
                lines.append('    for pos in range({}, len(cell[0])):'
                             .format(len(items_definition)))
                lines.append(
                    "        {}([cell[0][pos]], '{{}}[{{}}]'"
                    '.format(name, pos))'.format(fn))
            return lines
        if not items_definition:
            return []
        fn = self._sub_fn(items_definition, 'item')
        return ['if isinstance(cell[0], (list, tuple)):',
                '    for pos, item in enumerate(cell[0]):',
                "        {}([item], '{{}}[{{}}]'.format(name, pos))"
                .format(fn)]

    def _e_minProperties(self, definition, state):
        return self._len_check(
            definition, 'minProperties', 'dict', '<',
            ' must contain at least {} properties', state)

    def _e_maxProperties(self, definition, state):
        return self._len_check(
            definition, 'maxProperties', 'dict', '>',
            ' must contain less than or equal to {} properties', state)

    def _e_required(self, definition, state):
        required = definition['required']
        if not isinstance(required, (list, tuple)):
            raise JsonSchemaDefinitionException('required must be an array')
        if len(required) != len(set(required)):
            raise JsonSchemaDefinitionException(
                'required must contain unique elements')
        if not definition.get('additionalProperties', True):
            not_possible = [
                prop for prop in required
                if prop not in definition.get('properties', {})
                and not any(re.search(regex, prop)
                            for regex in definition.get(
                                'patternProperties', {}))
            ]
            if not_possible:
                raise JsonSchemaDefinitionException(
                    'data: items {} are required but not allowed'
                    .format(not_possible))
        return ['if isinstance(cell[0], dict):',
                '    missing = {!r} - cell[0].keys()'.format(set(required)),
                '    if missing:',
                '        ' + self._raise(
                    "'{} must contain {} properties'"
                    '.format(name, sorted(missing))',
                    definition, 'required')]

    def _e_dependencies(self, definition, state):
        lines = ['if isinstance(cell[0], dict):']
        n = 0
        for key, values in definition['dependencies'].items():
            if values == [] or values is True:
                continue
            n += 1
            lines.append('    if {!r} in cell[0]:'.format(key))
            if values is False:
                lines.append('        ' + self._raise(
                    "{!r} + name + ' must not be there'"
                    .format(key + ' in '),
                    definition, 'dependencies'))
            elif isinstance(values, list):
                for dep in values:
                    lines.append('        if {!r} not in cell[0]:'
                                 .format(dep))
                    tail = ' missing dependency {} for {}'.format(dep, key)
                    lines.append('            ' + self._raise(
                        'name + {!r}'.format(tail),
                        definition, 'dependencies'))
            else:
                fn = self._sub_fn(values, 'dep')
                lines.append('        {}(cell, name)'.format(fn))
        return lines if n else []

    def _keys_init(self, state):
        """Lazy shared consumed-keys set (properties / patternProperties /
        additionalProperties / propertyNames-False all share it, matching
        the interpreter's per-node ``local['keys']``)."""
        if state['keys_done']:
            return []
        state['keys_done'] = True
        return ['    if keys is None:',
                '        keys = set(cell[0].keys())']

    def _e_properties(self, definition, state):
        lines = ['if isinstance(cell[0], dict):']
        lines += self._keys_init(state)
        for key, prop_definition in definition['properties'].items():
            key_name = _strip_key(key)
            if not isinstance(prop_definition, (dict, bool)):
                raise JsonSchemaDefinitionException(
                    'data[{}] must be object'.format(key_name))
            fn = self._sub_fn(prop_definition, 'prop_' + key_name)
            lines.append('    if {!r} in keys:'.format(key))
            lines.append('        keys.remove({!r})'.format(key))
            lines.append("        {}([cell[0][{!r}]], name + {!r})"
                         .format(fn, key, '.' + key))
            if (self.c.use_default and isinstance(prop_definition, dict)
                    and 'default' in prop_definition):
                lines.append('    else:')
                lines.append('        cell[0][{!r}] = {!r}'
                             .format(key, prop_definition['default']))
        return lines

    def _e_patternProperties(self, definition, state):
        pattern_definition = definition['patternProperties']
        lines = ['if isinstance(cell[0], dict):']
        lines += self._keys_init(state)
        if not pattern_definition:
            return lines if len(lines) > 1 else []
        pairs = []
        for pattern, sub_definition in pattern_definition.items():
            const = self._regex_const(pattern)
            fn = self._sub_fn(sub_definition, 'patprop')
            pairs.append('({}, {})'.format(const, fn))
        lines.append('    for key, val in cell[0].items():')
        lines.append('        for regex, sub in ({},):'
                     .format(', '.join(pairs)))
        lines.append('            if regex.search(key):')
        lines.append('                keys.discard(key)')
        lines.append("                sub([val], '{}.{}'.format(name, key))")
        return lines

    def _e_additionalProperties(self, definition, state):
        add_definition = definition['additionalProperties']
        lines = ['if isinstance(cell[0], dict):']
        lines += self._keys_init(state)
        if add_definition is True or add_definition == {}:
            return lines if len(lines) > 1 else []
        if add_definition:
            fn = self._sub_fn(add_definition, 'addprop')
            props = list(definition.get('properties', {}).keys())
            lines.append('    for key in keys:')
            lines.append('        if key not in {!r}:'.format(props))
            lines.append(
                "            {}([cell[0].get(key)], "
                "'{{}}.{{}}'.format(name, key))".format(fn))
            return lines
        lines.append('    if keys:')
        lines.append('        ' + self._raise(
            "'{} must not contain {} properties'.format(name, keys)",
            definition, 'additionalProperties'))
        return lines

    def _e_propertyNames(self, definition, state):
        names_definition = definition.get('propertyNames', {})
        if names_definition is True:
            return []
        lines = ['if isinstance(cell[0], dict):']
        if names_definition is False:
            lines += self._keys_init(state)
            lines.append('    if keys:')
            lines.append('        ' + self._raise(
                "name + ' must not be there'", definition,
                'propertyNames'))
            return lines
        fn = self._sub_fn(names_definition, 'propname')
        return ['if isinstance(cell[0], dict) and len(cell[0]):',
                '    ok = True',
                '    for key in cell[0]:',
                '        try:',
                '            {}([key], name)'.format(fn),
                '        except JsonSchemaValueException:',
                '            ok = False',
                '    if not ok:',
                '        ' + self._raise(
                    "name + ' must be named by propertyName definition'",
                    definition, 'propertyNames')]

    def _e_contains(self, definition, state):
        contains_definition = definition['contains']
        if contains_definition is False:
            return ['if isinstance(cell[0], (list, tuple)):',
                    '    ' + self._raise("name + ' is always invalid'",
                                         definition, 'contains')]
        if contains_definition is True:
            return ['if isinstance(cell[0], (list, tuple)) '
                    'and not cell[0]:',
                    '    ' + self._raise("name + ' must not be empty'",
                                         definition, 'contains')]
        fn = self._sub_fn(contains_definition, 'contains')
        return ['if isinstance(cell[0], (list, tuple)):',
                '    for item in cell[0]:',
                '        try:',
                '            {}([item], name)'.format(fn),
                '            break',
                '        except JsonSchemaValueException:',
                '            pass',
                '    else:',
                '        ' + self._raise(
                    "name + ' must contain one of contains definition'",
                    definition, 'contains')]

    def _e_const(self, definition, state):
        const = definition['const']
        tail = ' must be same as const definition: {}'.format(
            const if isinstance(const, str)
            else _embed_in_source(str(const)))
        return ['if not _enum_match(cell[0], {!r}):'.format(const),
                '    ' + self._raise('name + {!r}'.format(tail),
                                     definition, 'const')]

    def _e_if(self, definition, state):
        if_fn = self._sub_fn(definition['if'], 'if')
        then_fn = (self._sub_fn(definition['then'], 'then')
                   if 'then' in definition else None)
        else_fn = (self._sub_fn(definition['else'], 'else')
                   if 'else' in definition else None)
        lines = ['try:',
                 '    {}(cell, name)'.format(if_fn),
                 'except JsonSchemaValueException:']
        lines.append('    {}(cell, name)'.format(else_fn)
                     if else_fn else '    pass')
        lines.append('else:')
        lines.append('    {}(cell, name)'.format(then_fn)
                     if then_fn else '    pass')
        return lines

    def _e_contentEncoding(self, definition, state):
        if definition['contentEncoding'] != 'base64':
            return []
        return ['if isinstance(cell[0], str):',
                '    try:',
                '        cell[0] = base64.b64decode(cell[0])',
                '    except Exception:',
                '        ' + self._raise(
                    "name + ' must be encoded by base64'",
                    definition, None),
                "    if cell[0] == '':",
                '        ' + self._raise(
                    "'contentEncoding must be base64'", definition, None)]

    def _e_contentMediaType(self, definition, state):
        if definition['contentMediaType'] != 'application/json':
            return []
        return ['if isinstance(cell[0], bytes):',
                '    try:',
                "        cell[0] = cell[0].decode('utf-8')",
                '    except Exception:',
                '        ' + self._raise(
                    "name + ' must encoded by utf8'", definition, None),
                'if isinstance(cell[0], str):',
                '    try:',
                '        cell[0] = json.loads(cell[0])',
                '    except Exception:',
                '        ' + self._raise(
                    "name + ' must be valid JSON'", definition, None)]

    # -- module assembly -----------------------------------------------------

    def emit_module(self, header_lines):
        root_uri = self.registry.current_uri()
        root_fn = self._fn_for_uri(root_uri)
        while self._ref_worklist:
            uri = self._ref_worklist.pop()
            fn = self._fn_by_uri[uri]
            with self.registry.resolving(uri) as target:
                body = self._node_body(target)
            src = ['def {}(cell, name):'.format(fn)]
            src.append("    # schema scope: {}".format(uri or '#'))
            if _needs_keys(target):
                src.append('    keys = None')
            src.extend('    ' + line for line in body)
            self._funcs.append('\n'.join(src))

        parts = list(header_lines)
        parts.append(_PROLOGUE)
        if self._regexes:
            for (pattern, dollar_fix), const in self._regexes.items():
                src_pattern = (re.sub(r'(?<!\\)\$', r'\\Z', pattern)
                               if dollar_fix else pattern)
                parts.append('{} = re.compile({!r})'
                             .format(const, src_pattern))
            parts.append('')
        parts.extend(self._funcs)
        parts.append("def validate(data, name='data'):\n"
                     '    cell = [data]\n'
                     '    {}(cell, name)\n'
                     '    return cell[0]'.format(root_fn))
        return '\n\n'.join(parts) + '\n'


def _needs_keys(definition):
    return isinstance(definition, dict) and any(k in definition for k in (
        'properties', 'patternProperties', 'additionalProperties',
        'propertyNames'))


def emit_source(compiler, header_lines):
    """Emit standalone straight-line source for ``compiler``'s schema, or
    raise :class:`Unemittable` for combinations the emitter doesn't cover
    (the caller falls back to the vendored-runtime artifact)."""
    emitter = SourceEmitter(compiler)
    return emitter.emit_module(header_lines)

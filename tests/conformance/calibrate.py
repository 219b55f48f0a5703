"""Calibration generator for the conformance slice.

The official JSON-Schema-Test-Suite submodule is empty in this checkout
(reference: /root/reference/tests/json_schema/utils.py:73-129), so the slice
in draft{4,6,7,2019}.json is self-authored.  This script grows it safely:

  1. author candidate cases with the OFFICIAL-SUITE verdict we expect from
     the spec (``valid``);
  2. run the reference implementation on every case;
  3. keep only cases where the reference agrees with the spec verdict
     (the harness asserts engine == reference == ``valid`` on every case);
  4. print the divergences so genuinely interesting ones can be pinned in
     tests/test_reference_divergences.py instead.

Run:  python tests/conformance/calibrate.py [--write]

Without --write it only prints the keep/drop report.  With --write it
appends the surviving groups to the draft JSON files (idempotent: groups
whose description already exists in the file are skipped).
"""

import copy
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE_PATH = os.environ.get('REFERENCE_PATH', '/root/reference')

DRAFT_URI = {
    4: 'http://json-schema.org/draft-04/schema',
    6: 'http://json-schema.org/draft-06/schema',
    7: 'http://json-schema.org/draft-07/schema',
    2019: None,
}

# ---------------------------------------------------------------------------
# Format probes.  Each entry: format -> [(data, spec_valid), ...].
# Non-string probes are appended automatically (format ignores non-strings).
# ---------------------------------------------------------------------------

FORMAT_PROBES = {
    'date-time': [
        ('1963-06-19T08:30:06.283185Z', True),
        ('1963-06-19t08:30:06z', True),               # case-insensitive T/Z
        ('1963-06-19T08:30:06+05:30', True),
        ('1963-06-19T08:30:06-08:00', True),
        ('06/19/1963 08:30:06 PST', False),
        ('2013-350T01:01:01', False),                 # ordinal date form
        ('1963-6-19T08:30:06Z', False),               # 1-digit month
        ('1963-06-1T08:30:06Z', False),               # 1-digit day
        ('1963-13-19T08:30:06Z', False),              # month 13
        ('1990-02-31T15:59:59Z', False),              # Feb 31
        ('1998-12-31T23:59:60Z', True),               # leap second
        ('1963-06-19T25:30:06Z', False),              # hour 25
        ('1963-06-19T08:61:06Z', False),              # minute 61
        ('1963-06-19 08:30:06Z', False),              # space separator
        ('1963-06-19', False),                        # date only
        ('', False),
    ],
    'email': [
        ('joe.bloggs@example.com', True),
        ('2962', False),
        ('te~st@example.com', True),
        ('~test@example.com', True),
        ('test~@example.com', True),
        ('.test@example.com', False),                 # dot before local part
        ('test.@example.com', False),                 # dot after local part
        ('te..st@example.com', False),                # two dots in local part
        ('a@b.c', True),
        ('no-at-sign.example.com', False),
        ('two@@example.com', False),
        ('', False),
    ],
    'hostname': [
        ('www.example.com', True),
        ('xn--4gbwdl.xn--wgbh1c', True),
        ('-a-host-name-that-starts-with--', False),
        ('not_a_valid_host_name', False),
        ('a-v-e-r-y-l-o-n-g-h-o-s-t-n-a-m-e', True),
        ('a' * 63 + '.example', True),
        ('a' * 64 + '.example', False),               # label > 63 octets
        ('abc', True),
        ('hostname-', False),                         # trailing hyphen
        ('', False),
    ],
    'ipv4': [
        ('192.168.0.1', True),
        ('127.0.0.0.1', False),
        ('256.256.256.256', False),
        ('127.0', False),
        ('0x7f000001', False),
        ('1.2.3.4', True),
        ('087.2.3.4', False),                         # leading zero octet
        ('1.2.3.4 ', False),                          # trailing space
        ('1.2.3', False),
        ('255.255.255.255', True),
        ('', False),
    ],
    'ipv6': [
        ('::1', True),
        ('::', True),
        ('12345::', False),
        ('abef::', True),
        ('::abef', True),
        ('2001:db8::8:800:200c:417a', True),
        ('1:1:1:1:1:1:1:1:1', False),
        ('::laptop', False),
        (':2:3:4:5:6:7:8', False),
        ('1::2::3', False),
        ('fe80::1%25eth0', False),                    # zone id not in format
        ('', False),
    ],
    'uri': [
        ('http://example.com', True),
        ('ftp://ftp.is.co.za/rfc/rfc1808.txt', True),
        ('urn:isbn:0451450523', True),
        ('mailto:John.Doe@example.com', True),
        ('//foo.bar/?baz=qux#quux', False),           # protocol-relative
        ('/abc', False),                              # rootless path only
        ('abc', False),
        ('http://example com', False),                # space
        ('', False),
    ],
}

FORMAT_PROBES_D6 = {
    'json-pointer': [
        ('', True),
        ('/foo/bar', True),
        ('/foo/0', True),
        ('/a~0b', True),                              # escaped tilde
        ('/a~1b', True),                              # escaped slash
        ('/foo/~', False),                            # bare tilde
        ('/~2', False),                               # bad escape
        ('foo', False),                               # missing leading /
        ('/ ', True),                                 # space is a fine token
    ],
    'uri-reference': [
        ('/abc', True),
        ('#frag', True),
        ('', True),
        ('abc', True),
        ('http://example.com/#frag', True),
        ('\\\\WINDOWS\\fileshare', False),            # backslashes
        ('abc\\def', False),
    ],
    'uri-template': [
        ('http://example.com/dictionary/{term:1}/{term}', True),
        ('http://example.com/dictionary/{term:1}/{term', False),
        ('http://example.com/dictionary', True),
        ('dictionary/{term:1}/{term}', True),
        ('', True),
    ],
}

FORMAT_PROBES_D7 = {
    'date': [
        ('1963-06-19', True),
        ('06/19/1963', False),
        ('2021-13-01', False),                        # month 13
        ('2021-1-01', False),                         # 1-digit month
        ('2021-01-1', False),                         # 1-digit day
        ('2021-01-32', False),                        # day 32
        ('2021-01-00', False),                        # day 0
        ('1963-06-19T08:30:06Z', False),              # date-time, not date
        ('', False),
    ],
    'time': [
        ('08:30:06Z', True),
        ('08:30:06.283185Z', True),
        ('08:30:06+05:30', True),
        ('23:59:60Z', True),                          # leap second
        ('008:030:006', False),
        ('08:30:06 PST', False),
        ('1:1:1', False),                             # 1-digit fields
        ('', False),
    ],
    'iri': [
        ('http://ƒøø.ßår/?∂éœ=πîx#πîüx', True),
        ('http://example.com', True),
        ('//ƒøø.ßår', False),                         # protocol-relative
        ('http://example com', False),
        ('', False),
    ],
    'iri-reference': [
        ('/âππ', True),
        ('#ƒrägmênt', True),
        ('', True),
        ('\\\\WINDOWS\\filëshare', False),
    ],
    'idn-email': [
        ('квіточка@пошта.укр', True),
        ('joe.bloggs@example.com', True),
        ('2962', False),
        ('no-at-sign', False),
        ('', False),
    ],
    'idn-hostname': [
        ('實例.測試', True),
        ('-hello', False),
        ('hello-', False),
        ('', False),
    ],
    'relative-json-pointer': [
        ('1', True),
        ('0#', True),
        ('1/foo', True),
        ('120/a/b~0c', True),
        ('/foo', False),
        ('-1/foo', False),
        ('01', False),                                # leading zero
        ('1#/foo', False),                            # # must be terminal
        ('', False),
    ],
    'regex': [
        ('([abc])+\\s+$', True),
        ('^(abc]', False),
        ('', True),
        ('a|b', True),
    ],
}

FORMAT_PROBES_D2019 = {
    'uuid': [
        ('2EB8AA08-AA98-11EA-B4AA-73B441D16380', True),
        ('2eb8aa08-aa98-11ea-b4aa-73b441d16380', True),
        ('2eb8aa08-AA98-11ea-B4Aa-73B441D16380', True),   # mixed case
        ('2eb8aa08-aa98-11ea-73b441d16380', False),       # too few fields
        ('2eb8aa08-aa98-11ea-b4ga-73b441d16380', False),  # non-hex char
        ('2eb8aa08aa9811eab4aa73b441d16380', False),      # no dashes
        ('98d80576-482e-427f-8434-7f86890ab222', True),
        ('', False),
    ],
    'duration': [
        ('P4DT12H30M5S', True),
        ('PT1D', False),                                  # D after T
        ('P', False),                                     # no units
        ('P2W', True),                                    # weeks form
        ('P1Y2M3W', False),                               # W mixes with Y/M
        ('PT0S', True),
        ('P0D', True),
        ('PT1H30M', True),
        ('4DT12H', False),                                # missing P
        ('', False),
    ],
}

NON_STRING_PROBES = [(12, True), (13.7, True), (None, True),
                     ([], True), ({}, True), (False, True)]


def format_groups():
    """(draft, description, schema, tests) for every format family."""
    per_draft = {4: dict(FORMAT_PROBES), 6: {}, 7: {}, 2019: {}}
    per_draft[6].update(FORMAT_PROBES)
    per_draft[6].update(FORMAT_PROBES_D6)
    per_draft[7].update(FORMAT_PROBES)
    per_draft[7].update(FORMAT_PROBES_D6)
    per_draft[7].update(FORMAT_PROBES_D7)
    per_draft[2019].update(per_draft[7])
    per_draft[2019].update(FORMAT_PROBES_D2019)
    out = []
    for draft, table in sorted(per_draft.items()):
        for fmt, probes in sorted(table.items()):
            tests = [{'description': 'probe %r' % (data,),
                      'data': data, 'valid': valid}
                     for data, valid in probes]
            # typed variant: non-strings fail the type gate, not the format
            typed = tests + [
                {'description': 'non-string %r fails type' % (data,),
                 'data': data, 'valid': False}
                for data, _ in NON_STRING_PROBES]
            out.append((draft, 'format %s (r5 cal)' % fmt,
                        {'type': 'string', 'format': fmt}, typed))
            # bare variant: format ignores non-strings entirely
            bare = copy.deepcopy(tests) + [
                {'description': 'non-string %r ignored' % (data,),
                 'data': data, 'valid': True}
                for data, _ in NON_STRING_PROBES]
            out.append((draft, 'format %s bare (r5 cal)' % fmt,
                        {'format': fmt}, bare))
    return out


# ---------------------------------------------------------------------------
# Core-keyword edge groups.  Each entry: (drafts, description, schema, tests)
# ---------------------------------------------------------------------------

def T(desc, data, valid):
    return {'description': desc, 'data': data, 'valid': valid}


CORE_GROUPS = [
    ((4, 6, 7), 'multipleOf small float (r5 cal)',
     {'multipleOf': 0.0001},
     [T('0.0075 is multiple', 0.0075, True),
      T('0.00751 is not', 0.00751, False),
      T('1 is multiple', 1, True),
      T('string ignored', '0.0005', True)]),
    ((4, 6, 7), 'multipleOf int on floats (r5 cal)',
     {'multipleOf': 2},
     [T('4.0 is multiple', 4.0, True),
      T('5.0 is not', 5.0, False),
      T('-4 is multiple', -4, True),
      T('0 is multiple', 0, True)]),
    ((4,), 'minimum exclusiveMinimum bool form (r5 cal)',
     {'minimum': 1.1, 'exclusiveMinimum': True},
     [T('above', 1.2, True),
      T('boundary excluded', 1.1, False),
      T('below', 0.6, False),
      T('ignores non-numbers', 'x', True)]),
    ((4,), 'maximum exclusiveMaximum bool form (r5 cal)',
     {'maximum': 3.0, 'exclusiveMaximum': True},
     [T('below', 2.2, True),
      T('boundary excluded', 3.0, False),
      T('above', 3.5, False)]),
    ((6, 7), 'exclusiveMinimum numeric form (r5 cal)',
     {'exclusiveMinimum': 1.1},
     [T('above', 1.2, True),
      T('boundary excluded', 1.1, False),
      T('below', 0.6, False),
      T('ignores non-numbers', 'x', True)]),
    ((6, 7), 'exclusiveMaximum numeric form (r5 cal)',
     {'exclusiveMaximum': 3.0},
     [T('below', 2.2, True),
      T('boundary excluded', 3.0, False),
      T('above', 3.5, False)]),
    ((4, 6, 7), 'minimum maximum boundaries inclusive (r5 cal)',
     {'minimum': -2, 'maximum': 2},
     [T('lower boundary', -2, True),
      T('upper boundary', 2, True),
      T('lower boundary float', -2.0, True),
      T('below', -2.1, False),
      T('above', 2.1, False),
      T('int above', 3, False)]),
    ((4, 6, 7), 'minLength maxLength astral codepoints (r5 cal)',
     {'minLength': 2, 'maxLength': 3},
     [T('two astral chars count 2', '\U0001d11e\U0001d11e', True),
      T('one astral char counts 1', '\U0001d11e', False),
      T('four chars too long', '\U0001d11eabc', False),
      T('three chars ok', 'aß\U0001d11e', True),
      T('non-string ignored', 1, True)]),
    ((4, 6, 7), 'pattern unanchored (r5 cal)',
     {'pattern': 'a+'},
     [T('substring match', 'xaay', True),
      T('no match', 'xyz', False),
      T('anchors are not implicit', 'bbba', True),
      T('non-string ignored', True, True)]),
    ((4, 6, 7), 'pattern anchored empty (r5 cal)',
     {'pattern': '^a*$'},
     [T('empty matches', '', True),
      T('all a', 'aaa', True),
      T('other char', 'ab', False)]),
    ((4, 6, 7), 'required unicode property names (r5 cal)',
     {'required': ['åäö', 'normal']},
     [T('both present', {'åäö': 1, 'normal': 2}, True),
      T('unicode key missing', {'normal': 2}, False),
      T('non-object ignored', [1, 2], True)]),
    ((4, 6, 7), 'properties patternProperties additionalProperties (r5 cal)',
     {'properties': {'foo': {'type': 'array', 'maxItems': 3},
                     'bar': {'type': 'array'}},
      'patternProperties': {'f.o': {'minItems': 2}},
      'additionalProperties': {'type': 'integer'}},
     [T('property validates property', {'foo': [1, 2]}, True),
      T('property invalidates property', {'foo': [1, 2, 3, 4]}, False),
      T('patternProperty invalidates property', {'foo': []}, False),
      T('patternProperty validates nonproperty', {'fxo': [1, 2]}, True),
      T('patternProperty invalidates nonproperty', {'fxo': []}, False),
      T('additionalProperty ignores patternProperty match', {'fxo': []},
        False),
      T('additionalProperty validates others', {'quux': 3}, True),
      T('additionalProperty invalidates others', {'quux': 'foo'}, False)]),
    ((4, 6, 7), 'additionalProperties false with patternProperties (r5 cal)',
     {'patternProperties': {'^v': {}}, 'additionalProperties': False},
     [T('pattern-matched allowed', {'vroom': 1}, True),
      T('unmatched rejected', {'broom': 1}, False),
      T('empty object ok', {}, True)]),
    ((4, 6, 7), 'items tuple with additionalItems schema (r5 cal)',
     {'items': [{'type': 'integer'}, {'type': 'string'}],
      'additionalItems': {'type': 'boolean'}},
     [T('prefix only', [1, 'a'], True),
      T('extra matching', [1, 'a', True, False], True),
      T('extra mismatching', [1, 'a', 2], False),
      T('shorter than prefix', [1], True),
      T('wrong prefix type', ['a', 1], False)]),
    ((4, 6, 7), 'items tuple additionalItems false (r5 cal)',
     {'items': [{}, {}], 'additionalItems': False},
     [T('exact length', [1, 2], True),
      T('too long', [1, 2, 3], False),
      T('shorter ok', [1], True),
      T('empty ok', [], True)]),
    ((4, 6, 7), 'uniqueItems objects and arrays (r5 cal)',
     {'uniqueItems': True},
     [T('equal objects', [{'a': 1}, {'a': 1}], False),
      T('key-order-insensitive objects', [{'a': 1, 'b': 2},
                                          {'b': 2, 'a': 1}], False),
      T('different objects', [{'a': 1}, {'a': 2}], True),
      T('nested arrays equal', [[1, 2], [1, 2]], False),
      T('string vs object', ['{}', {}], True),
      T('empty array', [], True),
      T('deep nesting unique', [[[1], 'foo'], [[2], 'foo']], True)]),
    ((4, 6, 7), 'allOf nested with base keywords (r5 cal)',
     {'allOf': [{'multipleOf': 2}], 'minimum': 5},
     [T('both pass', 6, True),
      T('allOf fails', 7, False),
      T('base fails', 4, False),
      T('both fail', 3, False)]),
    ((4, 6, 7), 'oneOf exactly one (r5 cal)',
     {'oneOf': [{'type': 'integer'}, {'minimum': 2}]},
     [T('first only', 1, True),
      T('second only', 2.5, True),
      T('both match', 3, False),
      T('neither', 1.5, False)]),
    ((4, 6, 7), 'anyOf with nested anyOf (r5 cal)',
     {'anyOf': [{'anyOf': [{'type': 'null'}]}, {'type': 'string'}]},
     [T('null via nesting', None, True),
      T('string via outer', 'x', True),
      T('number fails both', 3, False)]),
    ((4, 6, 7), 'not multiple types (r5 cal)',
     {'not': {'type': ['integer', 'boolean']}},
     [T('string allowed', 'foo', True),
      T('integer rejected', 1, False),
      T('boolean rejected', True, False),
      T('float allowed', 1.5, True)]),
    ((4, 6, 7), 'dependencies array form (r5 cal)',
     {'dependencies': {'bar': ['foo']}},
     [T('neither', {}, True),
      T('nondependant alone', {'foo': 1}, True),
      T('with dependency', {'foo': 1, 'bar': 2}, True),
      T('missing dependency', {'bar': 2}, False),
      T('ignores arrays', ['bar'], True),
      T('ignores strings', 'foobar', True)]),
    ((4, 6, 7), 'dependencies schema form (r5 cal)',
     {'dependencies': {'bar': {'properties': {'foo': {'type': 'integer'}}}}},
     [T('valid dependent', {'foo': 1, 'bar': 2}, True),
      T('invalid dependent', {'foo': 'quux', 'bar': 2}, False),
      T('absent trigger', {'foo': 'quux'}, True)]),
    ((4, 6, 7), 'nested ref chain through definitions (r5 cal)',
     {'definitions': {'a': {'$ref': '#/definitions/b'},
                      'b': {'$ref': '#/definitions/c'},
                      'c': {'type': 'integer'}},
      'properties': {'x': {'$ref': '#/definitions/a'}}},
     [T('resolves through chain', {'x': 1}, True),
      T('violation at chain end', {'x': 'no'}, False)]),
    ((4, 6, 7), 'ref with tilde and slash escapes (r5 cal)',
     {'definitions': {'tilde~field': {'type': 'integer'},
                      'slash/field': {'type': 'string'}},
      'properties': {'t': {'$ref': '#/definitions/tilde~0field'},
                     's': {'$ref': '#/definitions/slash~1field'}}},
     [T('both resolve', {'t': 1, 's': 'a'}, True),
      T('tilde target violated', {'t': 'x'}, False),
      T('slash target violated', {'s': 9}, False)]),
    ((4, 6, 7), 'ref into properties subschema (r5 cal)',
     {'properties': {'foo': {'type': 'integer'},
                      'bar': {'$ref': '#/properties/foo'}}},
     [T('mirror valid', {'foo': 1, 'bar': 2}, True),
      T('mirror invalid', {'bar': 'x'}, False)]),
    ((4, 6, 7), 'minProperties maxProperties zero edges (r5 cal)',
     {'minProperties': 0, 'maxProperties': 1},
     [T('empty ok', {}, True),
      T('one ok', {'a': 1}, True),
      T('two too many', {'a': 1, 'b': 2}, False),
      T('array ignored', [1, 2, 3], True)]),
    ((6, 7), 'contains with minimum (r5 cal)',
     {'contains': {'minimum': 5}},
     [T('one qualifying', [3, 4, 5], True),
      T('all qualifying', [6, 7, 8], True),
      T('none qualifying', [1, 2, 3], False),
      T('empty array', [], False),
      T('non-array ignored', {}, True)]),
    ((6, 7), 'propertyNames maxLength (r5 cal)',
     {'propertyNames': {'maxLength': 3}},
     [T('short names', {'f': 1, 'foo': 2}, True),
      T('long name', {'fooo': 1}, False),
      T('empty object', {}, True),
      T('non-object ignored', [1, 2, 3, 4], True)]),
    ((6, 7), 'const object key order (r5 cal)',
     {'const': {'a': 1, 'b': 2}},
     [T('same order', {'a': 1, 'b': 2}, True),
      T('reordered', {'b': 2, 'a': 1}, True),
      T('extra key', {'a': 1, 'b': 2, 'c': 3}, False),
      T('other value', 5, False)]),
    ((6, 7), 'const float int equality (r5 cal)',
     {'const': 2},
     [T('int matches', 2, True),
      T('float 2.0 matches', 2.0, True),
      T('2.5 does not', 2.5, False),
      T('string does not', '2', False)]),
    ((6, 7), 'boolean schema false in properties (r5 cal)',
     {'properties': {'foo': False}},
     [T('foo present fails', {'foo': 1}, False),
      T('foo absent ok', {'bar': 1}, True),
      T('empty ok', {}, True)]),
    ((6, 7), 'boolean schema true in items (r5 cal)',
     {'items': True},
     [T('any array ok', [1, 'x', None], True),
      T('empty ok', [], True)]),
    ((6, 7), 'items false (r5 cal)',
     {'items': False},
     [T('empty array ok', [], True),
      T('nonempty fails', [1], False),
      T('non-array ignored', 'ab', True)]),
    ((6, 7), 'required empty array (r5 cal)',
     {'required': []},
     [T('empty object ok', {}, True),
      T('any object ok', {'a': 1}, True)]),
    ((7,), 'if then else full (r5 cal)',
     {'if': {'exclusiveMaximum': 0},
      'then': {'minimum': -10},
      'else': {'multipleOf': 2}},
     [T('then valid', -1, True),
      T('then invalid', -100, False),
      T('else valid', 4, True),
      T('else invalid', 3, False)]),
    ((7,), 'if without then else ignored (r5 cal)',
     {'if': {'const': 0}},
     [T('matching', 0, True),
      T('nonmatching', 'hello', True)]),
    ((7,), 'then without if ignored (r5 cal)',
     {'then': {'const': 0}},
     [T('anything ok', 'x', True)]),
    ((7,), 'if then chained in allOf (r5 cal)',
     {'allOf': [{'if': {'minimum': 10}, 'then': {'multipleOf': 5}},
                {'if': {'minimum': 100}, 'then': {'multipleOf': 20}}]},
     [T('small number unconstrained', 3, True),
      T('mid number needs 5', 15, True),
      T('mid number not mult 5', 12, False),
      T('big number needs both', 200, True),
      T('big number mult 5 not 20', 105, False)]),
    ((4, 6, 7), 'deeply nested structure (r5 cal)',
     {'properties': {
         'a': {'items': {'properties': {
             'b': {'items': [{'properties': {
                 'c': {'type': 'integer'}}}]}}}}}},
     [T('valid deep', {'a': [{'b': [{'c': 1}]}]}, True),
      T('invalid deep', {'a': [{'b': [{'c': 'x'}]}]}, False),
      T('short-circuit empty', {'a': []}, True)]),
    ((4, 6, 7), 'enum heterogeneous (r5 cal)',
     {'enum': [6, 'foo', [], {'foo': 12}]},
     [T('int member', 6, True),
      T('string member', 'foo', True),
      T('array member', [], True),
      T('object member', {'foo': 12}, True),
      T('object non-member', {'foo': 13}, False),
      T('non-member', 7, False)]),
    ((7,), 'contentMediaType application json (r5 cal)',
     {'contentMediaType': 'application/json'},
     [T('valid json document', '{"foo": "bar"}', True),
      T('invalid json document', '{:}', False),
      T('empty string not json', '', False),
      T('non-string ignored', 100, True)]),
    ((7,), 'contentEncoding with mediaType combined (r5 cal)',
     {'contentEncoding': 'base64', 'contentMediaType': 'application/json'},
     [T('base64 json', 'eyJmb28iOiAiYmFyIn0=', True),
      T('base64 non-json', 'aGVsbG8=', False),
      T('non-string ignored', 100, True)]),
    ((4, 6, 7), 'annotation keywords are inert (r5 cal)',
     {'title': 'a title', 'description': 'words', '$comment': 'note',
      'examples': [1, 'x'], 'readOnly': True},
     [T('number ok', 12, True),
      T('string ok', 'y', True),
      T('object ok', {'a': 1}, True)]),
    ((4, 6, 7), 'additionalProperties does not see allOf (r5 cal)',
     {'allOf': [{'properties': {'foo': {}}}],
      'properties': {'bar': {}},
      'additionalProperties': False},
     [T('own property ok', {'bar': 1}, True),
      T('allOf property is additional at root', {'foo': 1}, False),
      T('empty ok', {}, True)]),
    ((4, 6, 7), 'double negation (r5 cal)',
     {'not': {'not': {'type': 'integer'}}},
     [T('integer ok', 1, True),
      T('string rejected', 'a', False)]),
    ((4, 6, 7), 'maxLength zero (r5 cal)',
     {'maxLength': 0},
     [T('empty string ok', '', True),
      T('one char too long', 'a', False),
      T('astral char too long', '\U0001d11e', False)]),
    ((4, 6, 7), 'uniqueItems false allows duplicates (r5 cal)',
     {'uniqueItems': False},
     [T('duplicates ok', [1, 1, 1], True),
      T('unique ok', [1, 2], True)]),
    ((6, 7), 'propertyNames false (r5 cal)',
     {'propertyNames': False},
     [T('empty object ok', {}, True),
      T('any property fails', {'a': 1}, False)]),
    ((6, 7), 'contains boolean true schema (r5 cal)',
     {'contains': True},
     [T('nonempty ok', ['x'], True),
      T('empty fails', [], False)]),
    ((4, 6, 7), 'recursive ref linked list (r5 cal)',
     {'$ref': '#/definitions/node',
      'definitions': {'node': {
          'properties': {'next': {'$ref': '#/definitions/node'},
                         'v': {'type': 'integer'}}}}},
     [T('depth 3 valid', {'v': 1, 'next': {'v': 2, 'next': {'v': 3}}}, True),
      T('violation at depth 3', {'v': 1, 'next': {'v': 2,
                                                  'next': {'v': 'x'}}},
        False),
      T('empty node ok', {}, True)]),
    ((4, 6, 7), 'oneOf discriminated by required (r5 cal)',
     {'oneOf': [{'required': ['a']}, {'required': ['b']}]},
     [T('first arm', {'a': 1}, True),
      T('second arm', {'b': 1}, True),
      T('both arms match', {'a': 1, 'b': 2}, False),
      T('neither arm', {'c': 1}, False)]),
    ((4, 6, 7), 'type union with keywords (r5 cal)',
     {'type': ['integer', 'string'], 'minimum': 3, 'minLength': 2},
     [T('integer passing minimum', 5, True),
      T('integer failing minimum', 2, False),
      T('string passing minLength', 'ab', True),
      T('string failing minLength', 'a', False),
      T('other type', [], False)]),
]


# ---------------------------------------------------------------------------
# Batch 4 (round 5): thin areas vs the official suite — $ref edge shapes,
# the type matrix, patternProperties, items/additionalItems interplay,
# bignum/precision, enum/const escapes, boolean-schema applicators.
# ---------------------------------------------------------------------------

CORE_GROUPS_B4 = [
    ((4, 6, 7), 'property named $ref is not a reference (r5 cal b4)',
     {'properties': {'$ref': {'type': 'string'}}},
     [T('property named $ref valid', {'$ref': 'a'}, True),
      T('property named $ref invalid', {'$ref': 2}, False),
      T('absent ok', {}, True)]),
    ((4, 6, 7), 'property named $ref containing an actual $ref (r5 cal b4)',
     {'properties': {'$ref': {'$ref': '#/definitions/is-string'}},
      'definitions': {'is-string': {'type': 'string'}}},
     [T('slash ref resolves', {'$ref': 'a'}, True),
      T('violation through ref', {'$ref': 2}, False)]),
    ((4, 6, 7), 'root pointer ref (r5 cal b4)',
     {'properties': {'foo': {'$ref': '#'}},
      'additionalProperties': False},
     [T('match', {'foo': False}, True),
      T('recursive match', {'foo': {'foo': False}}, True),
      T('mismatch', {'bar': False}, False),
      T('recursive mismatch', {'foo': {'bar': False}}, False)]),
    ((6, 7), 'ref to boolean schema false (r5 cal b4)',
     {'$ref': '#/definitions/bool', 'definitions': {'bool': False}},
     [T('any value is invalid', 'foo', False),
      T('object is invalid', {}, False)]),
    ((6, 7), 'ref to boolean schema true (r5 cal b4)',
     {'$ref': '#/definitions/bool', 'definitions': {'bool': True}},
     [T('any value is valid', 'foo', True)]),
    ((4, 6, 7), 'naive ref replacement is not correct (r5 cal b4)',
     {'definitions': {'a_string': {'type': 'string'}},
      'enum': [{'$ref': '#/definitions/a_string'}]},
     [T('do not evaluate the $ref inside the enum, matching any string',
        'this is a string', False),
      T('do not evaluate the $ref inside the enum, definition exact match',
        {'type': 'string'}, False),
      T('match the enum exactly', {'$ref': '#/definitions/a_string'}, True)]),
    ((4, 6, 7), 'ref into tuple items element (r5 cal b4)',
     {'items': [{'type': 'integer'}, {'$ref': '#/items/0'}]},
     [T('both match', [1, 2], True),
      T('second violates reffed first', [1, 'x'], False),
      T('first violates', ['x', 1], False)]),
    ((4, 6, 7), 'refs with quote in definition name (r5 cal b4)',
     {'properties': {'foo"bar': {'$ref': '#/definitions/foo%22bar'}},
      'definitions': {'foo"bar': {'type': 'number'}}},
     [T('object with numbers is valid', {'foo"bar': 1}, True),
      T('object with strings is invalid', {'foo"bar': 'x'}, False)]),
    ((4, 6, 7), 'infinite-loop shape: allOf ref + additionalProperties ref '
                '(r5 cal b4)',
     {'definitions': {'int': {'type': 'integer'}},
      'allOf': [{'properties': {'foo': {'$ref': '#/definitions/int'}}},
                {'additionalProperties': {'$ref': '#/definitions/int'}}]},
     [T('passing case', {'foo': 1}, True),
      T('failing case', {'foo': 'a string'}, False)]),
    ((4, 6, 7), 'type integer matrix (r5 cal b4)',
     {'type': 'integer'},
     [T('an integer', 1, True),
      T('a float with zero fractional part', 1.0, True),
      T('a float', 1.1, False),
      T('a string', 'foo', False),
      T('a numeric string', '1', False),
      T('an object', {}, False),
      T('an array', [], False),
      T('a boolean', True, False),
      T('null', None, False)]),
    ((4, 6, 7), 'type number matrix (r5 cal b4)',
     {'type': 'number'},
     [T('an integer is a number', 1, True),
      T('a float', 1.1, True),
      T('a float with zero fractional part', 1.0, True),
      T('a string', 'foo', False),
      T('a boolean is not a number', True, False),
      T('null', None, False)]),
    ((4, 6, 7), 'type boolean matrix (r5 cal b4)',
     {'type': 'boolean'},
     [T('true', True, True),
      T('false', False, True),
      T('zero is not boolean', 0, False),
      T('one is not boolean', 1, False),
      T('empty string', '', False),
      T('null', None, False)]),
    ((4, 6, 7), 'type null matrix (r5 cal b4)',
     {'type': 'null'},
     [T('null', None, True),
      T('zero', 0, False),
      T('false', False, False),
      T('empty string', '', False),
      T('empty object', {}, False)]),
    ((4, 6, 7), 'type object and array matrix (r5 cal b4)',
     {'properties': {'o': {'type': 'object'}, 'a': {'type': 'array'}}},
     [T('object ok', {'o': {}}, True),
      T('array is not object', {'o': []}, False),
      T('array ok', {'a': []}, True),
      T('object is not array', {'a': {}}, False),
      T('string is neither', {'o': 'x'}, False)]),
    ((4, 6, 7), 'type as single-element array (r5 cal b4)',
     {'type': ['string']},
     [T('string ok', 'foo', True),
      T('number rejected', 1, False)]),
    ((4, 6, 7), 'patternProperties case sensitive (r5 cal b4)',
     {'patternProperties': {'[0-9]{2,}': {'type': 'boolean'},
                            'X_': {'type': 'string'}}},
     [T('non recognized members are ignored', {'answer 1': '42'}, True),
      T('recognized members are accounted for', {'a31b': None}, False),
      T('regexes are case sensitive', {'a_x_3': 3}, True),
      T('regexes are case sensitive 2', {'a_X_3': 3}, False)]),
    ((4, 6, 7), 'patternProperties multiple simultaneous (r5 cal b4)',
     {'patternProperties': {'a*': {'type': 'integer'},
                            'aaa*': {'maximum': 20}}},
     [T('single valid', {'a': 21}, True),
      T('simultaneous valid', {'aaaa': 18}, True),
      T('multiple valid', {'a': 21, 'aaaa': 18}, True),
      T('invalid one pattern', {'a': 'bar'}, False),
      T('invalid other pattern', {'aaaa': 31}, False),
      T('invalid both', {'aaa': 'foo', 'aaaa': 31}, False)]),
    ((6, 7), 'patternProperties with boolean schemas (r5 cal b4)',
     {'patternProperties': {'f.*': True, 'b.*': False}},
     [T('object with f property ok', {'foo': 1}, True),
      T('object with b property fails', {'bar': 1}, False),
      T('object with both fails', {'foo': 1, 'bar': 2}, False),
      T('empty object ok', {}, True)]),
    ((4, 6, 7), 'patternProperties null valued properties (r5 cal b4)',
     {'patternProperties': {'^.*bar$': {'type': 'null'}}},
     [T('null matching pattern ok', {'foobar': None}, True),
      T('non-null matching pattern fails', {'foobar': 1}, False)]),
    ((4, 6, 7), 'items and subitems nested tuples (r5 cal b4)',
     {'definitions': {
          'item': {'type': 'array',
                   'items': [{'type': 'integer'}, {'type': 'integer'}],
                   'additionalItems': False}},
      'type': 'array',
      'items': [{'$ref': '#/definitions/item'},
                {'$ref': '#/definitions/item'}],
      'additionalItems': False},
     [T('valid nested', [[1, 2], [3, 4]], True),
      T('too many outer', [[1, 2], [3, 4], [5, 6]], False),
      T('too many inner', [[1, 2, 3], [4, 5]], False),
      T('wrong inner type', [[1, 'x'], [3, 4]], False),
      T('fewer ok', [[1, 2]], True)]),
    ((4, 6, 7), 'additionalItems false without items (r5 cal b4)',
     {'additionalItems': False},
     [T('all items allowed', [1, 2, 3, 4, 5], True),
      T('ignores non-arrays', {'foo': 'bar'}, True)]),
    ((4, 6, 7), 'additionalItems does not look in applicators (r5 cal b4)',
     {'allOf': [{'items': [{'type': 'integer'}]}],
      'additionalItems': {'type': 'boolean'}},
     [T('items defined in allOf are not examined',
        [1, None], True)]),
    ((4, 6, 7), 'items with null instance elements (r5 cal b4)',
     {'items': {'type': 'null'}},
     [T('allows null elements', [None, None], True),
      T('rejects non-null', [None, 1], False)]),
    ((4, 6, 7), 'bignum integer comparisons (r5 cal b4)',
     {'properties': {
          'below_max': {'maximum': 18446744073709551615},
          'above_min': {'minimum': -18446744073709551615}}},
     [T('comparison works for high numbers',
        {'below_max': 18446744073709551600}, True),
      T('above high maximum fails',
        {'below_max': 18446744073709551616}, False),
      T('comparison works for very negative numbers',
        {'above_min': -18446744073709551600}, True),
      T('below low minimum fails',
        {'above_min': -18446744073709551616}, False)]),
    ((4, 6, 7), 'bignum is an integer (r5 cal b4)',
     {'type': 'integer'},
     [T('bignum is an integer', 12345678910111213141516171819202122232425,
        True),
      T('negative bignum is an integer',
        -12345678910111213141516171819202122232425, True)]),
    ((6, 7), 'float comparison with high precision (r5 cal b4)',
     {'exclusiveMaximum': 972783798187987.8},
     [T('comparison works for high numbers', 972783798187987.0, True),
      T('boundary excluded', 972783798187987.8, False)]),
    ((4, 6, 7), 'enum with escaped characters (r5 cal b4)',
     {'enum': ['foo\nbar', 'foo\rbar']},
     [T('member 1', 'foo\nbar', True),
      T('member 2', 'foo\rbar', True),
      T('another string', 'abc', False)]),
    ((4, 6, 7), 'nul characters in strings (r5 cal b4)',
     {'enum': ['hello\0there']},
     [T('match string with nul', 'hello\0there', True),
      T('do not match string lacking nul', 'hellothere', False)]),
    ((6, 7), 'const with null (r5 cal b4)',
     {'const': None},
     [T('null matches', None, True),
      T('zero does not', 0, False),
      T('false does not', False, False),
      T('empty string does not', '', False)]),
    ((4, 6, 7), 'enums in properties with required (r5 cal b4)',
     {'type': 'object',
      'properties': {'foo': {'enum': ['foo']}, 'bar': {'enum': ['bar']}},
      'required': ['bar']},
     [T('both valid', {'foo': 'foo', 'bar': 'bar'}, True),
      T('missing optional ok', {'bar': 'bar'}, True),
      T('missing required fails', {'foo': 'foo'}, False),
      T('wrong enum value fails', {'bar': 'baz'}, False)]),
    ((4, 6, 7), 'required with escaped characters (r5 cal b4)',
     {'required': ['foo\nbar', 'foo"bar']},
     [T('object with all present', {'foo\nbar': 1, 'foo"bar': 2}, True),
      T('object missing one', {'foo\nbar': 1}, False)]),
    ((4, 6, 7), 'maxProperties zero means empty (r5 cal b4)',
     {'maxProperties': 0},
     [T('empty ok', {}, True),
      T('one property too many', {'a': 1}, False)]),
    ((4, 6, 7), 'not with empty schema (r5 cal b4)',
     {'not': {}},
     [T('number invalid', 1, False),
      T('string invalid', 'x', False),
      T('null invalid', None, False)]),
    ((6, 7), 'allOf with boolean schemas (r5 cal b4)',
     {'allOf': [True, False]},
     [T('any value invalid', 'foo', False)]),
    ((6, 7), 'anyOf with boolean schemas (r5 cal b4)',
     {'anyOf': [True, False]},
     [T('any value valid', 'foo', True)]),
    ((6, 7), 'oneOf with boolean schemas (r5 cal b4)',
     {'oneOf': [True, False]},
     [T('exactly one true arm valid', 'foo', True)]),
    ((6, 7), 'oneOf with both boolean true (r5 cal b4)',
     {'oneOf': [True, True]},
     [T('both arms match invalid', 'foo', False)]),
    ((7,), 'if then else boolean schemas (r5 cal b4)',
     {'if': True, 'then': {'type': 'integer'}, 'else': {'type': 'string'}},
     [T('then branch applies', 3, True),
      T('then branch violated', 'x', False)]),
    ((7,), 'if false boolean takes else (r5 cal b4)',
     {'if': False, 'then': {'type': 'integer'}, 'else': {'type': 'string'}},
     [T('else branch applies', 'x', True),
      T('else branch violated', 3, False)]),
    ((4, 6, 7), 'unknown keywords are ignored (r5 cal b4)',
     {'frobnicate': 1, 'wibble': {'type': 'nonsense'}, 'type': 'integer'},
     [T('type still enforced', 1, True),
      T('type still rejects', 'x', False)]),
    ((6, 7), 'contains with const (r5 cal b4)',
     {'contains': {'const': 5}},
     [T('array with the value', [1, 5, 9], True),
      T('array without it', [1, 2, 3], False),
      T('value via float equality', [5.0], True)]),
    ((4, 6, 7), 'dependencies with escaped characters (r5 cal b4)',
     {'dependencies': {'foo\nbar': ['foo\rbar'],
                       'foo"bar': {'minProperties': 2}}},
     [T('CRLF pair present', {'foo\nbar': 1, 'foo\rbar': 2}, True),
      T('CRLF dependency missing', {'foo\nbar': 1}, False),
      T('quoted trigger satisfied', {'foo"bar': 1, 'x': 2}, True),
      T('quoted trigger unsatisfied', {'foo"bar': 1}, False)]),
    ((6, 7), 'propertyNames with pattern (r5 cal b4)',
     {'propertyNames': {'pattern': '^a'}},
     [T('all names match', {'alpha': 1, 'apple': 2}, True),
      T('one name does not', {'alpha': 1, 'beta': 2}, False),
      T('empty ok', {}, True)]),
    ((4, 6, 7), 'multipleOf tiny divisor (r5 cal b4)',
     {'multipleOf': 1e-8},
     [T('exact multiple', 1.0, True),
      T('integer multiple', 123, True)]),
    ((4, 6, 7), 'uniqueItems with tuple items and additionalItems false '
                '(r5 cal b4)',
     {'items': [{'type': 'boolean'}, {'type': 'boolean'}],
      'uniqueItems': True, 'additionalItems': False},
     [T('unique pair ok', [False, True], True),
      T('duplicate pair fails', [False, False], False),
      T('extra item fails additionalItems', [False, True, None], False)]),
    ((4, 6, 7), 'minimum maximum signed zero (r5 cal b4)',
     {'minimum': 0},
     [T('negative zero passes minimum 0', -0.0, True),
      T('tiny negative fails', -1e-9, False)]),
]

# Batch 6: official-suite shapes not yet represented — ref-to-root, the
# JSON 0/false and 1/true identity rules, $ref sibling-keyword masking,
# cascaded additionalProperties, regex lookaround, astral-plane lengths.
CORE_GROUPS_B6 = [
    ((4, 6, 7), 'not with empty schema rejects everything (r5 cal b6)',
     {'not': {}},
     [T('number rejected', 1, False),
      T('string rejected', 'foo', False),
      T('null rejected', None, False),
      T('object rejected', {}, False)]),
    ((4, 6, 7), 'ref to root # recursive (r5 cal b6)',
     {'properties': {'foo': {'$ref': '#'}},
      'additionalProperties': False},
     [T('match', {'foo': False}, True),
      T('recursive match', {'foo': {'foo': False}}, True),
      T('mismatch', {'bar': False}, False),
      T('recursive mismatch', {'foo': {'bar': False}}, False)]),
    ((4, 6, 7), 'uniqueItems 0 and false are distinct (r5 cal b6)',
     {'uniqueItems': True},
     [T('[0, false] unique', [0, False], True),
      T('[1, true] unique', [1, True], True),
      T('[0, 0.0] duplicate', [0, 0.0], False),
      T('nested [0] and [false] unique', [[0], [False]], True),
      T('{a:0} vs {a:false} unique', [{'a': 0}, {'a': False}], True)]),
    ((4, 6, 7), 'enum 0 does not match false (r5 cal b6)',
     {'enum': [0]},
     [T('0 member', 0, True),
      T('0.0 member', 0.0, True),
      T('false not member', False, False)]),
    ((4, 6, 7), 'enum 1 does not match true (r5 cal b6)',
     {'enum': [1]},
     [T('1 member', 1, True),
      T('1.0 member', 1.0, True),
      T('true not member', True, False)]),
    ((6, 7), 'const 0 vs false and 1 vs true (r5 cal b6)',
     {'properties': {'z': {'const': 0}, 'o': {'const': 1}}},
     [T('numbers match', {'z': 0, 'o': 1}, True),
      T('false is not 0', {'z': False}, False),
      T('true is not 1', {'o': True}, False)]),
    ((4, 6, 7), 'nested additionalProperties cascade (r5 cal b6)',
     {'properties': {
         'outer': {'properties': {'inner': {'type': 'integer'}},
                   'additionalProperties': False}},
      'additionalProperties': {'type': 'string'}},
     [T('both levels ok', {'outer': {'inner': 1}, 'extra': 's'}, True),
      T('inner extra rejected', {'outer': {'other': 1}}, False),
      T('outer extra wrong type', {'extra': 2}, False)]),
    ((4, 6, 7), 'pattern with lookahead (r5 cal b6)',
     {'pattern': '^(?=.*[0-9])(?=.*[a-z]).{6,}$'},
     [T('has digit and lower', 'abc123', True),
      T('no digit', 'abcdef', False),
      T('too short', 'a1', False)]),
    ((4, 6, 7), 'pattern with escaped metachars (r5 cal b6)',
     {'pattern': '^\\(\\d+\\.\\d+\\)$'},
     [T('parenthesised decimal', '(3.14)', True),
      T('no parens', '3.14', False),
      T('dot is escaped', '(3x14)', False)]),
    ((4, 6, 7), 'minLength astral and zwj sequences (r5 cal b6)',
     {'minLength': 3},
     [T('family emoji counts per codepoint',
        '\U0001F468‍\U0001F469', True),
      T('two astral chars too short', '\U0001F600\U0001F601', False),
      T('three bmp chars ok', 'abc', True)]),
    ((4, 6, 7), 'allOf unsatisfiable type conflict (r5 cal b6)',
     {'allOf': [{'type': 'integer'}, {'type': 'string'}]},
     [T('integer fails second', 1, False),
      T('string fails first', 'x', False),
      T('other fails both', None, False)]),
    ((4, 6, 7), 'dependencies empty array form (r5 cal b6)',
     {'dependencies': {'bar': []}},
     [T('bar present ok', {'bar': 1}, True),
      T('bar absent ok', {}, True)]),
    ((4, 6, 7), 'maxProperties 0 forbids all (r5 cal b6)',
     {'maxProperties': 0},
     [T('empty ok', {}, True),
      T('one too many', {'a': 1}, False),
      T('arrays ignored', [1, 2], True)]),
    ((4, 6, 7), 'ref sibling keywords (r5 cal b6)',
     {'definitions': {'int': {'type': 'integer'}},
      'properties': {'x': {'$ref': '#/definitions/int',
                           'maximum': 5}}},
     [T('small int ok', {'x': 3}, True),
      T('string rejected by ref', {'x': 'no'}, False)]),
    ((4, 6, 7), 'type array all primitives (r5 cal b6)',
     {'type': ['integer', 'string', 'boolean', 'null', 'array',
               'object', 'number']},
     [T('integer', 1, True),
      T('string', 'x', True),
      T('boolean', True, True),
      T('null', None, True),
      T('array', [], True),
      T('object', {}, True),
      T('float', 1.5, True)]),
    ((6, 7), 'contains with const (r5 cal b6)',
     {'contains': {'const': 5}},
     [T('has the value', [1, 5, 9], True),
      T('missing the value', [1, 2], False),
      T('false is not 5', [False], False)]),
    ((7,), 'if else without then (r5 cal b6)',
     {'if': {'type': 'integer'}, 'else': {'minLength': 2}},
     [T('integer passes vacuous then', 1, True),
      T('long string passes else', 'ab', True),
      T('short string fails else', 'a', False)]),
    ((4, 6, 7), 'numeric limits near 1e308 (r5 cal b6)',
     {'maximum': 1e308},
     [T('at limit', 1e308, True),
      T('below limit', 1e307, True)]),
    ((6, 7), 'propertyNames empty string key (r5 cal b6)',
     {'propertyNames': {'minLength': 1}},
     [T('empty key fails', {'': 1}, False),
      T('normal key ok', {'a': 1}, True)]),
    ((4, 6, 7), 'additionalItems ignored when items is schema (r5 cal b6)',
     {'items': {'type': 'integer'}, 'additionalItems': False},
     [T('all integers ok', [1, 2, 3, 4, 5], True),
      T('a string fails items', [1, 'x'], False)]),
    ((4, 6, 7), 'enum with null member (r5 cal b6)',
     {'enum': [None, 'x']},
     [T('null member', None, True),
      T('string member', 'x', True),
      T('false not member', False, False),
      T('0 not member', 0, False)]),
    ((4, 6, 7), 'whitespace-only property names (r5 cal b6)',
     {'properties': {' ': {'type': 'integer'},
                     '\t': {'type': 'string'}},
      'required': [' ']},
     [T('space key valid', {' ': 1}, True),
      T('space key wrong type', {' ': 'x'}, False),
      T('tab key wrong type', {' ': 1, '\t': 2}, False),
      T('space key missing', {'\t': 'a'}, False)]),
    ((4, 6, 7), 'overlapping patternProperties both apply (r5 cal b6)',
     {'patternProperties': {'^a': {'minimum': 0},
                            'a$': {'maximum': 10}}},
     [T('both patterns satisfied', {'aba': 5}, True),
      T('prefix pattern violated', {'ax': -1}, False),
      T('suffix pattern violated', {'xa': 11}, False),
      T('overlap needs both', {'a': 99}, False)]),
    ((4, 6, 7), 'items schema applies to every index (r5 cal b6)',
     {'items': {'minimum': 2}},
     [T('all pass', [2, 3, 4], True),
      T('first fails', [1, 3], False),
      T('last fails', [3, 1], False),
      T('empty ok', [], True)]),
    ((6, 7), 'contains empty schema needs nonempty array (r5 cal b6)',
     {'contains': {}},
     [T('nonempty ok', [None], True),
      T('empty fails', [], False),
      T('non-array ignored', 'x', True)]),
    ((6, 7), 'numeric exclusive bounds combined with inclusive '
             '(r5 cal b6)',
     {'minimum': 0, 'exclusiveMinimum': 0},
     [T('zero fails exclusive', 0, False),
      T('positive ok', 0.1, True),
      T('negative fails both', -1, False)]),
    ((4, 6, 7), 'minProperties ignores strings and arrays (r5 cal b6)',
     {'minProperties': 2},
     [T('long string ignored', 'abcdef', True),
      T('long array ignored', [1, 2, 3], True),
      T('small object fails', {'a': 1}, False),
      T('big object ok', {'a': 1, 'b': 2}, True)]),
    ((4, 6, 7), 'dependencies multiple triggers combined (r5 cal b6)',
     {'dependencies': {'a': ['x'], 'b': ['y']}},
     [T('neither trigger', {}, True),
      T('a with x', {'a': 1, 'x': 2}, True),
      T('both triggers satisfied', {'a': 1, 'x': 2, 'b': 3, 'y': 4},
        True),
      T('a without x', {'a': 1}, False),
      T('b without y', {'a': 1, 'x': 2, 'b': 3}, False)]),
    ((4, 6, 7), 'allOf anyOf oneOf together at root (r5 cal b6)',
     {'allOf': [{'multipleOf': 2}],
      'anyOf': [{'multipleOf': 3}],
      'oneOf': [{'multipleOf': 5}]},
     [T('30 satisfies all three', 30, True),
      T('6 misses oneOf', 6, False),
      T('10 misses anyOf', 10, False),
      T('15 misses allOf', 15, False)]),
    ((4, 6, 7), 'properties named like applicators (r5 cal b6)',
     {'properties': {'allOf': {'type': 'integer'},
                     '$ref': {'type': 'string'}}},
     [T('plain data keys validate', {'allOf': 1, '$ref': 'a'}, True),
      T('allOf key wrong type', {'allOf': 'x'}, False),
      T('ref key wrong type', {'$ref': 2}, False)]),
]

# Batch 7: double negation, diamond ref graphs, unicode normalization
# NOT applied, nested combinators, empty applicator objects, $ref
# through patternProperties, dependencies containing applicators.
CORE_GROUPS_B7 = [
    ((4, 6, 7), 'not not double negation (r5 cal b7)',
     {'not': {'not': {'type': 'integer'}}},
     [T('integer passes double negation', 1, True),
      T('string fails', 'x', False)]),
    ((4, 6, 7), 'oneOf nested inside oneOf (r5 cal b7)',
     {'oneOf': [{'oneOf': [{'type': 'integer'}]},
                {'type': 'boolean'}]},
     [T('integer via inner', 1, True),
      T('boolean via outer exactly one arm', True, True),
      T('string fails all', 'x', False)]),
    ((4, 6, 7), 'unicode composed vs decomposed distinct (r5 cal b7)',
     {'enum': ['café']},
     [T('composed form matches', 'café', True),
      T('decomposed form does not', 'café', False)]),
    ((4, 6, 7), 'uniqueItems composed vs decomposed (r5 cal b7)',
     {'uniqueItems': True},
     [T('nfc and nfd forms are distinct strings',
        ['café', 'café'], True),
      T('identical forms duplicate',
        ['café', 'café'], False)]),
    ((4, 6, 7), 'diamond ref graph (r5 cal b7)',
     {'definitions': {
         'base': {'type': 'integer'},
         'left': {'properties': {'l': {'$ref': '#/definitions/base'}}},
         'right': {'properties': {'r': {'$ref': '#/definitions/base'}}}},
      'allOf': [{'$ref': '#/definitions/left'},
                {'$ref': '#/definitions/right'}]},
     [T('both arms valid', {'l': 1, 'r': 2}, True),
      T('left arm violated', {'l': 'x', 'r': 2}, False),
      T('right arm violated', {'l': 1, 'r': 'x'}, False)]),
    ((4, 6, 7), 'empty applicator objects are no-ops (r5 cal b7)',
     {'properties': {}, 'patternProperties': {}, 'dependencies': {}},
     [T('any object ok', {'a': 1}, True),
      T('empty ok', {}, True),
      T('non-object ok', 5, True)]),
    ((4, 6, 7), 'ref through patternProperties (r5 cal b7)',
     {'definitions': {'pos': {'minimum': 0}},
      'patternProperties': {'^n_': {'$ref': '#/definitions/pos'}}},
     [T('matching key valid', {'n_x': 1}, True),
      T('matching key invalid', {'n_x': -1}, False),
      T('non-matching key ignored', {'m_x': -1}, True)]),
    ((4, 6, 7), 'dependencies schema containing applicators (r5 cal b7)',
     {'dependencies': {'a': {'anyOf': [{'required': ['b']},
                                       {'required': ['c']}]}}},
     [T('a with b', {'a': 1, 'b': 2}, True),
      T('a with c', {'a': 1, 'c': 2}, True),
      T('a alone', {'a': 1}, False),
      T('no trigger', {'x': 1}, True)]),
    ((4, 6, 7), 'minItems zero and empty array (r5 cal b7)',
     {'minItems': 0},
     [T('empty ok', [], True),
      T('nonempty ok', [1], True),
      T('non-array ignored', '', True)]),
    ((4, 6, 7), 'property named __proto__ (r5 cal b7)',
     {'properties': {'__proto__': {'type': 'integer'}},
      'required': ['__proto__']},
     [T('valid', {'__proto__': 1}, True),
      T('wrong type', {'__proto__': 'x'}, False),
      T('missing', {}, False)]),
    ((4, 6, 7), 'patternProperties regex metachars in key space '
                '(r5 cal b7)',
     {'patternProperties': {'^\\d+$': {'type': 'string'}}},
     [T('digit key validated', {'123': 'ok'}, True),
      T('digit key violated', {'123': 9}, False),
      T('alpha key ignored', {'abc': 9}, True)]),
    ((4, 6, 7), 'allOf chain of five (r5 cal b7)',
     {'allOf': [{'minimum': 1}, {'minimum': 2}, {'minimum': 3},
                {'minimum': 4}, {'minimum': 5}]},
     [T('meets strictest', 5, True),
      T('fails last only', 4.5, False),
      T('fails all', 0, False)]),
    ((6, 7), 'contains over nested arrays (r5 cal b7)',
     {'contains': {'type': 'array', 'minItems': 2}},
     [T('has a long inner array', [[1, 2], []], True),
      T('only short inner arrays', [[], [1]], False),
      T('scalars only', [1, 2, 3], False)]),
    ((4, 6, 7), 'enum single large string (r5 cal b7)',
     {'enum': ['x' * 1000]},
     [T('exact long string', 'x' * 1000, True),
      T('one char short', 'x' * 999, False)]),
    ((4, 6, 7), 'maxLength zero (r5 cal b7)',
     {'maxLength': 0},
     [T('empty string ok', '', True),
      T('one char too long', 'a', False),
      T('non-string ignored', 5, True)]),
    ((4, 6, 7), 'type integer large magnitudes (r5 cal b7)',
     {'type': 'integer', 'minimum': -(2 ** 62)},
     [T('2^62 is an integer', 2 ** 62, True),
      T('below minimum', -(2 ** 63), False)]),
    ((6, 7), 'propertyNames with enum (r5 cal b7)',
     {'propertyNames': {'enum': ['a', 'b']}},
     [T('allowed keys', {'a': 1, 'b': 2}, True),
      T('forbidden key', {'c': 1}, False),
      T('empty ok', {}, True)]),
    ((4, 6, 7), 'nested arrays items of items (r5 cal b7)',
     {'items': {'items': {'type': 'integer'}}},
     [T('matrix of ints', [[1, 2], [3]], True),
      T('inner string fails', [[1], ['x']], False),
      T('outer scalars pass vacuous inner', [1, 2], True)]),
    ((4, 6, 7), 'required duplicated across allOf arms (r5 cal b7)',
     {'allOf': [{'required': ['a']}, {'required': ['a', 'b']}]},
     [T('both present', {'a': 1, 'b': 2}, True),
      T('only a', {'a': 1}, False),
      T('neither', {}, False)]),
    ((4, 6, 7), 'pattern on property value not name (r5 cal b7)',
     {'properties': {'code': {'pattern': '^[A-Z]{3}-[0-9]{4}$'}}},
     [T('well-formed code', {'code': 'ABC-1234'}, True),
      T('malformed code', {'code': 'AB-123'}, False),
      T('missing is fine', {}, True)]),
]

# Batch 8: in-document $id scope shapes (official id.json / ref.json) —
# the corpus had no in-document $id groups at all; remote-$id shapes
# live in remote.json.  draft-4 spells the keyword 'id'.
CORE_GROUPS_B8 = [
    ((6, 7), 'definition anchored by absolute $id (r5 cal b8)',
     {'definitions': {
         'A': {'$id': 'http://localhost:1234/b8/int.json',
               'type': 'integer'}},
      'properties': {'x': {'$ref': 'http://localhost:1234/b8/int.json'}}},
     [T('resolves by absolute id', {'x': 1}, True),
      T('violation through id', {'x': 'no'}, False)]),
    ((6, 7), 'relative $id resolved against root $id (r5 cal b8)',
     {'$id': 'http://localhost:1234/b8root/main.json',
      'definitions': {
          'A': {'$id': 'sub.json', 'type': 'string'}},
      'properties': {'x': {'$ref': 'sub.json'}}},
     [T('relative id resolves', {'x': 's'}, True),
      T('violation through relative id', {'x': 1}, False)]),
    ((6, 7), 'nested $id scope changes inner ref base (r5 cal b8)',
     {'$id': 'http://localhost:1234/b8nest/root.json',
      'definitions': {
          'leaf': {'$id': 'http://localhost:1234/b8nest/deep/leaf.json',
                   'type': 'boolean'},
          'mid': {'$id': 'deep/mid.json',
                  'properties': {'b': {'$ref': 'leaf.json'}}}},
      'properties': {'m': {'$ref': 'deep/mid.json'}}},
     [T('two-level scope resolution', {'m': {'b': True}}, True),
      T('violation at the leaf', {'m': {'b': 3}}, False)]),
    ((4,), 'draft4 id keyword anchors a definition (r5 cal b8)',
     {'definitions': {
         'A': {'id': 'http://localhost:1234/b8d4/int.json',
               'type': 'integer'}},
      'properties': {'x': {'$ref': 'http://localhost:1234/b8d4/int.json'}}},
     [T('resolves by draft4 id', {'x': 1}, True),
      T('violation through draft4 id', {'x': 'no'}, False)]),
    ((6, 7), 'root $id with fragment ref to self (r5 cal b8)',
     {'$id': 'http://localhost:1234/b8self/root.json',
      'maxProperties': 1,
      'properties': {'child': {'$ref': '#'}}},
     [T('recursive through root id', {'child': {}}, True),
      T('inner violates root constraint',
        {'child': {'a': 1, 'b': 2}}, False)]),
    ((6, 7), '$id inside allOf arm scopes its refs (r5 cal b8)',
     {'$id': 'http://localhost:1234/b8arm/root.json',
      'definitions': {
          'num': {'$id': 'http://localhost:1234/b8arm/scoped/num.json',
                  'minimum': 10}},
      'allOf': [{'$id': 'scoped/',
                 'allOf': [{'$ref': 'num.json'}]}]},
     [T('scope-relative ref resolves', 11, True),
      T('violation through scoped ref', 5, False)]),
    ((6, 7), 'pointer ref into an $id-anchored definition (r5 cal b8)',
     {'definitions': {
         'box': {'$id': 'http://localhost:1234/b8ptr/box.json',
                 'properties': {'v': {'type': 'integer'}}}},
      'properties': {
          'direct': {'$ref': '#/definitions/box/properties/v'}}},
     [T('pointer path still works', {'direct': 2}, True),
      T('pointer path violation', {'direct': 'x'}, False)]),
]

# Batch 9: pointer refs into applicator arms, deep-equality shapes,
# wide/deep structural stress, unicode regex classes, self-dependency.
CORE_GROUPS_B9 = [
    ((4, 6, 7), 'ref into an allOf arm by pointer (r5 cal b9)',
     {'allOf': [{'minimum': 0}],
      'properties': {'x': {'$ref': '#/allOf/0'}}},
     [T('arm reused via pointer', {'x': 1}, True),
      T('arm violation via pointer', {'x': -1}, False)]),
    ((4, 6, 7), 'enum arrays are order-sensitive (r5 cal b9)',
     {'enum': [[1, 2]]},
     [T('same order matches', [1, 2], True),
      T('reversed does not', [2, 1], False),
      T('prefix does not', [1], False)]),
    ((6, 7), 'const deep nested equality (r5 cal b9)',
     {'const': {'a': [1, {'b': 2}]}},
     [T('deep equal', {'a': [1, {'b': 2}]}, True),
      T('deep leaf differs', {'a': [1, {'b': 3}]}, False),
      T('inner order differs', {'a': [{'b': 2}, 1]}, False)]),
    ((4, 6, 7), 'wide object fifty required keys (r5 cal b9)',
     {'required': ['k%02d' % i for i in range(50)]},
     [T('all fifty present', {'k%02d' % i: i for i in range(50)}, True),
      T('one missing', {'k%02d' % i: i for i in range(49)}, False)]),
    ((4, 6, 7), 'twenty-level nesting (r5 cal b9)',
     (lambda d: [d := {'properties': {'n': d}}
                 for _ in range(19)] and d)({'type': 'integer'}),
     [T('deep valid',
        (lambda v: [v := {'n': v} for _ in range(19)] and v)(1), True),
      T('deep violation',
        (lambda v: [v := {'n': v} for _ in range(19)] and v)('x'),
        False)]),
    ((4, 6, 7), 'unicode class in patternProperties (r5 cal b9)',
     {'patternProperties': {'^[а-я]+$': {'type': 'integer'}},
      'additionalProperties': {'type': 'string'}},
     [T('cyrillic key validated', {'ключ': 1}, True),
      T('cyrillic key violated', {'ключ': 'x'}, False),
      T('latin key is additional', {'key': 's'}, True)]),
    ((4, 6, 7), 'self-dependency (r5 cal b9)',
     {'dependencies': {'a': ['a']}},
     [T('trivially satisfied when present', {'a': 1}, True),
      T('absent trigger ok', {}, True)]),
    ((7,), 'if inside items (r5 cal b9)',
     {'items': {'if': {'type': 'number'},
                'then': {'minimum': 0},
                'else': {'minLength': 1}}},
     [T('numbers and strings each routed', [1, 'a'], True),
      T('negative number fails then', [-1], False),
      T('empty string fails else', [''], False)]),
    ((4, 6, 7), 'not with required (r5 cal b9)',
     {'not': {'required': ['secret']}},
     [T('without the key ok', {'a': 1}, True),
      T('with the key rejected', {'secret': 1}, False),
      T('non-object: inner required vacuous -> not fails', 5, False)]),
    ((6, 7), 'contains alongside items (r5 cal b9)',
     {'items': {'minimum': 0}, 'contains': {'minimum': 10}},
     [T('all pass items, one passes contains', [1, 11], True),
      T('items ok but contains unmet', [1, 2], False),
      T('one fails items', [-1, 11], False)]),
    ((4, 6, 7), 'additionalProperties true explicit (r5 cal b9)',
     {'properties': {'a': {'type': 'integer'}},
      'additionalProperties': True},
     [T('extra anything ok', {'a': 1, 'z': 'w'}, True),
      T('declared still validated', {'a': 'x'}, False)]),
    ((4, 6, 7), 'type single-element array (r5 cal b9)',
     {'type': ['string']},
     [T('string ok', 'x', True),
      T('number rejected', 1, False)]),
    ((4, 6, 7), 'oneOf inside not (r5 cal b9)',
     {'not': {'oneOf': [{'type': 'integer'}, {'minimum': 100}]}},
     [T('string matches minimum arm vacuously -> rejected', 'x', False),
      T('matches exactly one -> rejected', 1, False),
      T('matches one (float >=100) -> rejected', 200.5, False),
      T('matches both -> oneOf fails -> not ok', 200, True)]),
    ((4, 6, 7), 'pattern alternation groups (r5 cal b9)',
     {'pattern': '^(foo|bar)(-\\d+)?$'},
     [T('bare alternative', 'foo', True),
      T('with numeric suffix', 'bar-12', True),
      T('wrong word', 'baz-1', False),
      T('suffix without dash', 'foo12', False)]),
]


def iter_candidates():
    for draft, desc, schema, tests in format_groups():
        yield draft, desc, schema, tests
    for drafts, desc, schema, tests in (CORE_GROUPS + CORE_GROUPS_B4 +
                                        CORE_GROUPS_B6 + CORE_GROUPS_B7 +
                                        CORE_GROUPS_B8 + CORE_GROUPS_B9):
        for draft in drafts:
            yield draft, desc, schema, copy.deepcopy(tests)
        if 7 in drafts:
            # bare-schema default dialect (2019): draft-7 keyword
            # semantics carry over for everything in this corpus; the
            # calibration pass drops any case where they don't.
            yield 2019, desc, schema, copy.deepcopy(tests)


def reference_module():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import fastjsonschema
    return fastjsonschema


def calibrate():
    ref = reference_module()
    kept = {4: [], 6: [], 7: [], 2019: []}
    dropped = []
    for draft, desc, schema, tests in iter_candidates():
        schema_d = copy.deepcopy(schema)
        if isinstance(schema_d, dict) and DRAFT_URI[draft]:
            schema_d.setdefault('$schema', DRAFT_URI[draft])
        try:
            validate = ref.compile(copy.deepcopy(schema_d))
        except Exception as exc:                       # noqa: BLE001
            dropped.append((draft, desc, '<compile>', repr(exc)))
            continue
        surviving = []
        for t in tests:
            try:
                validate(copy.deepcopy(t['data']))
                got = True
            except ref.JsonSchemaValueException:
                got = False
            except Exception as exc:                   # noqa: BLE001
                dropped.append((draft, desc, t['description'],
                                'crash ' + repr(exc)))
                continue
            if got == t['valid']:
                surviving.append(t)
            else:
                dropped.append((draft, desc, t['description'],
                                'spec %s ref %s' % (t['valid'], got)))
        if surviving:
            kept[draft].append({'description': desc, 'schema': schema,
                                'tests': surviving})
    return kept, dropped


def write(kept):
    total = 0
    for draft, groups in kept.items():
        if not groups:
            continue
        path = os.path.join(HERE, 'draft%s.json' % draft)
        with open(path) as f:
            existing = json.load(f)
        have = {g['description'] for g in existing}
        new = [g for g in groups if g['description'] not in have]
        if not new:
            continue
        existing.extend(new)
        with open(path, 'w') as f:
            json.dump(existing, f, indent=1, ensure_ascii=False)
            f.write('\n')
        n = sum(len(g['tests']) for g in new)
        total += n
        print('draft%s: +%d groups, +%d cases' % (draft, len(new), n))
    print('total new cases: %d' % total)


def main():
    kept, dropped = calibrate()
    n_keep = sum(len(g['tests']) for gs in kept.values() for g in gs)
    print('kept %d cases across %d groups' %
          (n_keep, sum(len(gs) for gs in kept.values())))
    print('dropped %d divergent/crashing cases:' % len(dropped))
    for draft, desc, case, why in dropped:
        print('  draft%s | %s | %s | %s' % (draft, desc, case, why))
    if '--write' in sys.argv:
        write(kept)


if __name__ == '__main__':
    main()

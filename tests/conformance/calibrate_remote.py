"""Calibrate candidate remote-$ref conformance groups against the reference
and append survivors to tests/conformance/remote.json (dedupe by description).

Usage: python tests/conformance/calibrate_remote.py [--write]
"""
import copy
import json
import os
import sys

sys.path.insert(0, '/root/reference')
import fastjsonschema  # noqa: E402

HERE = '/root/repo/tests/conformance'
D = {4: 'http://json-schema.org/draft-04/schema',
     6: 'http://json-schema.org/draft-06/schema',
     7: 'http://json-schema.org/draft-07/schema',
     2019: None}

L = 'http://localhost:1234/'


def G(desc, draft, remotes, schema, tests, vector=True):
    return {'description': desc, 'draft': draft, 'remotes': remotes,
            'schema': schema, 'tests': tests, 'vector': vector}


def T(desc, data, valid):
    return {'description': desc, 'data': data, 'valid': valid}


CANDIDATES = [
    G('remote ref with escaped pointer fragments', 7,
      {L + 'escapes.json': {
          'definitions': {'tilde~field': {'type': 'integer'},
                          'slash/field': {'type': 'string'},
                          'per%cent': {'type': 'boolean'}}}},
      {'properties': {
          't': {'$ref': L + 'escapes.json#/definitions/tilde~0field'},
          's': {'$ref': L + 'escapes.json#/definitions/slash~1field'},
          'p': {'$ref': L + 'escapes.json#/definitions/per%25cent'}}},
      [T('all resolve', {'t': 1, 's': 'a', 'p': True}, True),
       T('tilde target violated', {'t': 'x'}, False),
       T('slash target violated', {'s': 1}, False),
       T('percent target violated', {'p': 'x'}, False)]),
    G('cyclic refs across two remote documents', 7,
      {L + 'tree.json': {
          '$id': L + 'tree.json',
          'type': 'object',
          'properties': {
              'meta': {'type': 'string'},
              'nodes': {'type': 'array',
                        'items': {'$ref': 'node.json'}}},
          'required': ['meta', 'nodes']},
       L + 'node.json': {
          '$id': L + 'node.json',
          'type': 'object',
          'properties': {
              'value': {'type': 'number'},
              'subtree': {'$ref': 'tree.json'}},
          'required': ['value']}},
      {'$ref': L + 'tree.json'},
      [T('valid tree', {'meta': 'root', 'nodes': [
          {'value': 1,
           'subtree': {'meta': 'child', 'nodes': [{'value': 1.1}]}}]}, True),
       T('invalid deep node value', {'meta': 'root', 'nodes': [
          {'value': 1,
           'subtree': {'meta': 'child',
                       'nodes': [{'value': 'string is invalid'}]}}]},
         False)]),
    G('remote ref to boolean schema false', 7,
      {L + 'nope.json': False},
      {'properties': {'foo': {'$ref': L + 'nope.json'}}},
      [T('foo present is invalid', {'foo': 1}, False),
       T('foo absent is valid', {'bar': 1}, True)]),
    G('remote ref to boolean schema true', 7,
      {L + 'yep.json': True},
      {'properties': {'foo': {'$ref': L + 'yep.json'}}},
      [T('anything valid', {'foo': [1, 'x']}, True)]),
    G('remote ref inside items applicator', 7,
      {L + 'integer.json': {'type': 'integer'}},
      {'items': {'$ref': L + 'integer.json'}},
      [T('all integers', [1, 2, 3], True),
       T('one string', [1, 'x'], False),
       T('empty ok', [], True)]),
    G('remote ref inside additionalProperties', 7,
      {L + 'integer.json': {'type': 'integer'}},
      {'properties': {'known': {}},
       'additionalProperties': {'$ref': L + 'integer.json'}},
      [T('extra integer ok', {'known': 'x', 'other': 3}, True),
       T('extra string fails', {'other': 'x'}, False)]),
    G('remote ref inside patternProperties', 7,
      {L + 'string.json': {'type': 'string'}},
      {'patternProperties': {'^s_': {'$ref': L + 'string.json'}}},
      [T('matching key valid value', {'s_a': 'x'}, True),
       T('matching key invalid value', {'s_a': 1}, False),
       T('non-matching key ignored', {'t_a': 1}, True)]),
    G('remote fragment into tuple items', 7,
      {L + 'tuple.json': {
          'items': [{'type': 'integer'}, {'type': 'string'}]}},
      {'$ref': L + 'tuple.json#/items/1'},
      [T('string ok', 'x', True),
       T('integer fails', 1, False)]),
    G('remote ref chain of five documents', 7,
      {L + 'c1.json': {'$ref': L + 'c2.json'},
       L + 'c2.json': {'$ref': L + 'c3.json'},
       L + 'c3.json': {'$ref': L + 'c4.json'},
       L + 'c4.json': {'$ref': L + 'c5.json'},
       L + 'c5.json': {'type': 'null'}},
      {'$ref': L + 'c1.json'},
      [T('null resolves through chain', None, True),
       T('non-null fails at chain end', 0, False)]),
    G('same remote through two different fragments', 7,
      {L + 'pair.json': {
          'definitions': {'a': {'type': 'integer'},
                          'b': {'type': 'string'}}}},
      {'properties': {'x': {'$ref': L + 'pair.json#/definitions/a'},
                      'y': {'$ref': L + 'pair.json#/definitions/b'}}},
      [T('both fragments hold', {'x': 1, 'y': 's'}, True),
       T('first fragment violated', {'x': 's'}, False),
       T('second fragment violated', {'y': 1}, False)]),
    G('remote ref inside oneOf arms', 7,
      {L + 'integer.json': {'type': 'integer'},
       L + 'string.json': {'type': 'string'}},
      {'oneOf': [{'$ref': L + 'integer.json'},
                 {'$ref': L + 'string.json'}]},
      [T('integer arm', 3, True),
       T('string arm', 'x', True),
       T('neither arm', None, False)]),
    G('remote document with internal location-independent $id', 7,
      {L + 'anchored.json': {
          'definitions': {
              'A': {'$id': '#inner', 'type': 'integer'}},
          '$ref': '#inner'}},
      {'$ref': L + 'anchored.json'},
      [T('integer via anchor', 1, True),
       T('string fails via anchor', 'x', False)], vector=False),
    G('deeply nested remote pointer', 7,
      {L + 'deep.json': {
          'definitions': {'a': {
              'properties': {'b': {
                  'items': {'type': 'boolean'}}}}}}},
      {'$ref': L + 'deep.json#/definitions/a/properties/b/items'},
      [T('boolean ok', True, True),
       T('number fails', 1, False)]),
    G('remote ref draft-06 with $id pointer base', 6,
      {L + 'd6base.json': {
          '$id': L + 'd6base.json',
          'definitions': {
              'num': {'$id': 'num.json', 'type': 'number'}}}},
      {'$ref': L + 'd6base.json#/definitions/num'},
      [T('number ok', 2.5, True),
       T('string fails', 'x', False)]),
    G('remote retrieval URI differs from declared $id', 7,
      {L + 'fetch-me.json': {
          '$id': L + 'real-name.json',
          'definitions': {'bar': {'type': 'string'}},
          'properties': {'v': {'$ref': 'real-name.json#/definitions/bar'}}}},
      {'$ref': L + 'fetch-me.json'},
      [T('string property ok', {'v': 's'}, True),
       T('number property fails', {'v': 1}, False)], vector=False),
    # ---- batch 6 (round 5 final) -------------------------------------
    G('remote ref via custom URI scheme handler', 7,
      {'resource://registry/point.json': {
          'properties': {'x': {'type': 'number'},
                         'y': {'type': 'number'}},
          'required': ['x', 'y']}},
      {'$ref': 'resource://registry/point.json'},
      [T('valid point', {'x': 1, 'y': 2.5}, True),
       T('missing y', {'x': 1}, False),
       T('string coordinate', {'x': 'a', 'y': 2}, False)]),
    G('remote URI with query string', 7,
      {L + 'lookup?name=int&v=2': {'type': 'integer'}},
      {'properties': {'n': {'$ref': L + 'lookup?name=int&v=2'}}},
      [T('integer ok', {'n': 1}, True),
       T('string fails', {'n': 'x'}, False)]),
    G('remote cycle of three documents', 7,
      {L + 'r1.json': {
          'properties': {'a': {'$ref': L + 'r2.json'}}},
       L + 'r2.json': {
          'properties': {'b': {'$ref': L + 'r3.json'}}},
       L + 'r3.json': {
          'properties': {'c': {'$ref': L + 'r1.json'}},
          'required': ['c']}},
      {'$ref': L + 'r1.json'},
      [T('terminating nesting valid', {'a': {'b': {'c': {'a': 1}}}},
         True),
       T('r3 required violated', {'a': {'b': {'x': 1}}}, False)]),
    G('remote fragment to boolean false definition', 7,
      {L + 'mixed.json': {
          'definitions': {'never': False, 'always': True}}},
      {'properties': {'n': {'$ref': L + 'mixed.json#/definitions/never'},
                      'a': {'$ref': L + 'mixed.json#/definitions/always'}}},
      [T('never present fails', {'n': 1}, False),
       T('always alone ok', {'a': 'anything'}, True),
       T('empty ok', {}, True)]),
    G('remote ref inside contains', 7,
      {L + 'big.json': {'minimum': 100}},
      {'contains': {'$ref': L + 'big.json'}},
      [T('one big element', [1, 200], True),
       T('all small', [1, 2], False)]),
    G('remote ref inside propertyNames', 7,
      {L + 'short.json': {'maxLength': 2}},
      {'propertyNames': {'$ref': L + 'short.json'}},
      [T('short keys ok', {'ab': 1}, True),
       T('long key fails', {'abc': 1}, False)]),
    G('remote ref inside not', 7,
      {L + 'string.json': {'type': 'string'}},
      {'not': {'$ref': L + 'string.json'}},
      [T('number ok', 1, True),
       T('string rejected', 'x', False)]),
    G('remote ref inside if and then', 7,
      {L + 'object.json': {'type': 'object'},
       L + 'hasid.json': {'required': ['id']}},
      {'if': {'$ref': L + 'object.json'},
       'then': {'$ref': L + 'hasid.json'}},
      [T('object with id', {'id': 1}, True),
       T('object missing id', {'x': 1}, False),
       T('non-object passes vacuously', 5, True)]),
    G('remote URI with percent-encoded path', 7,
      {L + 'spa%20ce.json': {'type': 'boolean'}},
      {'$ref': L + 'spa%20ce.json'},
      [T('boolean ok', True, True),
       T('number fails', 1, False)]),
    G('two nested folder base changes in one remote', 7,
      {L + 'top.json': {
          '$id': L + 'top.json',
          'properties': {
              'lvl1': {
                  '$id': L + 'f1/',
                  'properties': {
                      'lvl2': {'$id': 'f2/',
                               'properties': {
                                   'leaf': {'$ref': 'leafInteger.json'}}}}}}},
       L + 'f1/f2/leafInteger.json': {'type': 'integer'}},
      {'$ref': L + 'top.json'},
      [T('leaf integer ok', {'lvl1': {'lvl2': {'leaf': 1}}}, True),
       T('leaf string fails', {'lvl1': {'lvl2': {'leaf': 'x'}}}, False)],
      vector=False),
]


def handlers_for(group):
    remotes = group['remotes']

    def handler(uri):
        if uri in remotes:
            return copy.deepcopy(remotes[uri])
        raise LookupError('unknown remote URI: ' + uri)
    schemes = {'http', 'https'}
    schemes.update(u.split('://', 1)[0] for u in remotes if '://' in u)
    return {s: handler for s in schemes}


def main():
    kept, dropped = [], []
    for g in CANDIDATES:
        schema = copy.deepcopy(g['schema'])
        if isinstance(schema, dict) and D[g['draft']]:
            schema.setdefault('$schema', D[g['draft']])
        try:
            v = fastjsonschema.compile(schema, handlers=handlers_for(g))
        except Exception as exc:  # noqa: BLE001
            dropped.append((g['description'], '<compile>', repr(exc)))
            continue
        surviving = []
        for t in g['tests']:
            try:
                v(copy.deepcopy(t['data']))
                got = True
            except fastjsonschema.JsonSchemaValueException:
                got = False
            except Exception as exc:  # noqa: BLE001
                dropped.append((g['description'], t['description'],
                                'crash ' + repr(exc)))
                continue
            if got == t['valid']:
                surviving.append(t)
            else:
                dropped.append((g['description'], t['description'],
                                'spec %s ref %s' % (t['valid'], got)))
        if surviving:
            gg = dict(g)
            gg['tests'] = surviving
            kept.append(gg)
    print('kept %d groups / %d cases' %
          (len(kept), sum(len(g['tests']) for g in kept)))
    for d in dropped:
        print('  DROP', ' | '.join(d))
    if '--write' in sys.argv:
        path = os.path.join(HERE, 'remote.json')
        with open(path) as f:
            existing = json.load(f)
        have = {g['description'] for g in existing}
        new = [g for g in kept if g['description'] not in have]
        existing.extend(new)
        with open(path, 'w') as f:
            json.dump(existing, f, indent=1, ensure_ascii=False)
            f.write('\n')
        print('wrote +%d groups, +%d cases' %
              (len(new), sum(len(g['tests']) for g in new)))


if __name__ == '__main__':
    main()

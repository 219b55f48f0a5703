"""Driver-side ``$ref`` registry.

Covers the reference resolver's semantics (``fastjsonschema/ref_resolver.py``):
``$id``/``id`` scope handling, RFC 6901 fragment resolution, plain-name
fragments, a walk-depth DoS cap, and pluggable ``handlers`` per URI scheme.

Deliberate divergence from the reference: there is **no implicit urllib
fetch** — a remote URI with no registered handler raises
``JsonSchemaDefinitionException`` (the reference itself warns about the SSRF
risk at ``__init__.py:221-228``; an engine meant to run unattended on a
cluster must not perform network I/O from schema contents).
"""

from __future__ import annotations

import contextlib
import sys
from urllib import parse as urlparse
from urllib.parse import unquote

from ..exceptions import JsonSchemaDefinitionException

MAX_SCHEMA_WALK_DEPTH = min(500, sys.getrecursionlimit() // 2)


def schema_id(schema) -> str:
    if isinstance(schema, dict):
        return schema.get('$id', schema.get('id', ''))
    return ''


def _normalize(uri: str) -> str:
    return urlparse.urlsplit(uri).geturl()


def resolve_pointer(schema, fragment: str):
    """RFC 6901 JSON-pointer fragment resolution."""
    fragment = fragment.lstrip('/')
    parts = unquote(fragment).split('/') if fragment else []
    for part in parts:
        part = part.replace('~1', '/').replace('~0', '~')
        if isinstance(schema, list):
            schema = schema[int(part)]
        elif isinstance(schema, dict) and part in schema:
            schema = schema[part]
        else:
            raise JsonSchemaDefinitionException('Unresolvable ref: {}'.format(part))
    return schema


class SchemaRegistry:
    """URI → schema store with resolution scopes.

    Construction walks the schema once, rewriting every ``$ref`` to an
    absolute URI against the enclosing scope and registering every ``$id``
    subschema (mirrors ``RefResolver.walk``, ``ref_resolver.py:181-204``).
    """

    def __init__(self, base_uri: str, schema, store=None, handlers=None):
        self.base_uri = base_uri
        self.scope = base_uri
        self.schema = schema
        self.store = {} if store is None else store
        self.handlers = handlers or {}
        self._walked = set()
        self.walk(schema)
        self._walked.add(_normalize(base_uri) if base_uri else '')

    @classmethod
    def from_schema(cls, schema, handlers=None, store=None):
        return cls(schema_id(schema), schema, store=store, handlers=handlers)

    @contextlib.contextmanager
    def in_scope(self, scope: str):
        old = self.scope
        self.scope = urlparse.urljoin(old, scope)
        try:
            yield
        finally:
            self.scope = old

    @contextlib.contextmanager
    def resolving(self, ref: str):
        new_uri = urlparse.urljoin(self.scope, ref)
        uri, fragment = urlparse.urldefrag(new_uri)
        document_uri = uri or self.base_uri

        if uri and _normalize(uri) in self.store:
            schema = self.store[_normalize(uri)]
        elif not uri or uri == self.base_uri:
            schema = self.schema
        else:
            schema = self._fetch(uri)
            self.store[_normalize(uri)] = schema

        old_base, old_schema = self.base_uri, self.schema
        self.base_uri, self.schema = document_uri, schema
        try:
            with self.in_scope(document_uri):
                norm = _normalize(document_uri) if document_uri else ''
                if norm not in self._walked:
                    self.walk(schema)
                    self._walked.add(norm)
                if fragment and not fragment.startswith('/'):
                    plain = _normalize(urlparse.urljoin(document_uri, '#' + fragment))
                    if plain in self.store:
                        yield self.store[plain]
                        return
                    raise JsonSchemaDefinitionException('Unresolvable ref: {}'.format(fragment))
                yield resolve_pointer(schema, fragment)
        finally:
            self.base_uri, self.schema = old_base, old_schema

    def _fetch(self, uri: str):
        scheme = urlparse.urlsplit(uri).scheme
        if scheme in self.handlers:
            return self.handlers[scheme](uri)
        raise JsonSchemaDefinitionException(
            'Remote ref {} has no registered handler (network fetch is disabled '
            'in this engine; pass handlers={{scheme: fetch_fn}})'.format(uri)
        )

    def current_uri(self) -> str:
        return _normalize(self.scope)

    def walk(self, node, depth: int = 0):
        if depth >= MAX_SCHEMA_WALK_DEPTH:
            raise JsonSchemaDefinitionException(
                'Schema is too deeply nested (maximum depth is {})'.format(MAX_SCHEMA_WALK_DEPTH)
            )
        if isinstance(node, bool):
            return
        if '$ref' in node and isinstance(node['$ref'], str):
            node['$ref'] = urlparse.urljoin(self.scope, node['$ref'])
        elif ('$id' in node or 'id' in node) and isinstance(schema_id(node), str):
            with self.in_scope(schema_id(node)):
                self.store[_normalize(self.scope)] = node
                for item in node.values():
                    if isinstance(item, dict):
                        self.walk(item, depth + 1)
        else:
            for item in node.values():
                if isinstance(item, dict):
                    self.walk(item, depth + 1)

    def expand_refs(self, definition):
        """Expand one level of ``$ref`` inside a reported definition
        (mirrors ``generator.py:297-305``)."""
        if isinstance(definition, list):
            return [self.expand_refs(v) for v in definition]
        if not isinstance(definition, dict):
            return definition
        if '$ref' in definition and isinstance(definition['$ref'], str):
            with self.resolving(definition['$ref']) as target:
                return target
        return {k: self.expand_refs(v) for k, v in definition.items()}

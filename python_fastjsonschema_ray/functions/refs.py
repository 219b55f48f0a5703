"""Driver-side ``$ref`` registry.

Covers the reference resolver's semantics (``fastjsonschema/ref_resolver.py``):
``$id``/``id`` scope handling, RFC 6901 fragment resolution, plain-name
fragments, a walk-depth DoS cap, and pluggable ``handlers`` per URI scheme —
re-expressed as an iterative document indexer plus small resolve helpers
(the reference uses a recursive walk with nested scope context managers).

Deliberate divergence from the reference: there is **no implicit urllib
fetch** — a remote URI with no registered handler raises
``JsonSchemaDefinitionException`` (the reference itself warns about the SSRF
risk at ``__init__.py:221-228``; an engine meant to run unattended on a
cluster must not perform network I/O from schema contents).  Users who
WANT the reference's fetch-by-default behavior opt in explicitly:
``compile(schema, handlers=urllib_handlers())``.
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
    for raw in unquote(fragment.lstrip('/')).split('/') if \
            fragment.lstrip('/') else ():
        token = raw.replace('~1', '/').replace('~0', '~')
        if isinstance(schema, list):
            schema = schema[int(token)]
        elif isinstance(schema, dict) and token in schema:
            schema = schema[token]
        else:
            raise JsonSchemaDefinitionException(
                'Unresolvable ref: {}'.format(token))
    return schema


def urllib_handler(allowed_prefixes=None):
    """OPT-IN remote ``$ref`` fetcher with the reference's
    ``resolve_remote`` semantics (``ref_resolver.py:53-74``): fetch via
    :mod:`urllib`, decode with the response charset (utf-8 default),
    and raise ``JsonSchemaDefinitionException('{uri} failed to
    decode')`` on invalid JSON.

    .. warning::

        Same SSRF warning as the reference (``__init__.py:221-228``):
        a schema containing ``$ref`` can trigger outbound HTTP requests
        to arbitrary URLs, including internal or loopback addresses.
        Never enable this for untrusted schemas; pass
        ``allowed_prefixes`` to restrict which URIs may be fetched, or
        pre-resolve references instead.  This engine never fetches by
        default — unlike the reference, the handler must be registered
        explicitly (``handlers=urllib_handlers()``).

    ``allowed_prefixes`` entries are absolute URI prefixes compared
    component-wise: the request's scheme and netloc must EQUAL the
    prefix's (case-insensitive), and its path must start with the
    prefix's path — so ``http://example.com`` does NOT admit
    ``http://example.com.evil.io/`` or ``http://example.com@evil.io/``.
    When a guard is set, HTTP redirects are followed only after the
    redirect target passes the same check.
    """
    import json

    # Parsed (scheme, netloc, path-prefix) triples: a naive
    # uri.startswith() guard accepts 'http://example.com.evil.io/' and
    # 'http://example.com@evil.io/' for allowed prefix
    # 'http://example.com', so origins are compared component-wise.
    prefixes = None
    if allowed_prefixes:
        prefixes = []
        for p in allowed_prefixes:
            parts = urlparse.urlsplit(p)
            if not parts.scheme:
                raise JsonSchemaDefinitionException(
                    'allowed_prefixes entries must be absolute URIs '
                    '(got {!r})'.format(p))
            prefixes.append(
                (parts.scheme.lower(), parts.netloc.lower(), parts.path))

    def _check_allowed(uri):
        if prefixes is None:
            return
        parts = urlparse.urlsplit(uri)
        scheme = parts.scheme.lower()
        netloc = parts.netloc.lower()
        for a_scheme, a_netloc, a_path in prefixes:
            if (scheme == a_scheme and netloc == a_netloc
                    and parts.path.startswith(a_path)):
                return
        raise JsonSchemaDefinitionException(
            'Remote ref {} not under an allowed prefix'.format(uri))

    def _open(uri):
        from urllib.request import (HTTPRedirectHandler, build_opener,
                                    urlopen)
        if prefixes is None:
            return urlopen(uri)

        # Re-check every redirect target: urlopen's default opener
        # follows redirects off the allowed origin otherwise.
        class _GuardedRedirect(HTTPRedirectHandler):
            def redirect_request(self, req, fp, code, msg, headers,
                                 newurl):
                _check_allowed(newurl)
                return HTTPRedirectHandler.redirect_request(
                    self, req, fp, code, msg, headers, newurl)

        return build_opener(_GuardedRedirect).open(uri)

    def handler(uri):
        _check_allowed(uri)
        with _open(uri) as response:
            charset = 'utf-8'
            try:
                charset = response.info().get_content_charset() or 'utf-8'
            except AttributeError:
                pass  # file:// responses have no charset header
            try:
                return json.loads(response.read().decode(charset))
            except ValueError as exc:
                raise JsonSchemaDefinitionException(
                    '{} failed to decode'.format(uri)) from exc

    return handler


def urllib_handlers(schemes=('http', 'https', 'file'),
                    allowed_prefixes=None):
    """Scheme→fetcher mapping enabling the reference's default remote
    resolution, explicitly: ``compile(schema,
    handlers=urllib_handlers())``.  See :func:`urllib_handler` for the
    SSRF warning and the ``allowed_prefixes`` guard."""
    h = urllib_handler(allowed_prefixes)
    return {scheme: h for scheme in schemes}


class SchemaRegistry:
    """URI → schema store with resolution scopes.

    Indexing a document rewrites every ``$ref`` in it to an absolute URI
    against its enclosing ``$id`` scope and registers every ``$id``
    subschema in the store; it runs once per document URI, iteratively
    (explicit stack carrying per-node scope and depth)."""

    def __init__(self, base_uri: str, schema, store=None, handlers=None):
        self.base_uri = base_uri
        self.scope = base_uri
        self.schema = schema
        self.store = {} if store is None else store
        self.handlers = handlers or {}
        self._indexed = set()
        self._index_document(base_uri, schema, start_scope=base_uri)

    @classmethod
    def from_schema(cls, schema, handlers=None, store=None):
        return cls(schema_id(schema), schema, store=store, handlers=handlers)

    # -- scope bookkeeping -------------------------------------------------

    @contextlib.contextmanager
    def in_scope(self, scope: str):
        previous = self.scope
        self.scope = urlparse.urljoin(previous, scope)
        try:
            yield
        finally:
            self.scope = previous

    def current_uri(self) -> str:
        return _normalize(self.scope)

    # -- document indexing -------------------------------------------------

    def _index_document(self, doc_uri: str, document, start_scope=None):
        key = _normalize(doc_uri) if doc_uri else ''
        if key in self._indexed:
            return
        self._indexed.add(key)
        pending = [(document, start_scope if start_scope is not None
                    else self.scope, 0)]
        while pending:
            node, scope, depth = pending.pop()
            if depth >= MAX_SCHEMA_WALK_DEPTH:
                raise JsonSchemaDefinitionException(
                    'Schema is too deeply nested (maximum depth is {})'
                    .format(MAX_SCHEMA_WALK_DEPTH))
            if not isinstance(node, dict):
                continue
            ref = node.get('$ref')
            if isinstance(ref, str):
                # Absolutize against the enclosing scope; $ref nodes are
                # terminal (their siblings/children are not indexed).
                node['$ref'] = urlparse.urljoin(scope, ref)
                continue
            if ('$id' in node or 'id' in node) \
                    and isinstance(schema_id(node), str):
                scope = urlparse.urljoin(scope, schema_id(node))
                self.store[_normalize(scope)] = node
            # Only dict-valued members are indexed (list members resolve
            # lazily through ``resolving``), matching reference semantics.
            # Children pushed reversed so pop() visits them depth-first in
            # document order (duplicate-$id last-write-wins is preserved).
            pending.extend(reversed([(child, scope, depth + 1)
                                     for child in node.values()
                                     if isinstance(child, dict)]))

    # -- resolution --------------------------------------------------------

    def _document_for(self, uri: str):
        """The schema document a URI names: store hit, the current root,
        or a handler fetch (cached)."""
        if uri and _normalize(uri) in self.store:
            return self.store[_normalize(uri)]
        if not uri or uri == self.base_uri:
            return self.schema
        scheme = urlparse.urlsplit(uri).scheme
        if scheme not in self.handlers:
            raise JsonSchemaDefinitionException(
                'Remote ref {} has no registered handler (network fetch is '
                'disabled in this engine; pass handlers={{scheme: fetch_fn}})'
                .format(uri))
        fetched = self.handlers[scheme](uri)
        self.store[_normalize(uri)] = fetched
        return fetched

    def _fragment_target(self, document, doc_uri: str, fragment: str):
        if fragment and not fragment.startswith('/'):
            # Plain-name fragment: must name a registered $id.
            plain_key = _normalize(
                urlparse.urljoin(doc_uri, '#' + fragment))
            if plain_key in self.store:
                return self.store[plain_key]
            raise JsonSchemaDefinitionException(
                'Unresolvable ref: {}'.format(fragment))
        return resolve_pointer(document, fragment)

    @contextlib.contextmanager
    def resolving(self, ref: str):
        uri, fragment = urlparse.urldefrag(urlparse.urljoin(self.scope, ref))
        doc_uri = uri or self.base_uri
        document = self._document_for(uri)
        saved = (self.base_uri, self.schema)
        self.base_uri, self.schema = doc_uri, document
        try:
            with self.in_scope(doc_uri):
                self._index_document(doc_uri, document)
                yield self._fragment_target(document, doc_uri, fragment)
        finally:
            self.base_uri, self.schema = saved

    # -- reporting helper --------------------------------------------------

    def expand_refs(self, definition):
        """Expand one level of ``$ref`` inside a reported definition
        (mirrors ``generator.py:297-305``)."""
        if isinstance(definition, list):
            return [self.expand_refs(v) for v in definition]
        if not isinstance(definition, dict):
            return definition
        if isinstance(definition.get('$ref'), str):
            with self.resolving(definition['$ref']) as target:
                return target
        return {k: self.expand_refs(v) for k, v in definition.items()}

"""Built-in ``format`` assertion regexes, per JSON Schema draft.

The regex *semantics* (what each format accepts) follow the reference tables at
``fastjsonschema/draft04.py:28-35``, ``draft06.py:8-17``, ``draft07.py:5-19``
and ``draft2019.py:4-15`` — including the deliberately leading-zero-rejecting
``ipv4`` (CVE-2021-28918) and the ``\\Z`` anchoring.  Unknown formats are
silently ignored, and built-ins can be overridden by user ``formats=``.
"""

from __future__ import annotations

_IPV6_TAIL = (
    r"(?:[0-9A-Fa-f]{1,4}:[0-9A-Fa-f]{1,4}|(?:(?:[0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])\.){3}"
    r"(?:[0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5]))"
)

FORMAT_REGEXS_DRAFT04 = {
    'date-time': r'^\d{4}-[01]\d-[0-3]\d(t|T)[0-2]\d:[0-5]\d:[0-5]\d(?:\.\d+)?(?:[+-][0-2]\d:[0-5]\d|[+-][0-2]\d[0-5]\d|z|Z)\Z',
    'email': r'^(?!.*\.\..*@)[^@.][^@]*(?<!\.)@[^@]+\.[^@]+\Z',
    'hostname': r'^(([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])\.)*([A-Za-z0-9]|[A-Za-z0-9][A-Za-z0-9\-]{0,61}[A-Za-z0-9])\Z',
    'ipv4': r'^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\Z',
    'ipv6': (
        r'^(?:(?:[0-9A-Fa-f]{1,4}:){6}' + _IPV6_TAIL
        + r'|::(?:[0-9A-Fa-f]{1,4}:){5}' + _IPV6_TAIL
        + r'|(?:[0-9A-Fa-f]{1,4})?::(?:[0-9A-Fa-f]{1,4}:){4}' + _IPV6_TAIL
        + r'|(?:[0-9A-Fa-f]{1,4}:[0-9A-Fa-f]{1,4})?::(?:[0-9A-Fa-f]{1,4}:){3}' + _IPV6_TAIL
        + r'|(?:(?:[0-9A-Fa-f]{1,4}:){,2}[0-9A-Fa-f]{1,4})?::(?:[0-9A-Fa-f]{1,4}:){2}' + _IPV6_TAIL
        + r'|(?:(?:[0-9A-Fa-f]{1,4}:){,3}[0-9A-Fa-f]{1,4})?::[0-9A-Fa-f]{1,4}:' + _IPV6_TAIL
        + r'|(?:(?:[0-9A-Fa-f]{1,4}:){,4}[0-9A-Fa-f]{1,4})?::' + _IPV6_TAIL
        + r'|(?:(?:[0-9A-Fa-f]{1,4}:){,5}[0-9A-Fa-f]{1,4})?::[0-9A-Fa-f]{1,4}'
        + r'|(?:(?:[0-9A-Fa-f]{1,4}:){,6}[0-9A-Fa-f]{1,4})?::)\Z'
    ),
    'uri': r'^\w+:(\/?\/?)[^\s]+\Z',
}

FORMAT_REGEXS_DRAFT06 = dict(FORMAT_REGEXS_DRAFT04, **{
    'json-pointer': r'^(/(([^/~])|(~[01]))*)*\Z',
    'uri-reference': r'^(\w+:(\/?\/?))?[^#\\\s]*(#[^\\\s]*)?\Z',
    'uri-template': (
        r'^(?:(?:[^\x00-\x20\"\'<>%\\^`{|}]|%[0-9a-f]{2})|'
        r'\{[+#./;?&=,!@|]?(?:[a-z0-9_]|%[0-9a-f]{2})+'
        r'(?::[1-9][0-9]{0,3}|\*)?(?:,(?:[a-z0-9_]|%[0-9a-f]{2})+'
        r'(?::[1-9][0-9]{0,3}|\*)?)*\})*\Z'
    ),
})

FORMAT_REGEXS_DRAFT07 = dict(FORMAT_REGEXS_DRAFT06, **{
    'date': r'^(?P<year>\d{4})-(?P<month>(0[1-9]|1[0-2]))-(?P<day>(0[1-9]|[12]\d|3[01]))\Z',
    'iri': r'^\w+:(\/?\/?)[^\s]+\Z',
    'iri-reference': r'^(\w+:(\/?\/?))?[^#\\\s]*(#[^\\\s]*)?\Z',
    'idn-email': r'^[^@]+@[^@]+\.[^@]+\Z',
    'idn-hostname': r'^(?!-)(xn--)?[a-zA-Z0-9][a-zA-Z0-9-_]{0,61}[a-zA-Z0-9]{0,1}\.(?!-)(xn--)?([a-zA-Z0-9\-]{1,50}|[a-zA-Z0-9-]{1,30}\.[a-zA-Z]{2,})$',
    'relative-json-pointer': r'^(?:0|[1-9][0-9]*)(?:#|(?:\/(?:[^~/]|~0|~1)*)*)\Z',
    'time': (
        r'^(?P<hour>\d{1,2}):(?P<minute>\d{1,2})'
        r'(?::(?P<second>\d{1,2})(?:\.(?P<microsecond>\d{1,6}))?'
        r'([zZ]|[+-]\d\d:\d\d)?)?\Z'
    ),
})

FORMAT_REGEXS_DRAFT2019 = dict(FORMAT_REGEXS_DRAFT07, **{
    'uuid': r'^[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}\Z',
    'duration': (
        r'^P(?!$)'
        r'(?:'
        r'[0-9]+W'
        r'|(?:[0-9]+Y)?(?:[0-9]+M)?(?:[0-9]+D)?(?:T(?=[0-9])(?:[0-9]+H)?(?:[0-9]+M)?(?:[0-9]+S)?)?'
        r')\Z'
    ),
})

FORMAT_REGEXS_BY_DRAFT = {
    4: FORMAT_REGEXS_DRAFT04,
    6: FORMAT_REGEXS_DRAFT06,
    7: FORMAT_REGEXS_DRAFT07,
    2019: FORMAT_REGEXS_DRAFT2019,
}


def pick_draft(definition) -> int:
    """Draft dispatch by ``$schema`` substring (``__init__.py:366-378``)."""
    if isinstance(definition, dict):
        version = definition.get('$schema', '')
        if 'draft-04' in version:
            return 4
        if 'draft-06' in version:
            return 6
        if 'draft-07' in version:
            return 7
    return 2019

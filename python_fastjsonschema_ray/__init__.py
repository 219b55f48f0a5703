"""python_fastjsonschema_ray — Ray-Data-native schema + constraint validation engine.

A brand-new engine with the query/data-processing capabilities of
``horejsek/python-fastjsonschema`` (reference checkout at ``/root/reference``),
re-expressed Ray-Data-first: JSON-Schema-flavoured declarations compile once on
the driver into vectorized Arrow-level predicate closures that stream over
``ray.data.Dataset`` blocks via ``map_batches`` actor pools, emitting
reference-identical violation rows, plus engine-level table constraints
(uniqueness, referential integrity, column stats/sketches, distribution drift)
and training-data operators (dedup, similarity search, text analysis).
"""

from .exceptions import (
    JsonSchemaDefinitionException,
    JsonSchemaException,
    JsonSchemaValueException,
    JsonSchemaValuesException,
    SchemaDefinitionError,
    SchemaViolation,
    SchemaViolations,
)
from .functions.scalar import (  # noqa: A001 (API parity)
    compile,
    compile_to_code,
    validate,
)

VERSION = '0.1.0'
__version__ = VERSION

__all__ = [
    'VERSION',
    'JsonSchemaException',
    'JsonSchemaValueException',
    'JsonSchemaValuesException',
    'JsonSchemaDefinitionException',
    'SchemaViolation',
    'SchemaViolations',
    'SchemaDefinitionError',
    'compile',
    'compile_to_code',
    'validate',
]

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

def __getattr__(name):
    """Lazy re-exports of the Ray-side API (importing them eagerly would pull
    ray/pandas into every scalar-only use)."""
    if name in ('TableValidator', 'ValidatorStage', 'validate_dataset',
                'top_violation_examples'):
        from .pipelines import validate as _validate
        return getattr(_validate, name)
    if name in ('column_stats', 'check_unique', 'check_referential',
                'drift_check', 'dedup_exact', 'grouped_agg'):
        from .pipelines import constraints as _constraints
        return getattr(_constraints, name)
    if name in ('connected_components', 'connected_components_distributed'):
        from .stages import components as _components
        return getattr(_components, name)
    if name in ('broadcast_lookup_join', 'shuffle_join'):
        from .stages import join as _join
        return getattr(_join, name)
    if name == 'run_flagship':
        from .pipelines import flagship as _flagship
        return _flagship.run_flagship
    raise AttributeError(name)


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

from .table_schema import (  # noqa: F401
    field_to_struct_field,
    schema_to_struct,
    struct_to_schema,
)
from .manifest import write_manifest, read_manifest  # noqa: F401

from .inspect import (  # noqa: F401
    executed_plan,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_ids,
)

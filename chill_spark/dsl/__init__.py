from .compiler import (
    UnsupportedTemplate,
    arg_bindings,
    compile_fallback,
    compile_template,
    strptime_to_spark,
)
from .lookup import LookupPlan, apply_lookup, parse_lookup_template

__all__ = [
    "UnsupportedTemplate",
    "arg_bindings",
    "compile_fallback",
    "compile_template",
    "strptime_to_spark",
    "LookupPlan",
    "apply_lookup",
    "parse_lookup_template",
]

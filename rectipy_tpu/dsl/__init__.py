"""YAML model-definition DSL and its JAX lowering.

Replaces the reference's build-time PyRates dependency (SURVEY.md §2.8): the
same operator/node template format is parsed here and lowered symbolically
(never unrolling N node copies) into pure, jittable vector fields.
"""

from .expr import ExprError, evaluate, free_symbols, parse, split_equation, substitute
from .parser import (
    CircuitTemplate,
    NodeTemplate,
    OperatorTemplate,
    TemplateError,
    VarSpec,
    clear_frontend_caches,
    load_template,
)
from .lower import VectorField, lower

__all__ = [
    "CircuitTemplate",
    "ExprError",
    "NodeTemplate",
    "OperatorTemplate",
    "TemplateError",
    "VarSpec",
    "VectorField",
    "clear_frontend_caches",
    "evaluate",
    "free_symbols",
    "load_template",
    "lower",
    "parse",
    "split_equation",
    "substitute",
]

"""Equation-string -> JAX expression compiler.

This is the lowest layer of the DSL that replaces the reference's build-time
dependency on PyRates' sympy->torch code generation (see
``/root/reference/rectipy/nodes.py:233-262``).  Equations are authored as plain
strings in YAML templates, e.g. ``"v' = (v^2 + eta + I_ext)/tau + k*s_in"``.

We tokenize, parse (Pratt parser), and evaluate the AST against an environment
of JAX arrays.  The AST is a plain tuple tree, so it is hashable/serializable
and evaluation happens only at trace time -- the resulting jaxpr contains no
Python overhead.

Supported grammar
-----------------
- binary operators ``+ - * / ^`` (``^`` is exponentiation, as in PyRates)
- unary minus
- parentheses
- function calls with one or more arguments (see ``FUNCTIONS``)
- identifiers (variables/parameters) and numeric literals

Reductions such as ``mean(v)`` reduce over the neuron axis and broadcast back,
which is how the reference's mean-field templates behave
(``/root/reference/neuron_model_templates/spiking_neurons/ik.yaml``, iku_op).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Ast = Tuple  # ('num', float) | ('var', str) | ('neg', ast) | ('bin', op, l, r) | ('call', name, [asts])

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)"
    r"|(?P<name>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op>\*\*|[-+*/^(),])"
    r")"
)


class ExprError(ValueError):
    """Raised on malformed equation strings."""


def tokenize(s: str) -> List[Tuple[str, str]]:
    tokens = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None:
            if s[pos:].strip() == "":
                break
            raise ExprError(f"Cannot tokenize {s!r} at position {pos}: {s[pos:]!r}")
        pos = m.end()
        if m.lastgroup == "num":
            tokens.append(("num", m.group("num")))
        elif m.lastgroup == "name":
            tokens.append(("name", m.group("name")))
        else:
            op = m.group("op")
            tokens.append(("op", "^" if op == "**" else op))
    tokens.append(("end", ""))
    return tokens


# precedence for binary operators; ^ binds tightest and is right-associative
_BIN_PREC = {"+": 10, "-": 10, "*": 20, "/": 20, "^": 30}
_RIGHT_ASSOC = {"^"}


class _Parser:
    def __init__(self, tokens: List[Tuple[str, str]], src: str):
        self.tokens = tokens
        self.i = 0
        self.src = src

    def peek(self) -> Tuple[str, str]:
        return self.tokens[self.i]

    def next(self) -> Tuple[str, str]:
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def expect_op(self, op: str):
        kind, val = self.next()
        if kind != "op" or val != op:
            raise ExprError(f"Expected {op!r} in {self.src!r}, got {val!r}")

    def parse_expr(self, min_prec: int = 0) -> Ast:
        left = self.parse_unary()
        while True:
            kind, val = self.peek()
            if kind != "op" or val not in _BIN_PREC:
                break
            prec = _BIN_PREC[val]
            if prec < min_prec:
                break
            self.next()
            next_min = prec if val in _RIGHT_ASSOC else prec + 1
            right = self.parse_expr(next_min)
            left = ("bin", val, left, right)
        return left

    def parse_unary(self) -> Ast:
        kind, val = self.peek()
        if kind == "op" and val == "-":
            self.next()
            # unary minus binds looser than ^ : -x^2 == -(x^2)
            return ("neg", self.parse_expr(_BIN_PREC["^"]))
        if kind == "op" and val == "+":
            self.next()
            return self.parse_expr(_BIN_PREC["^"])
        return self.parse_atom()

    def parse_atom(self) -> Ast:
        kind, val = self.next()
        if kind == "num":
            return ("num", float(val))
        if kind == "name":
            nkind, nval = self.peek()
            if nkind == "op" and nval == "(":
                self.next()
                args = [self.parse_expr()]
                while True:
                    akind, aval = self.peek()
                    if akind == "op" and aval == ",":
                        self.next()
                        args.append(self.parse_expr())
                    else:
                        break
                self.expect_op(")")
                return ("call", val, args)
            return ("var", val)
        if kind == "op" and val == "(":
            inner = self.parse_expr()
            self.expect_op(")")
            return inner
        raise ExprError(f"Unexpected token {val!r} in {self.src!r}")


def parse(expr: str) -> Ast:
    """Parse an equation right-hand side into an AST."""
    p = _Parser(tokenize(expr), expr)
    ast = p.parse_expr()
    kind, val = p.peek()
    if kind != "end":
        raise ExprError(f"Trailing tokens in {expr!r}: {val!r}")
    return ast


def free_symbols(ast: Ast) -> set:
    """All identifiers referenced by the expression (excluding function names)."""
    out = set()

    def rec(node):
        tag = node[0]
        if tag == "var":
            out.add(node[1])
        elif tag == "neg":
            rec(node[1])
        elif tag == "bin":
            rec(node[2])
            rec(node[3])
        elif tag == "call":
            for a in node[2]:
                rec(a)

    rec(ast)
    return out


def _mean(x):
    # population mean, broadcast back to the neuron axis (PyRates `mean()` semantics)
    return jnp.mean(x)


def _interp(x, xp, fp):
    return jnp.interp(x, xp, fp)


def _exprel(x):
    """(exp(x) - 1) / x with the removable singularity at 0 filled in.

    Used by conductance-based gate kinetics (Hodgkin-Huxley style
    ``alpha_m = c / exprel(-(v - v0)/s)`` rational forms), where the naive
    expression 0/0-NaNs whenever a membrane potential lands exactly on the
    singular voltage.  The double-``where`` keeps the gradient NaN-free too
    (the masked-out branch never sees the singular input)."""
    safe = jnp.where(jnp.abs(x) < 1e-5, 1.0, x)
    return jnp.where(jnp.abs(x) < 1e-5, 1.0 + x * 0.5, jnp.expm1(safe) / safe)


FUNCTIONS: Dict[str, Callable] = {
    "exp": jnp.exp,
    "log": jnp.log,
    "log10": jnp.log10,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    "sinh": jnp.sinh,
    "cosh": jnp.cosh,
    "tanh": jnp.tanh,
    "arcsin": jnp.arcsin,
    "arccos": jnp.arccos,
    "arctan": jnp.arctan,
    "sqrt": jnp.sqrt,
    "abs": jnp.abs,
    "absv": jnp.abs,
    "sign": jnp.sign,
    "mean": _mean,
    "sum": jnp.sum,
    "min": jnp.min,
    "max": jnp.max,
    "maxi": jnp.maximum,
    "mini": jnp.minimum,
    "maximum": jnp.maximum,
    "minimum": jnp.minimum,
    "sigmoid": jax.nn.sigmoid,
    "softmax": jax.nn.softmax,
    "heaviside": lambda x: jnp.heaviside(x, jnp.asarray(0.0, dtype=jnp.result_type(x))),
    "round": jnp.round,
    "floor": jnp.floor,
    "ceil": jnp.ceil,
    "interp": _interp,
    "expm1": jnp.expm1,
    "exprel": _exprel,
    "power": jnp.power,
    "pow": jnp.power,
}


def _pow(base, exponent):
    # integer powers lower to repeated multiplies (cheaper on the VPU than
    # transcendental pow); everything else uses jnp.power.
    if isinstance(exponent, (int, float)) and float(exponent).is_integer() and 0 < exponent <= 4:
        out = base
        for _ in range(int(exponent) - 1):
            out = out * base
        return out
    return jnp.power(base, exponent)


# named mathematical constants usable in equations without declaration
CONSTANTS: Dict[str, float] = {"pi": float(np.pi), "PI": float(np.pi)}


def evaluate(ast: Ast, env: Dict[str, jnp.ndarray]):
    """Evaluate an AST against ``env`` (name -> array/scalar).

    Called at trace time only; the emitted jaxpr is pure array ops.
    """
    tag = ast[0]
    if tag == "num":
        return ast[1]
    if tag == "var":
        try:
            return env[ast[1]]
        except KeyError:
            if ast[1] in CONSTANTS:
                return CONSTANTS[ast[1]]
            raise KeyError(f"Unknown symbol {ast[1]!r}; available: {sorted(env)}")
    if tag == "neg":
        return -evaluate(ast[1], env)
    if tag == "bin":
        op, l, r = ast[1], ast[2], ast[3]
        lv = evaluate(l, env)
        if op == "^":
            rv = r[1] if r[0] == "num" else evaluate(r, env)
            return _pow(lv, rv)
        rv = evaluate(r, env)
        if op == "+":
            return lv + rv
        if op == "-":
            return lv - rv
        if op == "*":
            return lv * rv
        if op == "/":
            return lv / rv
        raise ExprError(f"Unknown operator {op}")
    if tag == "call":
        name, args = ast[1], ast[2]
        try:
            fn = FUNCTIONS[name]
        except KeyError:
            raise ExprError(f"Unknown function {name!r}; available: {sorted(FUNCTIONS)}")
        return fn(*[evaluate(a, env) for a in args])
    raise ExprError(f"Malformed AST node {ast!r}")


def split_equation(eq: str) -> Tuple[str, bool, Ast]:
    """Split ``"lhs = rhs"`` -> (lhs_var, is_ode, rhs_ast).

    ``lhs'`` (trailing apostrophe, or ``d/dt * lhs`` style) marks an ODE.
    """
    if "=" not in eq:
        raise ExprError(f"Equation without '=': {eq!r}")
    lhs, rhs = eq.split("=", 1)
    lhs = lhs.strip()
    is_ode = False
    if lhs.endswith("'"):
        is_ode = True
        lhs = lhs[:-1].strip()
    m = re.fullmatch(r"d/dt\s*\*?\s*([A-Za-z_][A-Za-z_0-9]*)", lhs)
    if m:
        is_ode = True
        lhs = m.group(1)
    if not re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*", lhs):
        raise ExprError(f"Invalid equation LHS {lhs!r} in {eq!r}")
    return lhs, is_ode, parse(rhs.strip())


def substitute(eq: str, old: str, new: str) -> str:
    """Textual ``replace:`` semantics used by template inheritance.

    Identifier patterns are replaced with word-boundary awareness (so
    ``eta -> eta - x`` does not clobber ``beta``/``theta``); replacements are
    parenthesized to preserve operator precedence.  Multi-token patterns fall
    back to literal substring replacement, matching the reference templates'
    usage (e.g. ``k*r_in -> k*s_in``).
    """
    wrapped = f"({new.strip()})"
    if re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*", old.strip()):
        return re.sub(rf"\b{re.escape(old.strip())}\b", lambda _: wrapped, eq)
    return eq.replace(old, wrapped)

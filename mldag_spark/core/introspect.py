"""Introspection helpers: input-slot extraction from signatures and
output-name resolution from declarations / docstrings / annotations.

Behavior parity (reference: ``/root/reference/mldag/utils.py``):
output names of a callable are resolved through a 4-level precedence
chain (``utils.py:338-359``):

1. explicit ``@returns([...])`` decoration (attribute set by the
   decorator — ``utils.py:283-310``)
2. a numpydoc-style ``Returns`` docstring section (``utils.py:187-216``);
   we parse it with a small regex instead of requiring numpydoc
3. a literal tuple/list/dict/str **return annotation**, e.g.
   ``def f(x) -> ('a', 'b')`` (``utils.py:142-184``)
4. fallback: a single output named ``'result'`` (``utils.py:33,333-335``)
"""

from __future__ import annotations

import inspect
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

RESULT_SLOT = "result"

_RETURNS_ATTR = "_mldag_returns"

# matches a numpydoc "Returns" header followed by underline
_RETURNS_SECTION_RE = re.compile(
    r"^\s*Returns\s*\n\s*-{3,}\s*\n(?P<body>.*?)(?:\n\s*\n|\n\s*\w[\w ]*\n\s*-{3,}|\Z)",
    re.DOTALL | re.MULTILINE,
)
_RETURNS_LINE_RE = re.compile(r"^\s*(?P<name>[A-Za-z_]\w*)\s*(?::\s*(?P<type>.*))?$")


@dataclass
class InputSlot:
    """One named input port of a node.

    ``kind`` is an :mod:`inspect` parameter kind; variadic slots
    (``*args`` / ``**kwargs``) accumulate multiple incoming wires.
    """

    name: str
    kind: inspect._ParameterKind = inspect.Parameter.POSITIONAL_OR_KEYWORD
    default: Any = inspect.Parameter.empty
    annotation: Any = inspect.Parameter.empty
    description: str = ""

    @property
    def required(self) -> bool:
        return (
            self.default is inspect.Parameter.empty
            and self.kind
            not in (inspect.Parameter.VAR_POSITIONAL, inspect.Parameter.VAR_KEYWORD)
        )

    @property
    def is_variadic(self) -> bool:
        return self.kind in (
            inspect.Parameter.VAR_POSITIONAL,
            inspect.Parameter.VAR_KEYWORD,
        )

    def to_parameter(self) -> inspect.Parameter:
        return inspect.Parameter(
            self.name, self.kind, default=self.default, annotation=self.annotation
        )


@dataclass
class OutputSlot:
    name: str
    annotation: Any = inspect.Parameter.empty
    description: str = ""


def returns(names):
    """Decorator declaring the named outputs of a node function.

    Usage::

        @returns(['model', 'stats'])
        def train(df): ...

    Accepts a list/tuple of names or a single string.
    """
    if isinstance(names, str):
        names = [names]
    names = list(names)
    for n in names:
        if not isinstance(n, str) or not n.isidentifier():
            raise ValueError(f"output name must be an identifier, got {n!r}")

    def deco(func):
        setattr(func, _RETURNS_ATTR, names)
        return func

    return deco


def set_function_return(func: Callable, names) -> Callable:
    """Imperative form of :func:`returns`."""
    return returns(names)(func)


def get_input_slots(func: Callable, skip_first: bool = False) -> list[InputSlot]:
    """Input slots of a callable = its parameter list (minus ``self``)."""
    try:
        sig = inspect.signature(func)
    except (TypeError, ValueError):
        return [InputSlot(name="x")]
    params = list(sig.parameters.values())
    if skip_first and params:
        params = params[1:]
    slots = []
    for p in params:
        if p.name == "self":
            continue
        slots.append(
            InputSlot(
                name=p.name, kind=p.kind, default=p.default, annotation=p.annotation
            )
        )
    return slots


def _outputs_from_docstring(doc: Optional[str]) -> Optional[list[str]]:
    if not doc:
        return None
    m = _RETURNS_SECTION_RE.search(doc)
    if not m:
        return None
    names = []
    for line in m.group("body").splitlines():
        if not line.strip():
            continue
        # continuation/description lines are indented deeper than the
        # name lines; accept only `name : type` shaped lines
        lm = _RETURNS_LINE_RE.match(line)
        if lm and not line.startswith((" " * 8, "\t")):
            names.append(lm.group("name"))
    return names or None


def _outputs_from_annotation(func: Callable) -> Optional[list[str]]:
    try:
        ann = inspect.signature(func).return_annotation
    except (TypeError, ValueError):
        return None
    if ann is inspect.Signature.empty:
        return None
    if isinstance(ann, str) and ann.isidentifier():
        return [ann]
    if isinstance(ann, (tuple, list)) and all(
        isinstance(a, str) and a.isidentifier() for a in ann
    ):
        return list(ann)
    if isinstance(ann, dict) and all(
        isinstance(k, str) and k.isidentifier() for k in ann
    ):
        return list(ann.keys())
    return None


def get_output_slots(func: Callable) -> list[OutputSlot]:
    """Resolve output names via the 4-level precedence chain."""
    declared = getattr(func, _RETURNS_ATTR, None)
    if declared is None:
        # decorated bound methods keep the attribute on __func__
        declared = getattr(getattr(func, "__func__", None), _RETURNS_ATTR, None)
    names = (
        declared
        or _outputs_from_docstring(inspect.getdoc(func))
        or _outputs_from_annotation(func)
        or [RESULT_SLOT]
    )
    return [OutputSlot(name=n) for n in names]

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
_RETURNS_META_ATTR = "_mldag_returns_meta"

_ENTRY_LINE_RE = re.compile(r"^(?P<name>[A-Za-z_]\w*)\s*(?::\s*(?P<type>.*\S))?\s*$")


def parse_numpydoc_sections(doc: Optional[str]) -> dict[str, list[tuple[str, Optional[str]]]]:
    """``{section: [(name, type-or-None), ...]}`` for every underlined
    numpydoc section (``Parameters``, ``Returns``, ...).

    A full line-based parse, not a regex over the body: entry bodies may
    contain blank lines between items (the reference's own docstrings
    do — ``/root/reference/tests/test_mldag_doc.py:20-27``), so a parse
    that stops at the first blank line silently drops every entry after
    it. Entries are the non-indented ``name [: type]`` lines of a
    section; deeper-indented lines are descriptions and are skipped.
    """
    if not doc:
        return {}
    lines = inspect.cleandoc(doc).splitlines()
    # header positions: a text line followed by a dashes-only underline
    headers = [
        i
        for i in range(len(lines) - 1)
        if lines[i].strip()
        and not lines[i].startswith((" ", "\t"))
        and len(lines[i + 1].strip()) >= 3
        and set(lines[i + 1].strip()) == {"-"}
    ]
    sections: dict[str, list[tuple[str, Optional[str]]]] = {}
    for pos, start in enumerate(headers):
        end = headers[pos + 1] if pos + 1 < len(headers) else len(lines)
        entries = []
        for line in lines[start + 2 : end]:
            if not line.strip() or line.startswith((" ", "\t")):
                continue
            m = _ENTRY_LINE_RE.match(line)
            if m:
                entries.append((m.group("name"), m.group("type")))
        sections[lines[start].strip()] = entries
    return sections


def docstring_param_types(doc: Optional[str]) -> dict[str, str]:
    """``{param: type}`` from a numpydoc Parameters section (typed
    entries only)."""
    return {
        n: t
        for n, t in parse_numpydoc_sections(doc).get("Parameters", [])
        if t
    }


def docstring_output_types(doc: Optional[str]) -> dict[str, str]:
    """``{output: type}`` from a numpydoc Returns section."""
    return {
        n: t
        for n, t in parse_numpydoc_sections(doc).get("Returns", [])
        if t
    }


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
        @returns([('model', 'Model'), ('stats', 'dict', 'fit stats')])
        def train(df): ...

    Accepts a single name, a list of names, or a list of
    ``(name[, type[, description]])`` tuples (reference contract:
    ``/root/reference/tests/test_mldag_doc.py:96,216`` decorate with
    typed tuples).
    """
    if isinstance(names, str):
        names = [names]
    meta: list[tuple[str, Optional[str], Optional[str]]] = []
    for item in names:
        if isinstance(item, str):
            item = (item,)
        if not isinstance(item, (tuple, list)) or not item:
            raise ValueError(f"output must be a name or tuple, got {item!r}")
        padded = (tuple(item) + (None, None))[:3]
        name, type_, desc = padded
        if not isinstance(name, str) or not name.isidentifier():
            raise ValueError(f"output name must be an identifier, got {name!r}")
        meta.append((name, type_, desc))

    def deco(func):
        setattr(func, _RETURNS_ATTR, [m[0] for m in meta])
        setattr(func, _RETURNS_META_ATTR, meta)
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
    names = [n for n, _ in parse_numpydoc_sections(doc).get("Returns", [])]
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
    """Resolve output names via the 4-level precedence chain; display
    types (``OutputSlot.annotation``) come from the typed ``@returns``
    tuples or, failing that, the docstring Returns section — the same
    sources the reference's doc synthesis reads."""
    target = func if hasattr(func, _RETURNS_ATTR) else getattr(
        func, "__func__", func
    )  # decorated bound methods keep the attribute on __func__
    declared = getattr(target, _RETURNS_ATTR, None)
    meta = getattr(target, _RETURNS_META_ATTR, None)
    doc_types = docstring_output_types(inspect.getdoc(func))
    names = (
        declared
        or _outputs_from_docstring(inspect.getdoc(func))
        or _outputs_from_annotation(func)
        or [RESULT_SLOT]
    )
    types = {m[0]: m[1] for m in meta or [] if m[1]}
    descriptions = {m[0]: m[2] for m in meta or [] if m[2]}
    return [
        OutputSlot(
            name=n,
            annotation=types.get(n) or doc_types.get(n) or inspect.Parameter.empty,
            description=descriptions.get(n, ""),
        )
        for n in names
    ]

"""Named display styles loaded from package YAML resources.

Behavior parity with the reference's style module
(``/root/reference/mldag/style/__init__.py:1-25``): ``available`` lists
the package's ``*.yml`` resources, ``get(name)`` parses the file's
``style:`` mapping, ``use(name)`` switches the process-wide active
style, ``current()`` returns it, and the default style is activated at
import. The attribute vocabulary inside each file is this engine's own
(graphviz attr groups per element kind — see ``display.py``), not the
reference's; only the loading contract is mirrored.

PyYAML ships with PySpark, but the loader still degrades gracefully:
if ``yaml`` is unavailable the built-in palettes in ``display.STYLES``
serve as the source of truth and the same API keeps working.
"""

from __future__ import annotations

from importlib import resources

__all__ = ["get", "use", "current", "available", "DEFAULT_STYLE"]

DEFAULT_STYLE = "default"
_ACTIVE: dict | None = None
_ACTIVE_NAME: str | None = None

try:
    import yaml as _yaml
except ImportError:  # pragma: no cover - pyyaml ships with pyspark
    _yaml = None


def _resource_names() -> list[str]:
    try:
        return sorted(
            r.name[: -len(".yml")]
            for r in resources.files(__name__).iterdir()
            if r.name.endswith(".yml") and not r.name.startswith("_")
        )
    except (FileNotFoundError, NotADirectoryError):  # zipped/frozen edge
        return []


available = _resource_names()


def get(name: str) -> dict:
    """Style dict by name, parsed from the package's ``<name>.yml``
    (falls back to the embedded palettes without pyyaml)."""
    if _yaml is not None and name in available:
        text = (resources.files(__name__) / f"{name}.yml").read_text()
        return _yaml.safe_load(text)["style"]
    from mldag_spark.display import STYLES

    return STYLES[name]


def use(name: str) -> None:
    """Switch the process-wide active style."""
    global _ACTIVE, _ACTIVE_NAME
    _ACTIVE = get(name)
    _ACTIVE_NAME = name


def current() -> dict:
    return _ACTIVE


def current_name() -> str:
    return _ACTIVE_NAME


use(DEFAULT_STYLE)

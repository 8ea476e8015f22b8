"""Exception hierarchy for mldag_spark.

Parity note: the reference has a single ``MldagException``
(``/root/reference/mldag/exceptions.py:1-3``); we keep one root error
class plus a couple of more precise subclasses used by validation.
"""


class MLDagError(Exception):
    """Root error for every failure raised by the engine."""


class GraphError(MLDagError):
    """Structural graph violation (cross-graph edge, unknown vertex, ...)."""


class SlotError(MLDagError):
    """Unknown / ambiguous / duplicate slot wiring."""


class NodeExecutionError(MLDagError):
    """A node's fit/transform raised; original exception is ``__cause__``.

    Mirrors the reference behavior of wrapping node failures as
    ``MldagException('Error occurred during <node>')`` with the original
    as the cause (``/root/reference/mldag/mldag.py:382-383``).
    """

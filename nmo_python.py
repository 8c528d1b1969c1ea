"""Drop-in shim for the reference's ``nmo_python`` bindings.

Scripts written against the reference's Python package
(``/root/reference/nemo-python/src/lib.rs``) import ``nmo_python``; this
module re-exports the Spark-backed implementations so those scripts run
unchanged. See :mod:`nemo_spark.python_api` for parity notes.
"""

from nemo_spark.python_api import (
    NemoEngine,
    NemoError,
    NemoFact,
    NemoLiteral,
    NemoMap,
    NemoOutputManager,
    NemoProgram,
    NemoResults,
    NemoTiming,
    NemoTrace,
    NemoTuple,
    load_file,
    load_string,
)

__all__ = [
    "NemoEngine",
    "NemoError",
    "NemoFact",
    "NemoLiteral",
    "NemoMap",
    "NemoOutputManager",
    "NemoProgram",
    "NemoResults",
    "NemoTiming",
    "NemoTrace",
    "NemoTuple",
    "load_file",
    "load_string",
]

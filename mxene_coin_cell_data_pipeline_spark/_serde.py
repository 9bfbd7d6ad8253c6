"""Worker-side serialization helper.

Modules that define Python-UDF kernels (applyInPandas / mapInPandas)
must be pickled BY VALUE: cloudpickle's default by-reference pickling
would require every executor's Python worker to have this package on
its ``sys.path``, which is not true when the driving process runs from
another directory (or on a real cluster without shipping the package
as a zip). Registering the module with cloudpickle makes the kernel
closures self-contained.
"""

from __future__ import annotations

from types import ModuleType


def register_self(module: ModuleType) -> None:
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(module)
    except Exception:  # pragma: no cover - older pyspark fallback
        pass

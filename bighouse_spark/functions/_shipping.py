"""Ship UDF module code by value inside pickled closures.

Executor Python workers inherit the driver's cwd and environment, not
its runtime ``sys.path`` mutations. The driver contract
(``__spark_entry__``) and any embedding host import this package via a
path insert, so a worker spawned outside the repo directory cannot
``import bighouse_spark`` — and cloudpickle serializes functions from
importable modules BY REFERENCE, making every executor-side closure
that touches a module-level helper die with ModuleNotFoundError there.

``register_pickle_by_value`` flips that: the module's code travels
inside the pickle, so workers never import the package. Each module
that defines executor-side closures (pandas_udf / mapInPandas /
applyInPandasWithState bodies) calls ``ship_by_value(sys.modules[
__name__])`` after its definitions. Driver-only modules don't need it.
"""

from __future__ import annotations


def ship_by_value(module) -> None:
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(module)
    except Exception:
        # Best effort: without it, UDFs still work wherever the worker
        # can import the package (installed, PYTHONPATH, or repo cwd).
        pass

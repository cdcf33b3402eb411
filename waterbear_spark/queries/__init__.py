"""Query catalog package.

``QUERIES`` / ``ORACLE_SQL`` resolve lazily (PEP 562): eagerly importing
the full catalog here would make every ``queries.X`` submodule import
pull in every query module — and since catalog modules import streaming
operators, that closes an import cycle when a Spark worker re-imports
``waterbear_spark.streaming`` while unpickling a stateful function.
"""


def __getattr__(name):
    if name in ("QUERIES", "ORACLE_SQL"):
        from waterbear_spark.queries import catalog

        return getattr(catalog, name)
    raise AttributeError(name)


__all__ = ["QUERIES", "ORACLE_SQL"]

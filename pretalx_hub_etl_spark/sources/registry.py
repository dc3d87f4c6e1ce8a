"""Session-local Python DataSource registration that actually lands.

Spark 4.1 asymmetry (root cause of the r17 plan-sweep failure): the
pre-registration existence probe (``DataSourceRegistration.
checkDataSourceExists``) falls through to the GLOBAL
``DataSource.lookupDataSource`` when the name is absent from this
session's ``DataSourceManager`` — so a source registered on a SIBLING
or parent session vetoes this session's registration with
DATA_SOURCE_ALREADY_EXISTS — while analysis-time resolution
(``ResolveDataSource``) consults ONLY this session's manager.
Swallowing the exception and assuming "inherited" therefore leaves the
session unable to resolve the source at all (``newSession`` starts a
FRESH manager; nothing is inherited).

``ensure_registered`` closes the gap: if the name is not visible on
this session's manager, it registers the serialized source DIRECTLY
into the manager (``DataSourceManager.registerDataSource`` replaces
silently and performs no global probe), exactly what pyspark's own
``DataSourceRegistration.register`` does minus the broken probe.
"""

from __future__ import annotations


def ensure_registered(spark, ds_class) -> None:
    """Idempotently make ``ds_class`` resolvable on ``spark``.

    Cheap when already visible (one py4j existence check). Safe to call
    from any session — parent, ``newSession`` child, or the engine's
    ``fixture_session`` — regardless of what other sessions registered.
    """
    name = ds_class.name()
    mgr = spark._jsparkSession.sessionState().dataSourceManager()
    if mgr.dataSourceExists(name):
        return
    from pyspark.sql.udf import _wrap_function

    sc = spark.sparkContext
    wrapped = _wrap_function(sc, ds_class)
    jds = getattr(
        sc._jvm,
        "org.apache.spark.sql.execution.datasources.v2.python."
        "UserDefinedPythonDataSource",
    )(wrapped)
    mgr.registerDataSource(name, jds)

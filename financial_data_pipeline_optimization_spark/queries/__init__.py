"""Query registry package.

The original single-file ``queries.py`` split by domain behind the same
``registry()``. REGISTRATION ORDER IS LOAD-BEARING for the driver's
rotation window: modules are imported below in the exact order their
sections appeared in the original file, and each module keeps its
sections' original internal order — so pre-split names keep their
original relative registry order (new queries may be added anywhere in
their domain module; fresh names sort first in the rotation regardless
of position). The ``vector_checks``/``media`` split-outs preserve this
by exporting un-registered ``SPECS`` that ``warehouse.py`` appends at
the original positions.
"""

from __future__ import annotations

from financial_data_pipeline_optimization_spark.queries._registry import (  # noqa: F401
    QuerySpec,
    _CHANGED_SINCE_CHECK,
    _REGISTRY,
    _driver_check_history,
    _r2,
    _r4,
    _register,
    _t,
    registry,
)

# Import order = registration order. Do not reorder.
from financial_data_pipeline_optimization_spark.queries import (  # noqa: E402,F401
    core,
    documents,
    breadth,
    finance,
    tpch,
    curation,
    tpch_ext,
    warehouse,
    linkage,
    analytics,
    curation_ml,
    statsfit,
    governance,
    monitoring,
    media,
    vector_checks,
    ranking,
)

# Back-compat: every name that was reachable as ``queries.<name>`` on
# the single file stays reachable on the package (tests, bench and the
# driver entry address query callables and oracle helpers this way).
for _m in (core, documents, breadth, finance, tpch, curation, tpch_ext, warehouse, linkage, analytics, curation_ml, statsfit, governance, monitoring, media, vector_checks, ranking):
    for _k, _v in vars(_m).items():
        if _k.startswith(("q_", "_")) and not _k.startswith("__"):
            globals().setdefault(_k, _v)
del _m, _k, _v

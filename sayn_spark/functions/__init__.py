"""Query/operator function library.

Modules register named queries into REGISTRY; ``__spark_entry__``
exposes them to the driver.  Each entry pairs a Spark DataFrame
implementation with (where SQL-expressible) a DuckDB oracle string.
"""

from sayn_spark.functions.registry import (  # noqa: F401
    REGISTRY,
    Query,
    persist_tracked,
    register,
    release_persisted,
)

# import for registration side effects
from sayn_spark.functions import relational  # noqa: F401,E402
from sayn_spark.functions import events  # noqa: F401,E402
from sayn_spark.functions import engine_queries  # noqa: F401,E402
from sayn_spark.functions import dedup  # noqa: F401,E402
from sayn_spark.functions import similarity  # noqa: F401,E402
from sayn_spark.functions import text  # noqa: F401,E402
from sayn_spark.functions import multimodal  # noqa: F401,E402
from sayn_spark.functions import sampling  # noqa: F401,E402
from sayn_spark.functions import components  # noqa: F401,E402
from sayn_spark.functions import content_filter  # noqa: F401,E402
from sayn_spark.functions import scale  # noqa: F401,E402
from sayn_spark.functions import linkage  # noqa: F401,E402

from .registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    SUBSUMED,
    lookup,
    query_names,
    register,
)

# importing the plan modules populates the registry; batteries LAST — it
# consolidates constituents into driver-facing tagged-union queries
from . import relational  # noqa: F401,E402
from . import etl  # noqa: F401,E402
from . import llm_data  # noqa: F401,E402
from . import scalars  # noqa: F401,E402
from . import udf_surface  # noqa: F401,E402
from . import streaming_queries  # noqa: F401,E402
from . import timeseries_queries  # noqa: F401,E402
from . import sql_surface  # noqa: F401,E402
from . import batteries  # noqa: F401,E402
from .batteries import SHARDED_BATTERIES, resolve_battery_part  # noqa: F401,E402

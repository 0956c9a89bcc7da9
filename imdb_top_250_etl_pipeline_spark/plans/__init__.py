from .registry import QUERIES, ORACLES, register, query_names  # noqa: F401

# importing the plan modules populates the registry
from . import relational  # noqa: F401,E402
from . import etl  # noqa: F401,E402
from . import llm_data  # noqa: F401,E402
from . import scalars  # noqa: F401,E402
from . import udf_surface  # noqa: F401,E402
from . import streaming_queries  # noqa: F401,E402
from . import sql_surface  # noqa: F401,E402

from .registry import QUERIES, Query, get_queries, get_oracles

# Importing the query modules populates the registry.
from . import analytics_queries  # noqa: F401,E402
from . import core_queries  # noqa: F401,E402
from . import curation_queries  # noqa: F401,E402
from . import sequence_queries  # noqa: F401,E402
from . import temporal_queries  # noqa: F401,E402
from . import text_queries  # noqa: F401,E402
from . import vector_queries  # noqa: F401,E402

__all__ = ["QUERIES", "Query", "get_queries", "get_oracles"]

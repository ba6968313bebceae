"""Query plans: the registry binding each implemented operator to
(a) a Spark DataFrame builder and (b) a DuckDB oracle SQL string."""

from .registry import QUERIES, QuerySpec, oracle_sql_map, queries_map
from . import registry_data  # noqa: F401 — registers documents/embeddings queries
from . import registry_ext  # noqa: F401 — outer joins, rollups, CEP extras, multimodal
from . import registry_dml  # noqa: F401 — stream-driven table DML merge forms

__all__ = ["QUERIES", "QuerySpec", "queries_map", "oracle_sql_map"]

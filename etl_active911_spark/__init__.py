"""PySpark-native analytics engine with the query/data-processing surface of
``dfpc-coe/etl-active911`` (reference: /root/reference, survey: SURVEY.md).

Everything is built on the public Apache Spark DataFrame/SQL/Structured
Streaming APIs; Catalyst + Tungsten do the physical planning. Custom code is
limited to:

- a Python DataSource for the windowed-HTTP Active911 ingestion (offline-able),
- canonicalization helpers (stable aliases / casts for oracle parity),
- LSH banding + Arrow-vectorized numerics for the near-dup / similarity
  extension operators.
"""

__version__ = "0.1.0"

from etl_active911_spark.session import get_spark  # noqa: F401
from etl_active911_spark.io import load_tables, register_views  # noqa: F401

"""Query catalog: every operator from SURVEY.md §2 as a named query.

Importing this package populates the registry; ``__spark_entry__.py``
re-exports it for the driver's correctness harness.
"""

from automated_data_pipeline_python_spark.queries.catalog import (  # noqa: F401
    QUERIES,
    Query,
    oracle_sql,
    queries,
    register,
)

# Import for registration side effects.
from automated_data_pipeline_python_spark.queries import (  # noqa: F401,E402
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    tpch2,
    modern_sql,
    curation,
    clustering,
    dq,
    sketches,
    windows2,
    text,
    dedup,
    similarity,
    events,
    multimodal,
)

"""Import every operator module so its @query registrations land.

``__spark_entry__.py`` and the local verify harness both import this
module; anything not imported here is invisible to the driver.
"""

from .functions import scalar, udfs  # noqa: F401
from .operators import (  # noqa: F401
    aggregates,
    analytics,
    cdc,
    fs,
    joins,
    layout,
    llm_dedup,
    llm_knn,
    llm_retrieval,
    llm_text,
    multimodal,
    relational,
    relational_ext,
    setops,
    sqlsurface,
    staged_r6,
    timeseries,
    windows,
)
from .sources import avro, deltalog, fed, iceberg, pyds, roundtrip, snapshots  # noqa: F401
from .streaming import ops as streaming_ops  # noqa: F401

#: key of the flagship query used by ``entry(spark)``.
FLAGSHIP = "q1_pricing_summary"

"""Import every operator module so its @query registrations land.

``__spark_entry__.py`` and the local verify harness both import this
module; anything not imported here is invisible to the driver.
"""

from .functions import scalar  # noqa: F401
from .operators import aggregates, fs, joins, relational, setops, windows  # noqa: F401
from .sources import roundtrip  # noqa: F401

#: key of the flagship query used by ``entry(spark)``.
FLAGSHIP = "q1_pricing_summary"

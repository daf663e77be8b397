"""Optional-dependency shims.

`transformWithStateInPandas` (Spark 4.x arbitrary state) runs a Python
state client that speaks protobuf to the JVM state server — without
``google.protobuf`` the Python worker dies on import of
``pyspark.sql.streaming.proto.StateMessage_pb2``. Some sandboxes have
no pip but DO carry a protobuf runtime vendored inside other public
tooling already on disk; :func:`ensure_protobuf` makes that runtime
importable for both the driver and the forked Python workers.

Must run BEFORE the SparkSession (and hence the JVM + worker daemon)
starts, so the env vars propagate to worker processes.
"""

from __future__ import annotations

import os
import sys

#: directories that contain a ``google/protobuf`` package tree, in
#: preference order. Only consulted when `import google.protobuf` fails.
_VENDORED_PROTOBUF_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def ensure_protobuf() -> bool:
    """Best-effort: make ``google.protobuf`` importable. Returns
    True if the import works (natively or via a vendored runtime).

    Also sets ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` so a
    vendored runtime a patch-level behind Spark's gencode still loads
    (the wire format is stable within a major version), and extends
    ``PYTHONPATH`` so Spark's forked Python workers see the same
    package.
    """
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    for d in _VENDORED_PROTOBUF_DIRS:
        if not os.path.isdir(os.path.join(d, "google", "protobuf")):
            continue
        if d not in sys.path:
            sys.path.append(d)
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            sys.path.remove(d)
            continue
        os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
        existing = os.environ.get("PYTHONPATH", "")
        if d not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                f"{existing}{os.pathsep}{d}" if existing else d
            )
        return True
    return False

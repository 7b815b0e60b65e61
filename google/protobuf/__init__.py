"""Vendored MINIMAL protobuf runtime (original code; no Google source).

This repo's container has no ``protobuf`` distribution and no package
installs, but PySpark's ``transformWithStateInPandas`` Python worker
requires the ``google.protobuf`` runtime to speak the state-server
protocol (``pyspark/sql/streaming/proto/StateMessage_pb2.py``). This
package implements just enough of the public protobuf wire format and
generated-module API to run that protocol — see ``_runtime.py`` for
the precise scope and the fail-loud boundaries.

If a real protobuf distribution is installed, remove this directory
(or ensure site-packages precedes the repo root on sys.path); the
real runtime is a strict superset.
"""

__version__ = "0.0-mini"

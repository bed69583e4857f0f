"""Worker-side protobuf shim (see celestrak_tle_data_pipeline_spark/compat.py).

Self-contained on purpose: Python workers import ``sitecustomize`` at
interpreter startup (the stdlib ``site`` mechanism) from any PYTHONPATH
entry, before pyspark imports its generated ``*_pb2`` modules — the only
moment the ``google.protobuf.runtime_version`` stub can be installed.

Worker subtlety this must handle: the JVM puts spark-core's JAR on the
worker's PYTHONPATH, and the JAR's internal ``google/protobuf/*.class``
tree satisfies ``import google.protobuf`` as a PHANTOM namespace package
(no ``__file__``, no Python modules) — so a plain try/except ImportError
never notices anything is wrong, and the real import later dies with
"cannot import name 'descriptor' ... (unknown location)". The check
below treats a namespace-shell ``google.protobuf`` as absent, purges it
from ``sys.modules``, and lets the vendored regular package (which PEP
420 gives priority over namespace portions at any path position) win.
No-op when a real protobuf wheel is installed or the vendored runtime is
absent.
"""

import os
import sys
import types

_TP = "/usr/lib/google-cloud-sdk/lib/third_party"
_SDK = os.path.join(_TP, "cloudsdk")


def _real_protobuf() -> bool:
    try:
        import google.protobuf as _gp

        # a namespace shell (e.g. spark-core JAR's class tree) has no
        # __file__ and no Python code — treat it as absent
        return getattr(_gp, "__file__", None) is not None
    except ImportError:
        return False


if not _real_protobuf() and os.path.isdir(_SDK):
    # _SDK first: both dirs hold a regular ``google`` package and only
    # _SDK's contains protobuf — a regular package beats the JAR's
    # namespace portions regardless of path position
    for _p in (_SDK, _TP):
        if _p not in sys.path:
            sys.path.append(_p)
    for _name in [n for n in sys.modules if n == "google" or n.startswith("google.")]:
        del sys.modules[_name]

try:
    import google.protobuf as _gp

    if getattr(_gp, "__file__", None) is not None:
        try:
            from google.protobuf import runtime_version  # noqa: F401
        except ImportError:
            _mod = types.ModuleType("google.protobuf.runtime_version")

            class _Domain:
                GOOGLE_INTERNAL = 1
                PUBLIC = 2

            _mod.Domain = _Domain
            _mod.ValidateProtobufRuntimeVersion = lambda *a, **k: None
            sys.modules["google.protobuf.runtime_version"] = _mod
            _gp.runtime_version = _mod
except ImportError:
    pass

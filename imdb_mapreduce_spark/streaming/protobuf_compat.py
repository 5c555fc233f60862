"""Host-discovery shim for the pure-Python ``google.protobuf`` runtime.

Spark 4's ``transformWithStateInPandas`` (TWS) speaks a protobuf protocol
between the Python worker's state client
(``pyspark/sql/streaming/stateful_processor_api_client.py``) and the
JVM-side state server; the generated ``StateMessage_pb2`` module needs a
``google.protobuf`` runtime at import time. This container has no
protobuf distribution installed (and no network to fetch one — the pip
attempt and its DNS failure are recorded in SCALING.md r12), but common
host tooling bundles the pure-Python runtime: the Google Cloud SDK ships
a complete BSD-licensed copy under its app-engine platform directory.
This module discovers such a copy and activates it for BOTH sides of the
Arrow bridge:

- driver: prepend the runtime dir to ``sys.path``;
- python workers: export ``PYTHONPATH`` through the worker-env channel.
  Workers do NOT inherit driver ``sys.path``; their env is the
  ``envVars`` map read from ``SparkContext.environment`` at
  function-wrap time (``pyspark/core/rdd.py::_prepare_for_python_RDD``),
  so mutating ``sc.environment`` activates the runtime even on a LIVE
  session — the JVM's ``PythonWorkerFactory`` caches daemons per
  (exec, envVars) key, so the next wrapped function simply gets a fresh
  daemon with the new ``PYTHONPATH``. ``os.environ`` is also set for any
  JVM launched later.

Version skew: the shipped gencode (``StateMessage_pb2``, protobuf 6.33)
may be a minor ahead of the discovered runtime (cloud-sdk bundles
6.32.0). Protobuf's own escape hatch
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true`` skips the
gencode>=runtime minor check; the wire format is stable within a major,
and the end-to-end drain test (``test_stateful_streaming.py``) is the
real compatibility gate — a silent wire mismatch would fail the
bit-exact KMV oracle comparison, not pass it.

Scale posture: on a real cluster every executor host needs the runtime
on its image (this shim only helps same-host local mode); the discovery
failing is a clean ``False`` and every TWS entry point stays gated on
it. The production tier remains the salted ``applyInPandasWithState``
operator regardless — see the SKEW WARNING on
:func:`~imdb_mapreduce_spark.streaming.stateful.running_kmv_by_type_tws`.
"""

from __future__ import annotations

import os
import sys

# Known host locations of a complete pure-Python google.protobuf runtime,
# probed in order. Each entry is the directory CONTAINING the `google`
# package. The cloud-sdk app-engine platform copy is a full modern (6.x)
# runtime; the cloud-sdk third_party copy is older (4.x) and kept as a
# fallback probe — the import check below rejects anything that cannot
# load the shipped gencode.
_CANDIDATE_RUNTIME_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
    "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk",
)

_VERSION_CHECK_FLAG = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"


def _gencode_imports(candidate_dir: str | None) -> bool:
    """True iff the shipped TWS gencode imports against the runtime that
    ``sys.path`` (plus ``candidate_dir``, if given) resolves. Probed in a
    SUBPROCESS so a failed candidate leaves the current interpreter's
    module table clean (a half-imported ``google`` package would shadow
    later candidates)."""
    import subprocess

    env = dict(os.environ)
    env[_VERSION_CHECK_FLAG] = "true"
    if candidate_dir is not None:
        env["PYTHONPATH"] = os.pathsep.join(
            [candidate_dir, env.get("PYTHONPATH", "")]
        ).rstrip(os.pathsep)
    probe = (
        "import pyspark.sql.streaming.proto.StateMessage_pb2 as m; "
        "r = m.StateRequest(); "
        "assert m.StateRequest.FromString(r.SerializeToString()) == r"
    )
    try:
        return (
            subprocess.run(
                [sys.executable, "-c", probe],
                env=env,
                capture_output=True,
                timeout=120,
            ).returncode
            == 0
        )
    except Exception:
        return False


def find_protobuf_runtime_dir() -> str | None:
    """Path of a host dir whose ``google/protobuf`` loads the TWS
    gencode, or ``None``. Pure discovery — no activation."""
    for cand in _CANDIDATE_RUNTIME_DIRS:
        if os.path.isdir(os.path.join(cand, "google", "protobuf")):
            if _gencode_imports(cand):
                return cand
    return None


def ensure_protobuf(spark=None) -> bool:
    """Make ``google.protobuf`` importable on the driver AND in python
    workers, discovering a host runtime if no distribution is installed.

    Returns True when TWS can run (either a real install or an activated
    host runtime), False when no usable runtime exists — callers gate
    TWS entry points on this, falling back to the apply*-based tiers.

    Pass the live ``SparkSession`` (or call before building one): with a
    live session the worker env is updated through ``sc.environment``;
    without one, ``os.environ`` alone covers any future JVM.
    """
    try:
        import google.protobuf  # noqa: F401

        runtime_dir = None  # genuinely installed; nothing to activate
    except ImportError:
        runtime_dir = find_protobuf_runtime_dir()
        if runtime_dir is None:
            return False
        if runtime_dir not in sys.path:
            sys.path.insert(0, runtime_dir)
        os.environ[_VERSION_CHECK_FLAG] = "true"
        os.environ["PYTHONPATH"] = os.pathsep.join(
            [runtime_dir, os.environ.get("PYTHONPATH", "")]
        ).rstrip(os.pathsep)
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            return False

    if spark is not None and runtime_dir is not None:
        sc = spark.sparkContext
        worker_pp = sc.environment.get("PYTHONPATH", "")
        if runtime_dir not in worker_pp.split(os.pathsep):
            sc.environment["PYTHONPATH"] = os.pathsep.join(
                [runtime_dir, worker_pp]
            ).rstrip(os.pathsep)
        sc.environment[_VERSION_CHECK_FLAG] = "true"
    return True

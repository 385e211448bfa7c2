"""Runtime protobuf provisioning for Spark 4's transformWithStateInPandas.

The modern arbitrary-state API (``transformWithStateInPandas``) speaks a
protobuf protocol between the JVM and its Python state server
(``pyspark.sql.streaming.proto.StateMessage_pb2``), so it needs the
``google.protobuf`` package at runtime — in the DRIVER process and in the
separately-launched streaming Python runner.  This container ships pyspark
without protobuf and has no package network, but a pure-Python protobuf
distribution (6.32.0) IS present on the box inside the Google Cloud SDK's
App Engine platform tree.  This module turns that into a usable runtime:

1. probe ``import google.protobuf`` — if an installed copy exists, done;
2. otherwise locate a pure-Python distribution under the known fallback
   roots, package ``google/protobuf/**/*.py`` into a single zip under the
   repo scratch dir (plus a pkgutil-style ``google/__init__.py`` so the
   namespace package resolves from inside a zip — zipimport does not
   implement implicit PEP-420 namespaces);
3. put the zip on the driver's ``sys.path`` AND into
   ``sc.environment["PYTHONPATH"]`` so the JVM passes it to every Python
   worker it launches — the same mechanism ``--py-files`` uses on a real
   cluster, where this zip would simply ride along with the job;
4. set ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` (protobuf's OWN
   escape hatch, read in ``runtime_version.ValidateProtobufRuntimeVersion``)
   in both environments: pyspark 4.1's gencode is 6.33.0 and the found
   runtime is 6.32.0-dev — one minor apart, wire-compatible, but the strict
   runtime>=gencode check would refuse it.

Everything degrades gracefully: if neither an installed protobuf nor a
fallback distribution exists, ``ensure_protobuf`` returns False and the
``transformWithState`` surface stays gated exactly as before (the
``applyInPandasWithState`` T6 path is always available).
"""

from __future__ import annotations

import os
import sys
import zipfile

# Known pure-Python protobuf distributions to probe, in preference order.
# Each entry is a directory whose ``google/protobuf`` subtree is the package.
PROTOBUF_FALLBACK_ROOTS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]

# subtrees that are not part of the pure-Python runtime
_SKIP_DIRS = {"pyext", "blaze-out", "testdata", "__pycache__"}

_VERSION_CHECK_FLAG = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"

_probe_failed = False
_zip_in_use: str | None = None  # set when the import is served by our zip


def _scratch_zip_path() -> str:
    from .replay import _SCRATCH

    d = os.path.abspath(os.path.join(_SCRATCH, "pb_vendor"))
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "protobuf_runtime.zip")


def _build_zip(root: str, zip_path: str) -> None:
    src = os.path.join(root, "google", "protobuf")
    # PER-PROCESS tmp name: a shared tmp would let two first-time builders
    # (e.g. a bench run and a test run) truncate each other's partial
    # writes and install a corrupt zip — os.replace makes only the rename
    # atomic, not the writes
    tmp = f"{zip_path}.{os.getpid()}.tmp"
    try:
        with zipfile.ZipFile(tmp, "w") as z:
            z.writestr(
                "google/__init__.py",
                "__path__ = __import__('pkgutil').extend_path(__path__, __name__)\n",
            )
            for walk_root, dirs, files in os.walk(src):
                dirs[:] = [d for d in dirs if d not in _SKIP_DIRS]
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(walk_root, f)
                        z.write(full, os.path.relpath(full, root))
        os.replace(tmp, zip_path)  # atomic install: concurrent builders converge
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _importable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def ensure_protobuf(spark=None) -> bool:
    """Make ``google.protobuf`` importable in this process and (when a
    SparkSession is given) in the Python workers it will launch.  Returns
    True when the runtime is available.  Idempotent; cheap after the first
    call — but the worker-env wiring re-runs per call because each NEW
    SparkSession starts with a fresh ``sc.environment``."""
    global _probe_failed, _zip_in_use
    if _probe_failed:
        return False

    if _zip_in_use is None and not _importable():
        try:
            for root in PROTOBUF_FALLBACK_ROOTS:
                if os.path.isdir(os.path.join(root, "google", "protobuf")):
                    # disable the strict runtime>=gencode check ONLY on the
                    # vendored path, where the 6.32-vs-6.33 one-minor skew is
                    # known wire-compatible — an INSTALLED protobuf keeps its
                    # own version validation (suppressing it process-wide
                    # would turn a clear too-old-runtime error into obscure
                    # downstream failures)
                    os.environ.setdefault(_VERSION_CHECK_FLAG, "true")
                    zip_path = _scratch_zip_path()
                    if not os.path.exists(zip_path):
                        _build_zip(root, zip_path)
                    if zip_path not in sys.path:
                        sys.path.insert(0, zip_path)
                    if _importable():
                        _zip_in_use = zip_path
                    break
        except OSError:
            # unwritable scratch dir, disk full, racing cleanup: degrade to
            # the gated state instead of raising through module import
            _probe_failed = True
            return False
        if _zip_in_use is None:
            _probe_failed = True
            return False

    if spark is not None and _zip_in_use is not None:
        env = spark.sparkContext.environment
        prior = env.get("PYTHONPATH")
        if not prior:
            env["PYTHONPATH"] = _zip_in_use
        elif _zip_in_use not in prior.split(os.pathsep):
            env["PYTHONPATH"] = _zip_in_use + os.pathsep + prior
        env[_VERSION_CHECK_FLAG] = "true"
    return True

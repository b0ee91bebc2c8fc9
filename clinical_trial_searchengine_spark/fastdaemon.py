"""Drop-in ``spark.python.daemon.module`` that fixes worker startup cost.

Every Python worker task runs ``pyspark.worker_util.setup_spark_files``,
which ends with ``importlib.invalidate_caches()``; on CPython 3.11 each
zipimporter in ``sys.path_importer_cache`` then re-reads its archive's
whole table of contents (pyspark.zip, the py4j src zip and the spark-core
JAR — 16 cached importer instances here), ~140 ms of worker CPU per call.
The package ``__init__`` installs an (mtime_ns, size) guard — CPython
3.12's native semantics — but only in workers that import this package
(i.e. run its kernels).  Plain pickled-RDD workers (``createDataFrame``
from Python rows, ``parallelize``) never do, and a 1-row
``createDataFrame(...).write.parquet(...)`` was measured at 4+ seconds of
worker CPU spent exclusively in ``zipimport._read_directory``
(fork-following in-worker sampler; see OPTIMIZATION_r06.md).

Because every worker is forked from the daemon, patching once at daemon
start covers them all.  This module is self-contained (no package import:
it must work even when only the repo root is on PYTHONPATH) and then
hands over to the stock ``pyspark.daemon`` with argv intact.  Enabled by
``session.get_spark`` via ``spark.python.daemon.module``; sessions built
without it just keep the stock daemon (slower, never wrong).
"""

from __future__ import annotations

import os
import sys
import zipimport


def _install_zipimport_guard() -> None:
    if sys.version_info >= (3, 12):
        return  # native guard exists
    cls = zipimport.zipimporter
    if getattr(cls, "_ctse_zipimport_guard", False):
        return
    orig = cls.invalidate_caches

    def invalidate_caches(self):  # noqa: ANN001 - stdlib signature
        try:
            st = os.stat(self.archive)
            key = (st.st_mtime_ns, st.st_size)
        except OSError:
            return orig(self)
        if getattr(self, "_ctse_zip_key", None) == key:
            return None
        out = orig(self)
        self._ctse_zip_key = key
        return out

    invalidate_caches.__doc__ = orig.__doc__
    cls.invalidate_caches = invalidate_caches
    cls._ctse_zipimport_guard = True


_install_zipimport_guard()

if __name__ == "__main__":
    import runpy

    # run the stock daemon exactly as `python -m pyspark.daemon <args>`
    # would; sys.argv[1:] (the worker module) passes through untouched
    runpy.run_module("pyspark.daemon", run_name="__main__", alter_sys=True)

"""Targeted log-noise suppression (VERDICT r03 cosmetic item).

Ray 2.49 warns "Failed to hash the schemas (for deduplication):
unhashable type: 'dict'" on EVERY block unify whose schema carries
key-value metadata — and any pandas-written parquet file has the
b'pandas' metadata block, so plain reads flood bench/driver logs and
bury real errors.  The message is harmless (unify falls through to the
slow path); only this exact message is dropped, everything else from
the module still logs.

``install()`` is importable by reference, so session owners forward it
to read/map workers via
``ray.init(runtime_env={"worker_process_setup_hook":
"dataguards_ray.lognoise.install"})`` (bench.py, jobs/*).  Importing
``dataguards_ray`` anywhere (driver or worker) also installs it for
that process.
"""

from __future__ import annotations

import logging


class SchemaHashNoise(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
        return "Failed to hash the schemas" not in record.getMessage()


_FILTER = SchemaHashNoise()


def install() -> None:
    lg = logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow")
    if _FILTER not in lg.filters:
        lg.addFilter(_FILTER)

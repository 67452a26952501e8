"""Fetch-manifest EXECUTION — the transfer half of SURVEY §2.1 S2/S4/S6.

The planning half (:mod:`fetch_plans`) emits a manifest of (filename,
remote_path) rows; this module runs the transfers distributed:

- the manifest is hash-repartitioned so transfers spread over every
  executor (transfer jobs are I/O-bound — parallelism is the whole game);
- each row is fetched with a bounded, attempt-indexed backoff retry and
  reports a per-file status ledger row (fetched/skipped/error, bytes,
  attempts) instead of failing the job — at 100k-file scale some objects
  are always missing, and the ledger IS the retry work list;
- existing destination files are skipped — the reference's
  file-existence incrementality (``luigi.LocalTarget.exists``,
  pipeline/utils.py:69-77) as idempotent re-runs;
- the byte transfer itself is a pluggable ``fetcher(remote, dest) ->
  bytes_written``. The default raises (this container has no network —
  same gating policy as the multimodal codecs); ``local_file_fetcher``
  copies from a locally-mounted mirror and backs the tests, and an HTTP/
  S3 fetcher drops in without touching the engine code.

Reference: sources/goes16/pipeline.py:61-89 (Fetch), sources/era5
(ERA5File), sources/ceres_geo/download.py:3-8 (FetchFile).
"""

from __future__ import annotations

import os
import shutil
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

FETCH_RESULT_SCHEMA = (
    "filename string, remote_path string, dest_path string, "
    "status string, n_bytes long, attempts int, error string"
)


def default_fetcher(remote_path: str, dest_path: str) -> int:
    raise NotImplementedError(
        "no network transport in this environment — pass a fetcher "
        "(e.g. local_file_fetcher for a mounted mirror, or an HTTP/S3 "
        "callable in production)"
    )


def local_file_fetcher(remote_path: str, dest_path: str) -> int:
    """Copy from a locally-mounted mirror (also the test backend)."""
    shutil.copyfile(remote_path, dest_path)
    return os.path.getsize(dest_path)


def urllib_fetcher(
    remote_path: str, dest_path: str, timeout: float = 60.0, chunk: int = 1 << 20
) -> int:
    """Stdlib URL fetcher: streams ``http(s)://`` / ``file://`` URLs to
    ``dest_path`` in bounded chunks (no whole-object buffering — GOES16
    granules run to hundreds of MB). The production analog of the
    reference's ``urllib.request.urlretrieve`` wrapper
    (convml_data/utils/download.py); network use stays opt-in — nothing
    in the engine calls this unless a manifest execution passes it as the
    ``fetcher``. ``file://`` URLs back the tests offline."""
    from urllib.request import urlopen

    n = 0
    with urlopen(remote_path, timeout=timeout) as resp, open(dest_path, "wb") as out:
        while True:
            buf = resp.read(chunk)
            if not buf:
                break
            out.write(buf)
            n += len(buf)
    return n


def execute_fetch_manifest(
    manifest: DataFrame,
    dest_dir: str,
    fetcher: Callable[[str, str], int] = default_fetcher,
    remote_col: str = "remote_path",
    filename_col: str = "filename",
    max_attempts: int = 3,
    backoff_s: float = 0.05,
    skip_existing: bool = True,
) -> DataFrame:
    """Run the transfers in the manifest; returns the status ledger
    (FETCH_RESULT_SCHEMA), one row per manifest row.

    The write is atomic-per-file (temp name + rename) so a killed executor
    never leaves a half file that a later ``skip_existing`` run would
    trust. Backoff is attempt-indexed (deterministic), capped at
    ``max_attempts``.
    """
    import pandas as pd

    spark = manifest.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    rows = manifest.select(filename_col, remote_col).repartition(
        parallelism, filename_col
    )

    def run_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(dest_dir, exist_ok=True)
        for pdf in batches:
            out = []
            for fn, remote in zip(pdf[filename_col], pdf[remote_col]):
                dest = os.path.join(dest_dir, str(fn))
                if skip_existing and os.path.exists(dest):
                    out.append((fn, remote, dest, "skipped",
                                os.path.getsize(dest), 0, None))
                    continue
                err, nb, att = None, 0, 0
                for attempt in range(max_attempts):
                    att = attempt + 1
                    try:
                        tmp = f"{dest}.__part_{os.getpid()}"
                        nb = fetcher(str(remote), tmp)
                        os.replace(tmp, dest)
                        err = None
                        break
                    except NotImplementedError:
                        raise  # misconfiguration, not a transient failure
                    except Exception as e:  # transient: retry with backoff
                        err = f"{type(e).__name__}: {e}"
                        # the fetcher may have partially written the temp
                        # file before raising — drop it so retried runs
                        # don't accumulate .__part_* junk in dest_dir
                        try:
                            os.unlink(tmp)
                        except OSError:
                            pass
                        if attempt + 1 < max_attempts:
                            time.sleep(backoff_s * (2 ** attempt))
                out.append(
                    (fn, remote, dest if err is None else None,
                     "fetched" if err is None else "error",
                     nb if err is None else 0, att, err)
                )
            yield pd.DataFrame(
                out,
                columns=["filename", "remote_path", "dest_path", "status",
                         "n_bytes", "attempts", "error"],
            )

    return rows.mapInPandas(run_batch, FETCH_RESULT_SCHEMA)

"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming (SURVEY §2.13), but its incremental
re-run-and-skip semantics (pipeline/utils.py:69-77) imply exactly this
pattern when the catalog becomes a stream: per-key state that survives
micro-batches. Two operators:

- :func:`streaming_seen_filter` — first-seen pass-through / duplicate drop
  per key (streaming exact dedup; the streaming face of
  ``dedup.exact_duplicates``).
- :func:`streaming_running_counts` — per-key running counts emitted each
  micro-batch (the streaming face of A8's resampled counts).

State is a tuple in GroupState; timeouts are left to the caller's watermark
policy (NoTimeout default keeps the semantics deterministic for tests).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_seen_filter(
    stream: DataFrame, key_col: str, id_col: str, out_schema: str | None = None
) -> DataFrame:
    """Emit only the first row of each key across ALL micro-batches."""
    out_schema = out_schema or f"{key_col} string, {id_col} long"

    def fn(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        seen = state.exists
        # min over ALL Arrow chunks of the batch — a key's rows can span
        # chunks, so taking the first non-empty chunk's min would make the
        # surviving row depend on chunk boundaries. With min-over-batch,
        # a single-batch drain (one input file + AvailableNow) emits
        # exactly min(id) per key — deterministic and oracle-checkable.
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = pdf[id_col].min()
                if best is None or m < best:
                    best = m
        if seen or best is None:
            yield pd.DataFrame(columns=out_schema.replace(",", " ").split()[::2])
        else:
            state.update((1,))
            yield pd.DataFrame([{key_col: key[0], id_col: best}])

    return stream.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, "count long", "append", GroupStateTimeout.NoTimeout
    )


def streaming_running_counts(stream: DataFrame, key_col: str) -> DataFrame:
    """Per-key cumulative count, one row per key per micro-batch."""

    def fn(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        (total,) = state.get if state.exists else (0,)
        batch = sum(len(pdf) for pdf in pdfs)
        total += batch
        state.update((total,))
        yield pd.DataFrame([{key_col: key[0], "running_count": total}])

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        f"{key_col} string, running_count long",
        "total long",
        "update",
        GroupStateTimeout.NoTimeout,
    )

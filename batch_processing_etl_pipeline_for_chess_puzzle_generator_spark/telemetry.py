"""Row-count / metric telemetry via observable metrics.

The reference logs row counts by calling ``.count()`` around its
transform (reference: etl/transform.py:97-114) — an EXTRA full action
per metric, which at 100 TB doubles the job. Spark's ``Observation``
API attaches named aggregates to the existing plan: metrics are
collected as a side effect of the one action that already runs, for
free.

Usage::

    df, obs = observed(events_df, "ingest",
                       rows=F.count(F.lit(1)),
                       null_users=F.sum(F.col("user_id").isNull().cast("long")))
    df.write.parquet(...)     # the real action
    log.info("ingest metrics: %s", obs.get)   # {'rows': ..., 'null_users': 0}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named observable metrics to ``df``'s next action.

    Returns the instrumented DataFrame and the Observation handle;
    ``observation.get`` blocks until the first action on the returned
    DataFrame completes, then yields the metric dict.
    """
    if not metrics:
        metrics = {"rows": F.count(F.lit(1))}
    obs = Observation(name)
    cols = [m.alias(k) for k, m in metrics.items()]
    return df.observe(obs, cols[0], *cols[1:]), obs

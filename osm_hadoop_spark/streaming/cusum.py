"""Streaming one-sided CUSUM drift monitor (engine addition; the causal
twin of the batch `cusum_changepoint` query).

The batch statistic D_i = n*prefix_i - i*total is retrospective — it
needs the full-series total. The ONLINE form is Page's one-sided CUSUM:

    s_pos = max(0, s_pos + (x - target - slack))
    s_neg = max(0, s_neg + (target - x - slack))

alarm when either side exceeds the threshold h, then restart both at 0
(the standard Page restart). All arithmetic is exact int64 over cents.

State per key is five integers — O(keys), the smallest possible
stateful-streaming footprint — via `applyInPandasWithState` (the
sanctioned custom-stateful form, SURVEY.md section 2.7). Rows within a
micro-batch fold in (order_col) order: Spark does not guarantee
intra-batch row order into the state function, so the sort is applied
explicitly per chunk for deterministic replay.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id bigint, n_seen bigint, s_pos bigint, s_neg bigint, "
    "n_alarms bigint, first_alarm_n bigint"
)
_STATE_SCHEMA = (
    "n_seen bigint, s_pos bigint, s_neg bigint, n_alarms bigint, "
    "first_alarm_n bigint"
)


def _make_cusum_fn(target: int, slack: int, threshold: int):
    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, sp, sn, alarms, first = (
            state.get if state.exists else (0, 0, 0, 0, None)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.shape[0] == 0:
            return
        rows = rows.sort_values("order_col", kind="mergesort")
        for x in rows["value_cents"]:
            n += 1
            sp = max(0, sp + (int(x) - target - slack))
            sn = max(0, sn + (target - int(x) - slack))
            if sp > threshold or sn > threshold:
                alarms += 1
                if first is None:
                    first = n
                sp = sn = 0
        state.update((n, sp, sn, alarms, first))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_seen": [n],
            "s_pos": [sp],
            "s_neg": [sn],
            "n_alarms": [alarms],
            "first_alarm_n": [first],
        })

    return _fn


def streaming_cusum(
    events: DataFrame,
    target: int,
    slack: int,
    threshold: int,
    key: str = "user_id",
    value: str = "value_cents",
    order: str = "order_col",
) -> DataFrame:
    """events(key, value cents, order) -> per-key running CUSUM state
    after each micro-batch (update mode): (user_id, n_seen, s_pos,
    s_neg, n_alarms, first_alarm_n)."""
    return (
        events.select(
            F.col(key).alias("user_id"),
            F.col(value).cast("bigint").alias("value_cents"),
            F.col(order).cast("bigint").alias("order_col"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_cusum_fn(target, slack, threshold),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

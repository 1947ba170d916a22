"""Per-window trending tokens over a text stream: Misra-Gries in
state, finalized by event-time timeout.

The batch twin (extensions/sketches.py::heavy_hitters) gets exactness
from a second full pass; a stream cannot re-read its history, so the
streaming form keeps ONE bounded Misra-Gries summary per window in
operator state and emits it when the watermark closes the window.
The MG recall guarantee survives streaming unchanged — the summary is
a fold over the window's token sequence regardless of how micro-
batches sliced it — so every token above windowTotal/(k+1)
occurrences is present in the emitted candidates; estimates
undercount by at most windowTotal/(k+1) (the classic MG error bound).

Scale shape: the only shuffle keys rows by window slot; state per
window is k (token, count) pairs + one total — constant, independent
of window volume. The shuffle carries raw text rows, one per
document, and tokens fold INSIDE the Arrow batch kernel — the
shuffle-before-fan-out rule from dedup.partition_by_doc applied to
streams. Closed windows drop their state via
GroupStateTimeout.EventTimeTimeout.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from walex_spark.extensions.sketches import _mg_update

OUT_SCHEMA = "slot BIGINT, token STRING, est_count BIGINT, window_total BIGINT"

_WS = re.compile(r"\s+", re.ASCII)


def trending_tokens_stream(
    df: DataFrame,
    ts_col: str,
    text_col: str,
    window_seconds: int,
    k: int = 64,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Text stream → stream of per-window MG summaries, emitted once
    per window when the watermark passes its end."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if window_seconds <= 0:
        raise ValueError("window_seconds must be > 0")
    if k < 2:
        raise ValueError("k must be >= 2")
    step_us = window_seconds * 1_000_000

    # the watermark must be declared on the raw event time and that
    # attribute must SURVIVE into the stateful operator's projection;
    # deriving a window-start column and watermarking it instead makes
    # every row of a window maximally late (wstart == watermark) and
    # silently drops all but the window's first batch
    us = F.unix_micros(F.col(ts_col))
    pre = df.withWatermark(ts_col, watermark).select(
        # pmod, not %: a true floor for pre-epoch event times (same
        # hazard as resample.py — % truncates toward zero)
        ((us - F.pmod(us, F.lit(step_us))) / F.lit(step_us))
        .cast("long")
        .alias("__slot"),
        F.col(ts_col).alias("__ts"),
        F.col(text_col).alias("__text"),
    )

    def step(key, pdfs, state: GroupState):
        import pandas as pd

        (slot,) = key
        if state.hasTimedOut:
            tokens, counts, total = state.get
            state.remove()
            if tokens:
                yield pd.DataFrame(
                    {
                        "slot": [int(slot)] * len(tokens),
                        "token": list(tokens),
                        "est_count": [int(c) for c in counts],
                        "window_total": [int(total)] * len(tokens),
                    }
                )
            return

        if state.exists:
            tokens, counts, total = state.get
            counters = dict(zip(tokens, (int(c) for c in counts)))
            total = int(total)
        else:
            counters, total = {}, 0
        for pdf in pdfs:
            for text in pdf["__text"]:
                if text is None:
                    continue
                for tok in _WS.split(text.lower()):
                    if tok:
                        _mg_update(counters, tok, k)
                        total += 1
        state.update(
            (list(counters.keys()), list(counters.values()), total)
        )
        # finalize when the watermark passes the window end, which is
        # derivable from the group key alone
        wend_ms = (int(slot) + 1) * window_seconds * 1000
        state.setTimeoutTimestamp(wend_ms)
        yield from ()

    return pre.groupBy("__slot").applyInPandasWithState(
        step,
        outputStructType=OUT_SCHEMA,
        stateStructType=(
            "tokens array<string>, counts array<long>, total bigint"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

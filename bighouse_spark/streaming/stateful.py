"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY.md §2: "Not present
anywhere, in any form: streaming"); this is the extension surface a
training-data pipeline needs: per-key running state across
micro-batches (counters, rolling means for drift detection) and
in-stream deduplication.

Scale notes:
- State lives in the state store partitioned by the grouping key —
  the same hash partitioning as the shuffle that precedes it, so no
  extra exchange. Per-key state here is O(1) (a few scalars), never a
  buffer of rows, so a billion keys is bounded by keys × ~100 B.
- ``streaming_dedup`` uses ``dropDuplicatesWithinWatermark``: state
  is evicted once the watermark passes, which is what makes exact
  streaming dedup feasible on an unbounded stream (the batch-side
  exact/minhash dedup lives in ``operators/dedup.py``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    pass

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("mean_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def _running_stats_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (n, s) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "mean_value": [s / n if n else None],
        }
    )


def running_user_stats(
    events: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Per-key running count/sum/mean maintained across micro-batches.

    Arrow-batched (pandas per group-in-batch), constant-size state per
    key. Output mode must be ``update``.
    """
    return events.groupBy(key).applyInPandasWithState(
        _running_stats_fn,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact in-stream dedup with bounded state: duplicates arriving
    within ``watermark`` of each other are dropped; state for keys
    older than the watermark is evicted."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def _time_cmp(d: float, op: str, s: float) -> bool:
    """One (?t op N) comparison — shared by the streaming sequence
    DP; '='/'==' mirror the batch fold's raw-op embedding."""
    if op == "<":
        return d < s
    if op == "<=":
        return d <= s
    if op == ">":
        return d > s
    if op == ">=":
        return d >= s
    return d == s


def streaming_funnel(
    events: DataFrame,
    conds: list[str],
    window_s: float,
    ts_col: str = "ts",
    key: str = "user_id",
    modes: tuple[str, ...] = (),
) -> DataFrame:
    """Per-key windowFunnel level maintained ACROSS micro-batches —
    the streaming twin of the batch ``windowFunnel`` fold: the SAME
    per-condition entry walk (each row contributes one (t, k) entry
    per matched condition, sorted by (t, k) within the batch — the
    round-10 batch model, equal-timestamp ties included) and the
    same strict modes (``strict_order``, ``strict_deduplication``,
    ``strict_increase``). NULL timestamps are invisible, like the
    batch folds' notnull filter.

    State is constant per key regardless of stream length. With no
    modes it is exactly the pre-round-10 record — n anchor doubles —
    so existing checkpoints keep restoring; strict modes add n step
    timestamps, a halted flag and the dedup truncation level. Rows
    fold in (micro-batch, within-batch (t, k)) order: events that
    arrive LATE relative to an already-processed batch fold as if
    they happened at arrival — the standard streaming trade-off; the
    exact-order answer is the batch fold. Output mode ``update``:
    one (key, level) row per key per batch that touched it (in
    strict_deduplication mode a later truncation can LOWER the
    emitted level to the repeat's, like the batch fold).
    """
    import math

    from pyspark.sql import functions as F

    n = len(conds)
    if n == 0:
        raise ValueError("streaming_funnel needs at least one condition")
    allowed = {"strict_order", "strict_deduplication", "strict_increase"}
    bad = set(modes) - allowed
    if bad:
        raise ValueError(
            f"streaming_funnel modes {sorted(bad)} not in {sorted(allowed)}"
        )
    s_order = "strict_order" in modes
    s_dedup = "strict_deduplication" in modes
    s_incr = "strict_increase" in modes
    proj = [F.col(key), F.col(ts_col).cast("double").alias("__t")]
    for i, c in enumerate(conds, 1):
        proj.append(
            F.coalesce(F.expr(c).cast("boolean"), F.lit(False)).alias(
                f"__c{i}"
            )
        )
    src = events.select(*proj)
    key_field = src.schema[key]
    out_schema = StructType(
        [key_field, StructField("level", LongType())]
    )
    ninf = float("-inf")
    window = float(window_s)
    ccols = [f"__c{i}" for i in range(1, n + 1)]

    def batch_entries(pdfs, with_zero: bool) -> list[tuple[float, int]]:
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return []
        batch = pd.concat(frames)
        ts = batch["__t"].to_numpy()
        cs = [
            batch[c].fillna(False).to_numpy(dtype=bool) for c in ccols
        ]
        entries: list[tuple[float, int]] = []
        for i in range(len(ts)):
            t = float(ts[i])
            if math.isnan(t):  # NULL ts: invisible, like the batch
                continue
            any_c = False
            for k in range(n):
                if cs[k][i]:
                    entries.append((t, k + 1))
                    any_c = True
            if with_zero and not any_c:
                entries.append((t, 0))
        entries.sort()
        return entries

    if not modes:
        # pre-round-10 state record (n anchor doubles) — existing
        # checkpoints keep restoring; the walk itself is the entry
        # model (default mode needs no step/halt state).
        state_schema = StructType(
            [StructField(f"a{k}", DoubleType()) for k in range(1, n + 1)]
        )

        def fn(
            key_t: tuple[Any, ...],
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            anchors = list(state.get) if state.exists else [ninf] * n
            for t, k in batch_entries(pdfs, with_zero=False):
                if k == 1:
                    anchors[0] = t
                elif (
                    anchors[k - 2] > ninf
                    and t - anchors[k - 2] <= window
                ):
                    anchors[k - 1] = anchors[k - 2]
            state.update(tuple(anchors))
            level = 0
            for k in range(n, 0, -1):
                if anchors[k - 1] > ninf:
                    level = k
                    break
            yield pd.DataFrame({key: [key_t[0]], "level": [level]})

    else:
        state_schema = StructType(
            [StructField(f"a{k}", DoubleType()) for k in range(1, n + 1)]
            + [
                StructField(f"b{k}", DoubleType())
                for k in range(1, n + 1)
            ]
            + [
                StructField("done", LongType()),
                StructField("ret", LongType()),
            ]
        )

        def fn(
            key_t: tuple[Any, ...],
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            if state.exists:
                st = list(state.get)
                anchors = st[:n]
                steps = st[n:2 * n]
                done = bool(st[2 * n])
                ret = int(st[2 * n + 1])
            else:
                anchors = [ninf] * n
                steps = [ninf] * n
                done = False
                ret = 0
            if not done:
                for t, k in batch_entries(pdfs, with_zero=s_order):
                    if done or anchors[n - 1] > ninf:
                        break
                    if k == 0:  # strict_order chain-breaker
                        if anchors[0] > ninf:
                            done = True
                        continue
                    if s_dedup and k >= 2 and anchors[k - 1] > ninf:
                        ret = k
                        done = True
                        break
                    if k == 1:
                        anchors[0] = t
                        steps[0] = t
                        continue
                    prev_a = anchors[k - 2]
                    if (
                        prev_a > ninf
                        and t - prev_a <= window
                        and (not s_incr or t > steps[k - 2])
                    ):
                        anchors[k - 1] = prev_a
                        steps[k - 1] = t
                    elif (
                        s_order
                        and anchors[0] > ninf
                        and prev_a <= ninf
                    ):
                        # out-of-order funnel entry after chain start
                        done = True
                        break
            state.update(
                tuple(anchors) + tuple(steps) + (int(done), int(ret))
            )
            if s_dedup and ret > 0:
                level = ret
            else:
                level = 0
                for k in range(n, 0, -1):
                    if anchors[k - 1] > ninf:
                        level = k
                        break
            yield pd.DataFrame({key: [key_t[0]], "level": [level]})

    return src.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )




def streaming_retention(
    events: DataFrame,
    conds: list[str],
    key: str = "user_id",
) -> DataFrame:
    """Per-key ``retention()`` flags across micro-batches: flag k is
    cond1-seen AND condk-seen (CH's cross-row OR then AND-with-first
    — order-free, so late data cannot change a set flag). State is n
    booleans per key."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    n = len(conds)
    if n == 0:
        raise ValueError(
            "streaming_retention needs at least one condition"
        )
    proj = [F.col(key)]
    for i, c in enumerate(conds, 1):
        proj.append(
            F.coalesce(F.expr(c).cast("boolean"), F.lit(False)).alias(
                f"__c{i}"
            )
        )
    src = events.select(*proj)
    key_field = src.schema[key]
    out_schema = StructType(
        [key_field]
        + [StructField(f"r{k}", LongType()) for k in range(1, n + 1)]
    )
    state_schema = StructType(
        [StructField(f"s{k}", BooleanType()) for k in range(1, n + 1)]
    )
    ccols = [f"__c{i}" for i in range(1, n + 1)]

    def fn(
        key_t: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seen = list(state.get) if state.exists else [False] * n
        for pdf in pdfs:
            if not len(pdf):
                continue
            for i, c in enumerate(ccols):
                if not seen[i] and bool(
                    pdf[c].fillna(False).any()
                ):
                    seen[i] = True
        state.update(tuple(seen))
        flags = [1 if seen[0] else 0]
        flags += [
            1 if (seen[0] and seen[k]) else 0 for k in range(1, n)
        ]
        out = {key: [key_t[0]]}
        for k in range(1, n + 1):
            out[f"r{k}"] = [flags[k - 1]]
        yield pd.DataFrame(out)

    return src.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sequence_match(
    events: DataFrame,
    conds: list[str],
    ts_col: str = "ts",
    key: str = "user_id",
    pattern: str | None = None,
) -> DataFrame:
    """Per-key ``sequenceMatch`` across micro-batches. Without a
    ``pattern``, the ``'(?1).*(?2)...'`` subset streams as a greedy
    level counter (one long per key). With a ``pattern``, the FULL
    grammar the batch fold serves — adjacency and ``(?t op N)``
    time constraints — streams via the same per-prefix reachability
    DP (transpile._sequence_reach_fold): per prefix k the state
    carries the earliest end timestamp, the latest end timestamp,
    and whether the prefix ended at the previous RELEVANT stream
    position — O(pattern) doubles per key, never an event buffer.
    The stored stream is rows matching ≥1 condition (undescribed
    events invisible, the CH contract); adjacency spans batch
    boundaries because the previous-position flags persist in
    state. Rows fold in (batch, within-batch timestamp) order, the
    same arrival-order contract as streaming_funnel."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    n = len(conds)
    if n == 0:
        raise ValueError(
            "streaming_sequence_match needs at least one condition"
        )
    refs: list[int] = []
    trans: list[dict] = []
    if pattern is not None:
        from bighouse_spark.dialect.transpile import _parse_seq_pattern

        refs, trans = _parse_seq_pattern(pattern, n)
    proj = [F.col(key), F.col(ts_col).cast("double").alias("__t")]
    for i, c in enumerate(conds, 1):
        proj.append(
            F.coalesce(F.expr(c).cast("boolean"), F.lit(False)).alias(
                f"__c{i}"
            )
        )
    src = events.select(*proj)
    key_field = src.schema[key]
    out_schema = StructType(
        [key_field, StructField("matched", BooleanType())]
    )
    ccols = [f"__c{i}" for i in range(1, n + 1)]

    if pattern is None:
        state_schema = StructType([StructField("lvl", LongType())])

        def fn(
            key_t: tuple[Any, ...],
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            lvl = state.get[0] if state.exists else 0
            frames = [p for p in pdfs if len(p)]
            if frames and lvl < n:
                batch = pd.concat(frames).sort_values("__t")
                cs = [
                    batch[c].fillna(False).to_numpy(dtype=bool)
                    for c in ccols
                ]
                for i in range(len(batch)):
                    if lvl < n and cs[lvl][i]:
                        lvl += 1
            state.update((lvl,))
            yield pd.DataFrame(
                {key: [key_t[0]], "matched": [lvl >= n]}
            )

    else:
        m = len(refs)
        ninf = float("-inf")
        pinf = float("inf")
        state_schema = StructType(
            [StructField(f"e{k}", DoubleType()) for k in range(1, m + 1)]
            + [
                StructField(f"l{k}", DoubleType())
                for k in range(1, m + 1)
            ]
            + [StructField(f"p{k}", LongType()) for k in range(1, m + 1)]
        )

        # hoisted per-transition constants: (gap, op, secs_float)
        trans_c = [
            (
                tr["gap"],
                tr["op"],
                float(tr["secs"]) if tr["secs"] is not None else None,
            )
            for tr in trans
        ]

        def fn(
            key_t: tuple[Any, ...],
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            import math

            if state.exists:
                st = list(state.get)
                e = st[:m]
                lt = st[m:2 * m]
                pp = [bool(v) for v in st[2 * m:3 * m]]
            else:
                e = [pinf] * m
                lt = [ninf] * m
                pp = [False] * m
            frames = [p for p in pdfs if len(p)]
            if frames:
                batch = pd.concat(frames)
                ts = batch["__t"].to_numpy()
                cs = [
                    batch[c].fillna(False).to_numpy(dtype=bool)
                    for c in ccols
                ]
                # the batch fold's stream order at ties:
                # (t, lowest matching k, c1..cn); NULL ts invisible
                rows: list[tuple[float, int, tuple[bool, ...]]] = []
                for i in range(len(ts)):
                    flags = tuple(bool(cs[k][i]) for k in range(n))
                    if not any(flags):
                        continue  # undescribed events are invisible
                    t = float(ts[i])
                    if math.isnan(t):
                        continue
                    rows.append((t, flags.index(True) + 1, flags))
                rows.sort()
                for t, _lk, flags in rows:
                    # new prefix-ends derive from the PRE-event state
                    ne = [False] * m
                    ne[0] = flags[refs[0] - 1]
                    for k in range(2, m + 1):
                        gap, op, secs = trans_c[k - 2]
                        if gap:
                            if op is None:
                                chk = lt[k - 2] > ninf
                            elif op in ("<", "<="):
                                chk = lt[k - 2] > ninf and _time_cmp(
                                    t - lt[k - 2], op, secs
                                )
                            else:
                                chk = e[k - 2] < pinf and _time_cmp(
                                    t - e[k - 2], op, secs
                                )
                        else:
                            chk = pp[k - 2]
                            if op is not None and chk:
                                chk = _time_cmp(
                                    t - lt[k - 2], op, secs
                                )
                        ne[k - 1] = flags[refs[k - 1] - 1] and chk
                    for k in range(m):
                        if ne[k]:
                            e[k] = min(e[k], t)
                            lt[k] = t
                        pp[k] = ne[k]
            state.update(
                tuple(e) + tuple(lt) + tuple(int(v) for v in pp)
            )
            yield pd.DataFrame(
                {key: [key_t[0]], "matched": [lt[m - 1] > ninf]}
            )

    return src.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# Executor-side closures live here: ship this module's code by value
# so workers need not import the package (see functions/_shipping.py).
import sys as _sys

from bighouse_spark.functions._shipping import ship_by_value as _ship

_ship(_sys.modules[__name__])


def streaming_sequence_next_node(
    events: DataFrame,
    direction: str,
    base: str,
    value_col: str,
    base_cond: str,
    conds: list[str],
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Per-key ``sequenceNextNode(direction, base)`` across
    micro-batches — the streaming twin of the batch builder
    (transpile._sequence_next_node_builder), completing the
    behavioral-aggregate family (funnel/retention/sequenceMatch
    already stream).

    All four direction x base pairings stream with O(len(conds))
    state — never an event buffer:

    * ``forward/head``: the first ``n+1`` qualifying rows decide the
      answer once and it freezes.
    * ``forward/first_match``: the earliest ``base AND cond1`` row
      starts the single candidate chain (CH keys off that position
      whether or not its chain completes); the next ``n`` rows
      decide, then the answer freezes.
    * ``forward/last_match``: every ``base AND cond1`` row RESTARTS
      the candidate (a later match supersedes); the rolling
      candidate's forward chain decides the current answer.
    * ``backward/tail``: recomputed per batch from a ring buffer of
      the last ``n+1`` rows — the answer legitimately CHANGES as the
      stream grows and converges to the batch fold (update-mode
      contract shared by the other twins).
    * ``backward/first_match`` / ``backward/last_match``: the match
      bases follow the SCAN direction like the batch builder
      (walking backward, the "first" match is the LARGEST index):
      first_match re-evaluates its backward chain against the ring
      on every match row and overwrites the candidate; last_match
      keys off the EARLIEST match row and freezes at its arrival
      (the backward chain needs only rows already in the ring).

    Row flags pack into one bitmask long per ring slot (bit 0 =
    base, bit k = cond k). NULL timestamps are invisible, values
    emit as strings — both the batch contract. Rows fold in
    (micro-batch, within-batch timestamp) order; the exact-order
    answer is the batch fold (convergence test-pinned on time-split
    files). Output: (key, next_node, emits) per touched key per
    batch — ``emits`` is a per-key monotone counter so the FINAL
    answer is the row with the max ``emits``.
    """
    import math

    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    direction = direction.lower()
    base = base.lower()
    if direction not in ("forward", "backward"):
        raise ValueError("direction must be 'forward'/'backward'")
    if base not in ("head", "tail", "first_match", "last_match"):
        raise ValueError(
            "base must be head/tail/first_match/last_match"
        )
    if base == "head" and direction != "forward":
        raise ValueError("base 'head' requires direction 'forward'")
    if base == "tail" and direction != "backward":
        raise ValueError("base 'tail' requires direction 'backward'")
    n = len(conds)
    if n == 0:
        raise ValueError(
            "streaming_sequence_next_node needs at least one condition"
        )
    proj = [
        F.col(key),
        F.col(ts_col).cast("double").alias("__t"),
        F.col(value_col).cast("string").alias("__v"),
        F.coalesce(F.expr(base_cond).cast("boolean"), F.lit(False)).alias(
            "__b"
        ),
    ]
    for i, c in enumerate(conds, 1):
        proj.append(
            F.coalesce(F.expr(c).cast("boolean"), F.lit(False)).alias(
                f"__c{i}"
            )
        )
    src = events.select(*proj)
    key_field = src.schema[key]
    out_schema = StructType(
        [
            key_field,
            StructField("next_node", StringType()),
            StructField("emits", LongType()),
        ]
    )
    # state: count, frozen, prog, emits, res, cand_set + ring/first
    # buffer of n+1 (value, bitmask) slots
    slots = n + 1
    state_schema = StructType(
        [
            StructField("count", LongType()),
            StructField("frozen", LongType()),
            StructField("prog", LongType()),
            StructField("emits", LongType()),
            StructField("cand_set", LongType()),
            StructField("res", StringType()),
        ]
        + [StructField(f"sv{j}", StringType()) for j in range(slots)]
        + [StructField(f"sm{j}", LongType()) for j in range(slots)]
    )

    def batch_rows(pdfs) -> list[tuple[str, int]]:
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return []
        batch = pd.concat(frames).sort_values("__t")
        out = []
        bs = batch["__b"].fillna(False).to_numpy(dtype=bool)
        cs = [
            batch[f"__c{i}"].fillna(False).to_numpy(dtype=bool)
            for i in range(1, n + 1)
        ]
        vs = batch["__v"].to_numpy(dtype=object)
        ts = batch["__t"].to_numpy()
        for i in range(len(batch)):
            t = float(ts[i])
            if math.isnan(t):
                continue
            m = 1 if bs[i] else 0
            for k in range(n):
                if cs[k][i]:
                    m |= 1 << (k + 1)
            v = vs[i]
            out.append((None if v is None or v != v else str(v), m))
        return out

    def fn(
        key_t: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = list(state.get)
            count, frozen, prog, emits, cand_set, res = st[:6]
            sv = list(st[6:6 + slots])
            sm = list(st[6 + slots:6 + 2 * slots])
        else:
            count, frozen, prog, emits, cand_set, res = 0, 0, 0, 0, 0, None
            sv = [None] * slots
            sm = [0] * slots

        def chain_ok_head() -> bool:
            # base AND cond1 at slot 0, cond k at slot k-1
            if not (sm[0] & 1 and sm[0] & 2):
                return False
            return all(sm[k - 1] & (1 << k) for k in range(2, n + 1))

        def chain_ok_tail() -> bool:
            # base AND cond1 at the ring tail, cond k walking back
            tail = slots - 1
            if not (sm[tail] & 1 and sm[tail] & 2):
                return False
            return all(
                sm[tail - (k - 1)] & (1 << k) for k in range(2, n + 1)
            )

        # The match bases follow the scan direction (the batch
        # builder's rule): the anchoring match row is the EARLIEST
        # when (base == first_match) == (direction == forward), else
        # the LATEST.
        anchor_earliest = (base == "first_match") == (
            direction == "forward"
        )
        for v, m in batch_rows(pdfs):
            if direction == "forward":
                if base == "head":
                    if frozen:
                        break
                    if count < slots:
                        sv[count], sm[count] = v, m
                        count += 1
                        if count == slots:
                            res = sv[slots - 1] if chain_ok_head() else None
                            frozen = 1
                elif anchor_earliest:  # first_match: freeze once
                    if frozen:
                        break
                    count += 1
                    if prog == 0:
                        if m & 1 and m & 2:
                            prog = 1  # anchored at this position
                    elif prog >= 1:
                        o = prog  # this row sits at offset o after p
                        if o <= n - 1:
                            if m & (1 << (o + 1)):
                                prog += 1
                            else:
                                res, frozen = None, 1
                        if o == n:
                            res, frozen = v, 1
                else:  # last_match: every match RESTARTS the chain
                    count += 1
                    if m & 1 and m & 2:
                        prog, res, cand_set = 1, None, 1
                        continue
                    if 1 <= prog <= n:
                        o = prog
                        if o <= n - 1:
                            if m & (1 << (o + 1)):
                                prog += 1
                            else:
                                prog = -1  # dead candidate → NULL
                        if o == n:
                            res, prog = v, n + 1
            else:  # backward: ring push
                sv = sv[1:] + [v]
                sm = sm[1:] + [m]
                count += 1
                if base != "tail" and m & 1 and m & 2 and not frozen:
                    if count >= slots and all(
                        sm[slots - 1 - (k - 1)] & (1 << k)
                        for k in range(2, n + 1)
                    ):
                        res = sv[0]
                    else:
                        res = None  # the anchoring match decides,
                        # even if its chain (or history depth) fails
                    cand_set = 1
                    if anchor_earliest:
                        # last_match anchors on the EARLIEST row —
                        # later matches must not overwrite
                        frozen = 1

        if base == "tail":
            current = (
                sv[0] if count >= slots and chain_ok_tail() else None
            )
        elif direction == "forward" and base == "last_match":
            current = res if prog == n + 1 else None
        elif direction == "backward":  # first_match / last_match
            current = res if cand_set else None
        else:  # forward head / first_match: frozen result
            current = res if frozen else None
        emits += 1
        state.update(
            tuple([count, frozen, prog, emits, cand_set, res])
            + tuple(sv)
            + tuple(sm)
        )
        yield pd.DataFrame(
            {
                key: [key_t[0]],
                "next_node": [current],
                "emits": [emits],
            }
        )

    return src.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# Executor-side closures live here (the module-level
# _running_stats_fn and every applyInPandasWithState body): ship
# this module's code by value so workers need not import the package
# (see functions/_shipping.py; round-11 audit).
import sys as _sys

from bighouse_spark.functions._shipping import ship_by_value as _ship

_ship(_sys.modules[__name__])

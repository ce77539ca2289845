"""Event-stream catalogue rows — see queries.py."""

from .qcore import *  # noqa: F401,F403



# ======================================================================
# Events: windowed aggregation + sessionisation
# ======================================================================
def q_events_window(sf_dir):
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        win = pc.divide(ts_us, 300_000_000)
        tt = pa.table({"user_id": t["user_id"], "win": win,
                       "value": t["value"]})
        return tt.group_by(["user_id", "win"]).aggregate(
            [("value", "sum"), ([], "count_all")]) \
            .rename_columns(["user_id", "win", "sum_value", "n_events"])

    pre = ev.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    agg = pre.groupby(["user_id", "win"]).aggregate(
        Sum("sum_value", alias_name="sum_value"),
        Sum("n_events", alias_name="n_events"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "win": pc.cast(t["win"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_value": pa.array(round6(
                pc.cast(t["sum_value"], pa.float64()).to_numpy(
                    zero_copy_only=False))),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_WINDOW = """
SELECT user_id, CAST(floor(epoch(ts) / 300) AS BIGINT) AS win,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_window_sliding(sf_dir):
    """Sliding (hopping) windows — 600 s size, 300 s hop, so every
    event lands in exactly two windows: the per-batch combiner
    EXPLODES each event into its covering windows before the partial
    aggregate, then the same small groupby as the tumbling case. The
    fan-out happens inside the batch, so the shuffle still carries
    (user, window) partials, not the doubled event stream."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        h = pc.divide(pc.cast(t["ts"], pa.int64()), 300_000_000)
        tt = pa.concat_tables([
            pa.table({"user_id": t["user_id"],
                      "win": pc.subtract(h, o), "value": t["value"]})
            for o in (0, 1)])
        return tt.group_by(["user_id", "win"]).aggregate(
            [("value", "sum"), ([], "count_all")]) \
            .rename_columns(["user_id", "win", "sum_value", "n_events"])

    pre = ev.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    agg = pre.groupby(["user_id", "win"]).aggregate(
        Sum("sum_value", alias_name="sum_value"),
        Sum("n_events", alias_name="n_events"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "win": pc.cast(t["win"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_value": pa.array(round6(
                pc.cast(t["sum_value"], pa.float64()).to_numpy(
                    zero_copy_only=False))),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_WINDOW_SLIDING = """
WITH x AS (SELECT user_id, value,
                  CAST(floor(epoch(ts) / 300) AS BIGINT) AS h
           FROM events)
SELECT user_id, h - o AS win, count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM x, unnest([0, 1]) AS t(o)
GROUP BY 1, 2
"""


def q_events_quantiles(sf_dir):
    """Exact per-type order-statistic quantiles (percentile_disc
    semantics: sorted[ceil(q*n) - 1]) of the event value: one hash
    shuffle on event_type, per-group vectorised sort. For groups past
    node memory the same output comes from a per-batch value
    histogram + a tiny cumulative groupby (values are discrete);
    the sort form is the general-dtype path."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def qtile(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(np.float64))
        n = len(v)
        pick = lambda q: v[max(int(np.ceil(q * n)) - 1, 0)]
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n": np.array([n], np.int64),
            "p50": round6([pick(0.5)]),
            "p90": round6([pick(0.9)]),
            "p99": round6([pick(0.99)]),
        })

    return ev.groupby("event_type").map_groups(qtile,
                                               batch_format="pandas")


SQL_EVENTS_QUANTILES = """
SELECT event_type, count(*) AS n,
       round(percentile_disc(0.5) WITHIN GROUP (ORDER BY value), 6)
         AS p50,
       round(percentile_disc(0.9) WITHIN GROUP (ORDER BY value), 6)
         AS p90,
       round(percentile_disc(0.99) WITHIN GROUP (ORDER BY value), 6)
         AS p99
FROM events GROUP BY event_type
"""


def q_events_sessionize(sf_dir):
    """Session windows (30-min inactivity gap) per user: sorted
    ``map_groups`` over the user partition — the engine's
    streaming-window shape (ray_guide.md 'Streaming-shaped
    workloads')."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff().dt.total_seconds()
        new_s = (gap.isna() | (gap > 1800)).astype(np.int64)
        sess = new_s.cumsum()
        out = g.assign(session_id=sess).groupby("session_id").agg(
            session_start=("ts", "min"),
            n_events=("event_id", "count"),
            sum_value=("value", "sum")).reset_index()
        out["user_id"] = g["user_id"].iloc[0]
        out["sum_value"] = round6(out["sum_value"])
        out["n_events"] = out["n_events"].astype(np.int64)
        out["session_id"] = out["session_id"].astype(np.int64)
        return out[["user_id", "session_id", "session_start",
                    "n_events", "sum_value"]]

    return ev.groupby("user_id").map_groups(sessions,
                                            batch_format="pandas")


SQL_EVENTS_SESSIONIZE = """
WITH x AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
y AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM x
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       min(ts) AS session_start, count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM y GROUP BY user_id, session_id
"""


def _events(sf_dir, columns):
    return rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=list(columns))


def _events_of_type(sf_dir, etype):
    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"], etype)
        return t.filter(m).select(["event_id", "user_id", "ts"])

    return ev.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_events_asof(sf_dir):
    """As-of join: each click matched to the user's most recent view
    at or before it (ties on the timestamp -> largest view id). One
    hash shuffle on user_id + per-group searchsorted
    (``stages/joins.asof_join``); gap reported in whole microseconds
    so the comparison is float-free."""
    from ..stages.joins import asof_join
    clicks = _events_of_type(sf_dir, "click")
    views = _events_of_type(sf_dir, "view")
    out = asof_join(clicks, views, by="user_id", on="ts",
                    left_id="event_id", right_id="event_id",
                    right_out="prev_view_id")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "prev_view_id": pc.cast(t["prev_view_id"], pa.int64()),
            "gap_us": pc.cast(t["gap_us"], pa.int64()),
        })
    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_ASOF = """
WITH c AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click'),
v AS (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'view'),
j AS (SELECT c.event_id AS event_id, v.event_id AS prev_view_id,
             date_diff('microsecond', v.ts, c.ts) AS gap_us,
             row_number() OVER (PARTITION BY c.event_id
                                ORDER BY v.ts DESC, v.event_id DESC)
               AS rn
      FROM c JOIN v ON v.user_id = c.user_id AND v.ts <= c.ts)
SELECT event_id, prev_view_id, gap_us FROM j WHERE rn = 1
"""


def q_events_range_join(sf_dir):
    """Preceding-interval join: per error event, how many events the
    same user produced in the strict 5 minutes before it (0 kept)."""
    from ..stages.joins import range_join_count
    errors = _events_of_type(sf_dir, "error")
    allev = _events(sf_dir, ["event_id", "user_id", "ts"])
    out = range_join_count(errors, allev, by="user_id", on="ts",
                           left_id="event_id", right_id="event_id",
                           window_us=300_000_000)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "n_in_range": pc.cast(t["n_in_range"], pa.int64()),
        })
    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_RANGE_JOIN = """
WITH er AS (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'error')
SELECT er.event_id AS event_id, count(e2.event_id) AS n_in_range
FROM er LEFT JOIN events e2
  ON e2.user_id = er.user_id
 AND e2.ts < er.ts
 AND e2.ts >= er.ts - INTERVAL 5 MINUTE
GROUP BY er.event_id
"""


def q_events_props_json(sf_dir):
    """JSON property extraction from the events ``props`` column (the
    engine's parser-stage shape on semi-structured payloads): per
    event_type, sum and count of ``$.k``."""
    import json

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        ks = np.fromiter((json.loads(p)["k"]
                          for p in t["props"].to_pylist()),
                         dtype=np.int64, count=t.num_rows)
        tt = pa.table({"event_type": t["event_type"],
                       "k": pa.array(ks)})
        return tt.group_by(["event_type"]).aggregate(
            [("k", "sum"), ([], "count_all")]) \
            .rename_columns(["event_type", "sum_k", "n"])

    pre = ev.map_batches(extract, batch_format="pyarrow",
                         zero_copy_batch=True)
    agg = pre.groupby("event_type").aggregate(
        Sum("sum_k", alias_name="sum_k"), Sum("n", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "sum_k": pc.cast(t["sum_k"], pa.int64()),
            "n": pc.cast(t["n"], pa.int64()),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_PROPS_JSON = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


# ======================================================================
# Registry
# ======================================================================
def q_events_graph_diff(sf_dir):
    """Temporal graph churn: the distinct user-transition edge sets
    of the event stream's two halves (split at the midpoint event_id
    = (min+max)//2, a data-derived constant both engines compute
    identically), reported as retained/added/removed counts plus
    edge-set Jaccard. One user_id shuffle builds both halves' pairs
    (half flag rides along); the distinct edge space is bounded by
    |types|^2 so the set compare is a driver-side table op."""
    ev = _events(sf_dir, ["user_id", "ts", "event_type", "event_id"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        out = []
        for h in (0, 1):
            a = g.loc[g["half"] == h, "event_type"].to_numpy()
            out.append(pd.DataFrame({
                "from_type": a[:-1], "to_type": a[1:],
                "half": np.full(max(len(a) - 1, 0), h,
                                dtype=np.int64)}))
        return pd.concat(out, ignore_index=True)

    lo = int(ev.min("event_id"))
    hi = int(ev.max("event_id"))
    mid = (lo + hi) // 2

    def with_half(t: pa.Table) -> pa.Table:
        half = pc.cast(pc.greater(t["event_id"], mid), pa.int64())
        return t.append_column("half", half)

    tagged = ev.map_batches(with_half, batch_format="pyarrow",
                            zero_copy_batch=True)
    dist = tagged.groupby("user_id").map_groups(
        pairs, batch_format="pandas") \
        .groupby(["from_type", "to_type", "half"]).aggregate(
            Count(alias_name="n")).to_pandas()
    e0 = set(map(tuple, dist.loc[dist["half"] == 0,
                                 ["from_type", "to_type"]].values))
    e1 = set(map(tuple, dist.loc[dist["half"] == 1,
                                 ["from_type", "to_type"]].values))
    inter, union = len(e0 & e1), len(e0 | e1)
    return pa.table({
        "n_retained": pa.array([inter], pa.int64()),
        "n_added": pa.array([len(e1 - e0)], pa.int64()),
        "n_removed": pa.array([len(e0 - e1)], pa.int64()),
        "jaccard": pa.array(round6([inter / union if union else 0.0])),
    })


SQL_EVENTS_GRAPH_DIFF = """
WITH mid AS (SELECT (min(event_id) + max(event_id)) // 2 AS m
             FROM events),
seq AS (
  SELECT e.event_type AS a,
         lead(e.event_type) OVER (
           PARTITION BY e.user_id, (e.event_id > mid.m)
           ORDER BY e.ts, e.event_id) AS b,
         CAST(e.event_id > mid.m AS BIGINT) AS half
  FROM events e CROSS JOIN mid),
ed AS (SELECT DISTINCT a, b, half FROM seq WHERE b IS NOT NULL),
e0 AS (SELECT a, b FROM ed WHERE half = 0),
e1 AS (SELECT a, b FROM ed WHERE half = 1),
i AS (SELECT count(*) AS n FROM e0 JOIN e1 USING (a, b)),
c0 AS (SELECT count(*) AS n FROM e0),
c1 AS (SELECT count(*) AS n FROM e1)
SELECT CAST(i.n AS BIGINT) AS n_retained,
       CAST(c1.n - i.n AS BIGINT) AS n_added,
       CAST(c0.n - i.n AS BIGINT) AS n_removed,
       round(CAST(i.n AS DOUBLE) / nullif(c0.n + c1.n - i.n, 0),
             6) AS jaccard
FROM i, c0, c1
"""


PATHS_TOPK = 10


def q_events_paths_topk(sf_dir):
    """Frequent 3-step event-type paths (clickstream path mining):
    per-user (ts, event_id)-ordered trigrams, counted over the tiny
    type^3 space, global top-10 with a total (n desc, path asc)
    order. One user_id shuffle + one bounded groupby."""
    ev = _events(sf_dir, ["user_id", "ts", "event_type", "event_id"])

    def tri(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        a = g["event_type"].to_numpy()
        return pd.DataFrame({"s1": a[:-2], "s2": a[1:-1],
                             "s3": a[2:]})

    paths = ev.groupby("user_id").map_groups(tri,
                                             batch_format="pandas")
    agg = paths.groupby(["s1", "s2", "s3"]).aggregate(
        Count(alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:  # dataless shuffle partition
            return pa.table({"s1": pa.array([], pa.string()),
                             "s2": pa.array([], pa.string()),
                             "s3": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "s1": pc.cast(t["s1"], pa.string()),
            "s2": pc.cast(t["s2"], pa.string()),
            "s3": pc.cast(t["s3"], pa.string()),
            "n": pc.cast(t["n"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort(["n", "s1", "s2", "s3"],
              descending=[True, False, False, False]) \
        .limit(PATHS_TOPK)


SQL_EVENTS_PATHS_TOPK = f"""
WITH s AS (
  SELECT event_type AS s1,
         lead(event_type, 1) OVER w AS s2,
         lead(event_type, 2) OVER w AS s3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
FROM s WHERE s3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, s1, s2, s3 LIMIT {PATHS_TOPK}
"""


def q_events_transitions(sf_dir):
    """Event-type Markov transitions: per-user event sequences
    ordered by (ts, event_id), bigram counts over consecutive events.
    One hash shuffle on user_id (``groupby.map_groups``), then a tiny
    groupby over the type-pair space."""
    ev = _events(sf_dir, ["user_id", "ts", "event_type", "event_id"])

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        a = g["event_type"].to_numpy()
        return pd.DataFrame({"from_type": a[:-1], "to_type": a[1:]})

    pairs = ev.groupby("user_id").map_groups(trans,
                                             batch_format="pandas")
    agg = pairs.groupby(["from_type", "to_type"]).aggregate(
        Count(alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "from_type": pc.cast(t["from_type"], pa.string()),
            "to_type": pc.cast(t["to_type"], pa.string()),
            "n": pc.cast(t["n"], pa.int64()),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_TRANSITIONS = """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
"""


def q_events_window_hll(sf_dir):
    """Approximate distinct users per tumbling 1-hour window: the
    same mergeable 64-register HLL as ``hll_parts_per_supplier``
    keyed by the window start (epoch_us // 3.6e9). Per-batch
    partials keep the shuffle at 64 rows per window regardless of
    event volume — the streaming cardinality pattern."""
    from ..stages import sketch as sk
    ev = _events(sf_dir, ["ts", "user_id"])

    def wk(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        return pa.table({
            "wkey": pa.array((ts // 3_600_000_000).astype(np.int64)),
            "user_id": t["user_id"],
        })

    keyed = ev.map_batches(wk, batch_format="pyarrow",
                           zero_copy_batch=True)
    est = sk.hll_count_distinct(keyed, "wkey", "user_id")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_h": pc.cast(t["key"], pa.int64()),
            "hll_est": pa.array(round6(
                t["hll_est"].to_numpy(zero_copy_only=False))),
        })
    return est.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_WINDOW_HLL = """
WITH d AS (SELECT DISTINCT epoch_us(ts) // 3600000000 AS window_h,
                           user_id
           FROM events),
h AS (SELECT window_h,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
               ::UBIGINT AS h
      FROM d),
b AS (SELECT window_h, CAST(h >> 26 AS BIGINT) AS bucket,
             CAST(h % 67108864 AS BIGINT) AS rem
      FROM h),
b2 AS (SELECT window_h, bucket,
              CASE WHEN rem = 0 THEN 27
                   ELSE 26 - (SELECT max(kk)
                              FROM generate_series(0, 26) g(kk)
                              WHERE rem >= (CAST(1 AS BIGINT) << kk))
              END AS rho
       FROM b),
r AS (SELECT window_h, bucket, max(rho) AS rho
      FROM b2 GROUP BY 1, 2),
agg AS (SELECT window_h, 64 - count(*) AS v_empty,
               sum(CAST(1 AS BIGINT) << (27 - rho))
                 + (64 - count(*)) * 134217728 AS s_int
        FROM r GROUP BY 1)
SELECT CAST(window_h AS BIGINT) AS window_h,
       round(CASE WHEN ((0.7213 / (1 + 1.079 / 64)) * 64 * 64)
                       / (s_int / 134217728.0) <= 160.0
                       AND v_empty > 0
                  THEN 64 * ln(64.0 / v_empty)
                  ELSE ((0.7213 / (1 + 1.079 / 64)) * 64 * 64)
                       / (s_int / 134217728.0)
             END, 6) AS hll_est
FROM agg
"""


QBIN_SCALE = 16


def q_events_quantiles_approx(sf_dir):
    """Streaming approximate quantiles via a fixed-bin histogram
    sketch (bin = floor(value * 16)): per-batch integer bin counts,
    one tiny (type, bin) groupby, cumulative pick of the first bin
    whose running count reaches ceil(q * n). All-integer decisions —
    deterministic, mergeable, O(bins) state per group at any corpus
    size (the exact-sort path is ``events_quantiles``). Reported
    value = bin upper edge (bin + 1) / 16."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        b = np.floor(t["value"].to_numpy() * QBIN_SCALE).astype(np.int64)
        tt = pa.table({"event_type": t["event_type"],
                       "bin": pa.array(b)})
        return tt.group_by(["event_type", "bin"]).aggregate(
            [([], "count_all")]) \
            .rename_columns(["event_type", "bin", "n"])

    hist = ev.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["event_type", "bin"]).aggregate(
            Sum("n", alias_name="n"))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bin")
        bins = g["bin"].to_numpy(np.int64)
        cum = g["n"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])

        def q_at(q):
            target = int(np.ceil(q * n))
            return (bins[np.searchsorted(cum, target)] + 1) / QBIN_SCALE
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n": np.array([n], np.int64),
            "p50": round6([q_at(0.5)]),
            "p90": round6([q_at(0.9)]),
            "p99": round6([q_at(0.99)]),
        })

    return hist.groupby("event_type").map_groups(pick,
                                                 batch_format="pandas")


SQL_EVENTS_QUANTILES_APPROX = f"""
WITH h AS (SELECT event_type,
                  CAST(floor(value * {QBIN_SCALE}) AS BIGINT) AS bin,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
c AS (SELECT event_type, bin, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS total
      FROM h)
SELECT event_type, CAST(max(total) AS BIGINT) AS n,
       round((min(CASE WHEN cum >= ceil(0.5 * total) THEN bin END) + 1)
             / {QBIN_SCALE}.0, 6) AS p50,
       round((min(CASE WHEN cum >= ceil(0.9 * total) THEN bin END) + 1)
             / {QBIN_SCALE}.0, 6) AS p90,
       round((min(CASE WHEN cum >= ceil(0.99 * total) THEN bin END) + 1)
             / {QBIN_SCALE}.0, 6) AS p99
FROM c GROUP BY event_type
"""


FUNNEL_WINDOW_H = 72


def q_events_funnel(sf_dir):
    """Ordered-sequence funnel: per user, first 'view', then the
    first 'click' within 72 h of it, then any 'purchase' within 72 h
    of that click (order = strictly increasing (ts, event_id)). One
    user_id hash shuffle; the per-group check is a vectorised
    running-stage scan. Output = users per deepest stage (0-3)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    stages = ("view", "click", "purchase")
    win = np.timedelta64(FUNNEL_WINDOW_H, "h")

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        et = g["event_type"].to_numpy()
        ts = g["ts"].to_numpy()
        stage, deadline = 0, None
        for s in stages:
            ok = et == s
            if deadline is not None:
                ok &= ts <= deadline
            hit = np.flatnonzero(ok)
            if len(hit) == 0:
                break
            stage += 1
            deadline = ts[hit[0]] + win
            et, ts = et[hit[0] + 1:], ts[hit[0] + 1:]
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "stage": np.array([stage], np.int64)})

    per_user = ev.groupby("user_id").map_groups(funnel,
                                                batch_format="pandas")

    def agg(t: pa.Table) -> pa.Table:
        return t.group_by("stage").aggregate([([], "count_all")]) \
            .rename_columns(["stage", "n_users"])

    return per_user.map_batches(agg, batch_format="pyarrow") \
        .groupby("stage").aggregate(Sum("n_users",
                                        alias_name="n_users")) \
        .map_batches(lambda t: pa.table({
            "stage": pc.cast(t["stage"], pa.int64()),
            "n_users": pc.cast(t["n_users"], pa.int64())}),
            batch_format="pyarrow")


SQL_EVENTS_FUNNEL = """
WITH v AS (SELECT user_id,
                  min(CASE WHEN event_type = 'view'
                      THEN (ts, event_id) END) AS k1
           FROM events GROUP BY user_id),
c AS (SELECT ev.user_id,
             min(CASE WHEN event_type = 'click'
                  AND (ev.ts, ev.event_id) > v.k1
                  AND ev.ts <= v.k1[1] + INTERVAL 72 HOUR
                 THEN (ev.ts, ev.event_id) END) AS k2
      FROM events ev JOIN v USING (user_id)
      WHERE v.k1 IS NOT NULL GROUP BY ev.user_id),
p AS (SELECT ev.user_id,
             count(CASE WHEN event_type = 'purchase'
                    AND (ev.ts, ev.event_id) > c.k2
                    AND ev.ts <= c.k2[1] + INTERVAL 72 HOUR
                   THEN 1 END) AS np
      FROM events ev JOIN c USING (user_id)
      WHERE c.k2 IS NOT NULL GROUP BY ev.user_id),
stages AS (
  SELECT v.user_id,
         CASE WHEN v.k1 IS NULL THEN 0
              WHEN c.k2 IS NULL THEN 1
              WHEN COALESCE(p.np, 0) = 0 THEN 2
              ELSE 3 END AS stage
  FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id))
SELECT stage, count(*) AS n_users FROM stages GROUP BY stage
"""


WEEK_US = 604_800 * 1_000_000


def q_cohort_retention(sf_dir):
    """Cohort retention: users grouped by first-seen week; for each
    (cohort_week, week_offset) the count of users active that week.
    One user_id hash shuffle; each group emits its (cohort, offset)
    pairs, then a tiny second groupby counts — the event stream never
    shuffles twice."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        w = np.unique(g["ts"].to_numpy().astype("datetime64[us]")
                      .astype(np.int64) // WEEK_US)
        return pd.DataFrame({"cohort_week": np.full(len(w), w[0]),
                             "week_offset": w - w[0]})

    pairs = ev.groupby("user_id").map_groups(per_user,
                                             batch_format="pandas")

    def pre(t: pa.Table) -> pa.Table:
        return t.group_by(["cohort_week", "week_offset"]).aggregate(
            [([], "count_all")]) \
            .rename_columns(["cohort_week", "week_offset", "n_users"])

    return pairs.map_batches(pre, batch_format="pyarrow") \
        .groupby(["cohort_week", "week_offset"]).aggregate(
            Sum("n_users", alias_name="n_users")) \
        .map_batches(lambda t: pa.table({
            "cohort_week": pc.cast(t["cohort_week"], pa.int64()),
            "week_offset": pc.cast(t["week_offset"], pa.int64()),
            "n_users": pc.cast(t["n_users"], pa.int64())}),
            batch_format="pyarrow")


SQL_COHORT_RETENTION = """
WITH u AS (SELECT user_id,
                  CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cw
           FROM events GROUP BY user_id),
act AS (SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 604800) AS BIGINT) AS w
        FROM events)
SELECT u.cw AS cohort_week, act.w - u.cw AS week_offset,
       count(*) AS n_users
FROM act JOIN u USING (user_id) GROUP BY 1, 2
"""


def q_events_moving_avg(sf_dir):
    """Moving average window (ROWS 2 PRECEDING .. CURRENT) of the
    event value per user ordered by (ts, event_id): one user shuffle,
    per-group shifted adds in the SQL frame's summation order
    ((x[i-2] + x[i-1]) + x[i]) so the float result is bit-identical
    to the window oracle."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "value"])

    def mavg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        x = g["value"].to_numpy(np.float64)
        n = len(x)
        s = x.copy()
        cnt = np.ones(n)
        if n > 1:
            s[1:] = x[:-1] + x[1:]          # (x[i-1]) + x[i]
            cnt[1:] = 2
        if n > 2:
            s[2:] = (x[:-2] + x[1:-1]) + x[2:]
            cnt[2:] = 3
        return pd.DataFrame({
            "event_id": g["event_id"],
            "mavg": round6(s / cnt),
        })

    return ev.groupby("user_id").map_groups(mavg,
                                            batch_format="pandas")


SQL_EVENTS_MOVING_AVG = """
SELECT event_id,
       round(avg(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING
                                   AND CURRENT ROW), 6) AS mavg
FROM events
"""


def q_events_cumsum(sf_dir):
    """Running total per user ordered by (ts, event_id) — the
    UNBOUNDED-PRECEDING window frame: one user shuffle, per-group
    sequential accumulate in the oracle's running-add order."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "value"])

    def csum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        x = g["value"].to_numpy(np.float64)
        return pd.DataFrame({
            "event_id": g["event_id"],
            "running_total": round6(np.add.accumulate(x)),
        })

    return ev.groupby("user_id").map_groups(csum,
                                            batch_format="pandas")


SQL_EVENTS_CUMSUM = """
SELECT event_id,
       round(sum(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW), 6)
         AS running_total
FROM events
"""


def q_events_window_streaming(sf_dir):
    """STREAMING form of ``events_window``: the (ts, event_id)-sorted
    event stream pumps through a watermarking window-actor pool that
    emits each window the moment the stream passes it (state = open
    windows only). Same aggregate, same SQL oracle — the driver
    verifies the streaming path produces the batch answer."""
    from ..stages.streaming import streaming_window_counts
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "value"])
    t = streaming_window_counts(ev)
    return pa.table({
        "user_id": t["user_id"],
        "win": t["win"],
        "n_events": t["n_events"],
        "sum_value": pa.array(round6(
            t["raw_sum"].to_numpy(zero_copy_only=False))),
    })


def q_events_median_cont(sf_dir):
    """Interpolated (percentile_cont) median of the event value per
    type: one event_type hash shuffle, per-group vectorised sort, and
    the explicit interpolation v[lo] + (pos-lo)*(v[hi]-v[lo]) — the
    SQL oracle writes the SAME window-function expression (not
    DuckDB's quantile_cont internals) so both sides evaluate identical
    IEEE operations."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(np.float64))
        n = len(v)
        pos = (n - 1) * 0.5
        lo = int(np.floor(pos))
        hi = min(lo + 1, n - 1)
        m = v[lo] + (pos - lo) * (v[hi] - v[lo])
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n": np.array([n], np.int64),
            "median_cont": round6([m]),
        })

    return ev.groupby("event_type").map_groups(med,
                                               batch_format="pandas")


SQL_EVENTS_MEDIAN_CONT = """
WITH o AS (SELECT event_type, value,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value) - 1 AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM events),
pos AS (SELECT event_type, n,
               (n - 1) * 0.5 AS p,
               CAST(floor((n - 1) * 0.5) AS BIGINT) AS lo,
               least(CAST(floor((n - 1) * 0.5) AS BIGINT) + 1,
                     n - 1) AS hi
        FROM (SELECT DISTINCT event_type, n FROM o)),
l AS (SELECT o.event_type, o.value AS lv, pos.p, pos.lo, pos.n
      FROM o JOIN pos ON o.event_type = pos.event_type
                     AND o.rn = pos.lo),
u AS (SELECT o.event_type, o.value AS uv
      FROM o JOIN pos ON o.event_type = pos.event_type
                     AND o.rn = pos.hi)
SELECT l.event_type, CAST(l.n AS BIGINT) AS n,
       round(l.lv + (l.p - l.lo) * (u.uv - l.lv), 6) AS median_cont
FROM l JOIN u ON l.event_type = u.event_type
"""


def q_events_drift(sf_dir):
    """Distribution-drift table: weekly observed event-type counts vs
    the expectation under the whole-corpus type mix — the training-
    data freshness/drift audit. All counts integers; the expectation
    week_total*type_total/T is the single float op per cell (no
    order-dependent float sums)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def pre(t: pa.Table) -> pa.Table:
        iso = pc.iso_week(t["ts"])
        tt = pa.table({"event_type": t["event_type"],
                       "week": pc.cast(iso, pa.int64())})
        return tt.group_by(["event_type", "week"]).aggregate(
            [([], "count_all")]).rename_columns(
                ["event_type", "week", "o"])

    agg = ev.map_batches(pre, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["event_type", "week"]).aggregate(
            Sum("o", alias_name="o")).to_pandas()
    o = agg["o"].to_numpy(np.int64)
    wk_tot = agg.groupby("week")["o"].transform("sum") \
        .to_numpy(np.int64)
    ty_tot = agg.groupby("event_type")["o"].transform("sum") \
        .to_numpy(np.int64)
    total = int(o.sum())
    return pa.table({
        "event_type": pa.array(agg["event_type"], pa.string()),
        "week": pa.array(agg["week"].to_numpy(np.int64)),
        "o": pa.array(o),
        "expected": pa.array(round6(wk_tot * ty_tot / total)),
    })


SQL_EVENTS_DRIFT = """
WITH c AS (SELECT event_type, CAST(weekofyear(ts) AS BIGINT) AS week,
                  count(*) AS o
           FROM events GROUP BY 1, 2),
wk AS (SELECT week, sum(o) AS wt FROM c GROUP BY 1),
ty AS (SELECT event_type, sum(o) AS tt FROM c GROUP BY 1),
tot AS (SELECT sum(o) AS t FROM c)
SELECT c.event_type, c.week, CAST(c.o AS BIGINT) AS o,
       round(wk.wt * ty.tt / tot.t, 6) AS expected
FROM c JOIN wk ON wk.week = c.week
       JOIN ty ON ty.event_type = c.event_type
       CROSS JOIN tot
"""


SAMPLE_PER_USER_K = 3


def q_events_sample_per_user(sf_dir):
    """Deterministic per-group reservoir sample: for every user keep
    the K=3 events with the smallest md5(event_id) — the
    hash-as-priority form of uniform-without-replacement group
    sampling that needs no RNG state and is reproducible across
    engines and reruns. Per-batch pre-prune (<= K rows per user leave
    each batch) then ONE user shuffle and a vectorised per-group
    selection."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id"])

    def prune(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        h = tx.hash_tokens(eid.astype(str)).astype(np.uint64)
        order = np.lexsort((h, uid))
        uid_s, eid_s, h_s = uid[order], eid[order], h[order]
        starts = np.r_[True, uid_s[1:] != uid_s[:-1]]
        grp = np.cumsum(starts) - 1
        first = np.flatnonzero(starts)
        rank = np.arange(len(uid_s)) - first[grp]
        keep = rank < SAMPLE_PER_USER_K
        return pa.table({"user_id": pa.array(uid_s[keep]),
                         "event_id": pa.array(eid_s[keep])})

    pruned = ev.map_batches(prune, batch_format="pyarrow",
                            zero_copy_batch=True)

    def select(g: pd.DataFrame) -> pd.DataFrame:
        eid = g["event_id"].to_numpy()
        h = tx.hash_tokens(eid.astype(str)).astype(np.uint64)
        top = np.argsort(h)[:SAMPLE_PER_USER_K]
        return pd.DataFrame({"user_id": g["user_id"].to_numpy()[top],
                             "event_id": eid[top]})

    return pruned.groupby("user_id").map_groups(
        select, batch_format="pandas")


SQL_EVENTS_SAMPLE_PER_USER = f"""
SELECT user_id, event_id FROM (
  SELECT user_id, event_id,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                    1, 16))::UBIGINT) AS rn
  FROM events)
WHERE rn <= {SAMPLE_PER_USER_K}
"""

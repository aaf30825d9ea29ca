"""Join / pivot / whole-history aggregate queries (reference J/M/A-class).

  join_enrich   J5/S3-style broadcast dimension join: orders enriched with
                customer -> nation, revenue per nation. The small side is
                put in the object store ONCE (ray.put) and read per actor,
                never shuffled — the reference fetched its dim table by
                URL inside a map (`player_game.py:51`), the anti-pattern
                this replaces.
  pivot_roles   M13/J6 affix algebra: the per-(day, conv) long role table
                pivoted to role-prefixed wide columns + a home/away-style
                difference column (`df_rename_dif`/`df_rename_pivot`,
                SURVEY §2.2 M13).
  agg_career    A11 whole-history (weekly=False) aggregate: per-entity
                sums with ratio metrics RECOMPUTED from summed numerators/
                denominators (`player_game.py:675-682`), not averaged.
  topk_convs    O4-style top-k by aggregate with pinned tie-break.
"""

from __future__ import annotations

import numpy as np
from nfl_feature_store_ray.functions.rounding import round_half_away
import pandas as pd
import ray

from nfl_feature_store_ray.sources.readers import read_table
from nfl_feature_store_ray.sources.transcripts import (
    TRANSCRIPTS_FROM_EVENTS_SQL,
    transcripts_from_events,
)
from nfl_feature_store_ray.stages.bucketize import map_conv_buckets

_T = f"WITH t AS ({TRANSCRIPTS_FROM_EVENTS_SQL})"


def _round(df, cols, nd=4):
    for c in cols:
        df[c] = round_half_away(df[c].astype("float64"), nd)
    return df


# ---------------------------------------------------------------------------
# broadcast dimension join
# ---------------------------------------------------------------------------
def q_join_enrich(sf_dir: str):
    # small side loaded once on the driver, broadcast via the object store
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "n_name"]
    ]
    dim_ref = ray.put(dim)

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    class Enrich:
        def __init__(self):
            self.dim = ray.get(dim_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = df.merge(self.dim, left_on="o_custkey", right_on="c_custkey", how="left")
            g = m.groupby("n_name", as_index=False).agg(
                total_revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size")
            )
            return g

    partials = orders.map_batches(Enrich, batch_format="pandas", concurrency=(1, 4))

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("n_name", as_index=False).sum()
        g["n_orders"] = g["n_orders"].astype("int64")
        return _round(g, ["total_revenue"])

    return map_conv_buckets(partials, final, key="n_name", sort_cols=["n_name"], num_buckets=8)


SQL_JOIN_ENRICH = """
SELECT n.n_name,
       ROUND(SUM(o.o_totalprice), 4) AS total_revenue,
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


# ---------------------------------------------------------------------------
# role pivot + difference (affix algebra)
# ---------------------------------------------------------------------------
def q_pivot_roles(sf_dir: str):
    ts = transcripts_from_events(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["day"] = df["ts"].dt.floor("D")
        for r in ("user", "assistant", "tool"):
            df[f"{r}_value"] = df["value"].where(df["role"] == r, 0.0)
        return df.groupby(["day", "conv_id"], as_index=False)[
            ["user_value", "assistant_value", "tool_value"]
        ].sum()

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(["day", "conv_id"], as_index=False)[
            ["user_value", "assistant_value", "tool_value"]
        ].sum()
        g["user_minus_assistant"] = g["user_value"] - g["assistant_value"]
        g["day"] = g["day"].astype("datetime64[us]")
        return _round(
            g, ["user_value", "assistant_value", "tool_value", "user_minus_assistant"], 6
        )

    partials = ts.map_batches(partial, batch_format="pandas")
    return map_conv_buckets(
        partials, final, key=["day", "conv_id"], sort_cols=["day", "conv_id"], num_buckets=32
    )


SQL_PIVOT_ROLES = f"""{_T}
SELECT date_trunc('day', ts) AS day, conv_id,
       ROUND(SUM(CASE WHEN role = 'user' THEN value ELSE 0 END), 6) AS user_value,
       ROUND(SUM(CASE WHEN role = 'assistant' THEN value ELSE 0 END), 6) AS assistant_value,
       ROUND(SUM(CASE WHEN role = 'tool' THEN value ELSE 0 END), 6) AS tool_value,
       ROUND(SUM(CASE WHEN role = 'user' THEN value ELSE 0 END)
             - SUM(CASE WHEN role = 'assistant' THEN value ELSE 0 END), 6)
         AS user_minus_assistant
FROM t GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# whole-history (career) aggregate with recomputed ratios
# ---------------------------------------------------------------------------
def q_agg_career(sf_dir: str):
    ts = transcripts_from_events(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["n_tool"] = (df["role"] == "tool").astype("int64")
        df["n_turns"] = 1
        # exact integer cents (schemas.QUANT_SCALE): partial sums are
        # order-independent, so ratio ties round identically to the oracle
        df["vc"] = np.rint(df["value"].to_numpy() * 100.0)
        return df.groupby("conv_id", as_index=False).agg(
            total_c=("vc", "sum"), n_turns=("n_turns", "sum"), n_tool=("n_tool", "sum")
        )

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("conv_id", as_index=False).sum()
        # ratio metrics from summed numerators/denominators (A11 semantics)
        g["total_value"] = g["total_c"] / 100.0
        g["value_per_turn"] = g["total_c"] / (100.0 * g["n_turns"])
        g["tool_rate"] = g["n_tool"] / g["n_turns"]
        g["n_turns"] = g["n_turns"].astype("int64")
        g["n_tool"] = g["n_tool"].astype("int64")
        g = g.drop(columns=["total_c"])
        return _round(g, ["total_value", "value_per_turn", "tool_rate"], 6)

    partials = ts.map_batches(partial, batch_format="pandas")
    return map_conv_buckets(partials, final, key="conv_id", sort_cols=["conv_id"])


# cents-exact sums (order-independent; see transcript_queries.SQL_EXPANDING)
SQL_AGG_CAREER = f"""{_T}
SELECT conv_id,
       ROUND(SUM(ROUND(value * 100)) / 100.0, 6) AS total_value,
       COUNT(*) AS n_turns,
       CAST(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool,
       ROUND(SUM(ROUND(value * 100)) / (100.0 * COUNT(*)), 6) AS value_per_turn,
       ROUND(SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6)
         AS tool_rate
FROM t GROUP BY conv_id
"""


# ---------------------------------------------------------------------------
# top-k by aggregate (pinned tie-break)
# ---------------------------------------------------------------------------
def q_topk_convs(sf_dir: str):
    totals = q_agg_career(sf_dir).map_batches(
        lambda df: df[["conv_id", "total_value"]], batch_format="pandas"
    )
    top = totals.sort(["total_value", "conv_id"], descending=[True, False]).limit(10)

    def add_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["total_value", "conv_id"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype="int32")
        return df

    return add_rank(top.to_pandas())


SQL_TOPK_CONVS = f"""{_T},
totals AS (SELECT conv_id, ROUND(SUM(value), 6) AS total_value FROM t GROUP BY conv_id)
SELECT conv_id, total_value,
       CAST(ROW_NUMBER() OVER (ORDER BY total_value DESC, conv_id ASC) AS INTEGER) AS rank
FROM totals ORDER BY total_value DESC, conv_id ASC LIMIT 10
"""


QUERIES = {
    "join_enrich": q_join_enrich,
    "pivot_roles": q_pivot_roles,
    "agg_career": q_agg_career,
    "topk_convs": q_topk_convs,
}

ORACLES = {
    "join_enrich": SQL_JOIN_ENRICH,
    "pivot_roles": SQL_PIVOT_ROLES,
    "agg_career": SQL_AGG_CAREER,
    "topk_convs": SQL_TOPK_CONVS,
}

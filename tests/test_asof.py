"""As-of join tests vs pandas merge_asof oracle."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def streams(spark):
    rng = np.random.default_rng(21)
    n = 2000
    pdf = pd.DataFrame(
        {
            "user_id": rng.integers(0, 50, n),
            "ts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
            "event_id": np.arange(n),
            "event_type": rng.choice(["click", "purchase"], n),
        }
    )
    # force an equal-timestamp tie pair: purchase and click at same instant
    pdf.loc[0, ["user_id", "ts", "event_type"]] = [99, pd.Timestamp("2026-01-02"), "purchase"]
    pdf.loc[1, ["user_id", "ts", "event_type"]] = [99, pd.Timestamp("2026-01-02"), "click"]
    return spark.createDataFrame(pdf), pdf


def _oracle(pdf):
    clicks = pdf[pdf.event_type == "click"].sort_values(["ts", "event_id"], kind="mergesort")
    buys = pdf[pdf.event_type == "purchase"].sort_values(["ts", "event_id"], kind="mergesort")
    m = pd.merge_asof(
        clicks,
        buys[["user_id", "ts", "event_id"]].rename(columns={"event_id": "asof_event_id"}),
        on="ts",
        by="user_id",
        direction="backward",  # includes equal ts; last among equal-ts rows
    )
    return {
        (int(r.user_id), int(r.event_id)): (None if pd.isna(r.asof_event_id) else int(r.asof_event_id))
        for r in m.itertuples()
    }


def test_asof_window_matches_merge_asof(spark, streams):
    from geomesa_spark.operators import asof

    df, pdf = streams
    clicks = df.filter(df.event_type == "click")
    buys = df.filter(df.event_type == "purchase")
    out = asof.asof_join(clicks, buys, on="ts", by="user_id")
    got = {
        (r["user_id"], r["event_id"]): r["asof_event_id"]
        for r in out.collect()
    }
    exp = _oracle(pdf)
    assert got == exp
    # the planted tie: click at identical ts sees the purchase
    tie_click = pdf.loc[1, "event_id"]
    assert got[(99, int(tie_click))] == int(pdf.loc[0, "event_id"])


def test_asof_grouped_matches_window(spark, streams):
    from geomesa_spark.operators import asof

    df, pdf = streams
    clicks = df.filter(df.event_type == "click")
    buys = df.filter(df.event_type == "purchase")
    w = asof.asof_join(clicks, buys, on="ts", by="user_id")
    g = asof.asof_join_grouped(clicks, buys, on="ts", by="user_id")
    wm = {(r["user_id"], r["event_id"]): r["asof_event_id"] for r in w.collect()}
    gm = {(r["user_id"], r["event_id"]): r["asof_event_id"] for r in g.collect()}
    assert wm == gm


def test_asof_tolerance(spark, streams):
    from geomesa_spark.operators import asof

    df, pdf = streams
    clicks = df.filter(df.event_type == "click")
    buys = df.filter(df.event_type == "purchase")
    g = asof.asof_join_grouped(clicks, buys, on="ts", by="user_id", tolerance_s=600)
    got = {(r["user_id"], r["event_id"]): r["asof_event_id"] for r in g.collect()}
    clicks_p = pdf[pdf.event_type == "click"].sort_values(["ts", "event_id"], kind="mergesort")
    buys_p = pdf[pdf.event_type == "purchase"].sort_values(["ts", "event_id"], kind="mergesort")
    m = pd.merge_asof(
        clicks_p,
        buys_p[["user_id", "ts", "event_id"]].rename(columns={"event_id": "asof_event_id"}),
        on="ts", by="user_id", direction="backward", tolerance=pd.Timedelta(seconds=600),
    )
    exp = {
        (int(r.user_id), int(r.event_id)): (None if pd.isna(r.asof_event_id) else int(r.asof_event_id))
        for r in m.itertuples()
    }
    assert got == exp

"""Property / brute-force tests for the round-11 statistics, time-series
and CF additions — each registry query checked against an independent
NumPy/pure-Python recomputation at sf0.001 (beyond the DuckDB oracle,
which shares the SQL formulation; these re-derive from first
principles)."""

from __future__ import annotations

import math

import numpy as np

from etl_challenge_localiza_spark.registry import QUERIES


def _run(spark, sf0001, name):
    return QUERIES[name].fn(spark, sf0001).collect()


def test_largest_remainder_sums_to_budget(spark, sf0001):
    rows = _run(spark, sf0001, "largest_remainder_alloc")
    assert len(rows) == 5
    assert sum(r["seats"] for r in rows) == 10000
    assert all(r["seats"] >= 0 for r in rows)


def test_pareto_frontier_is_exactly_the_nondominated_set(spark, sf0001):
    rows = _run(spark, sf0001, "pareto_frontier_parts")
    got = {r["p_partkey"] for r in rows}
    parts = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in spark.read.parquet(sf0001 + "/part.parquet").collect()
    ]
    expected = set()
    for k, pr, sz in parts:
        dominated = any(
            (pr2 <= pr and sz2 >= sz and (pr2 < pr or sz2 > sz))
            for _, pr2, sz2 in parts
        )
        if not dominated:
            expected.add(k)
    assert got == expected


def test_ks_statistic_matches_brute_force(spark, sf0001):
    row = _run(spark, sf0001, "ks_value_two_sample")[0]
    ev = spark.read.parquet(sf0001 + "/events.parquet").collect()
    a = sorted(r["value"] for r in ev if r["event_type"] == "purchase")
    b = sorted(r["value"] for r in ev if r["event_type"] == "click")
    grid = sorted(set(a) | set(b))
    n1, n2 = len(a), len(b)

    def cdf(xs, v):
        import bisect

        return bisect.bisect_right(xs, v)

    d = max(abs(cdf(a, v) * n2 - cdf(b, v) * n1) for v in grid)
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert abs(row["ks_d"] - d / (n1 * n2)) < 1e-6
    assert 0.0 <= row["ks_d"] <= 1.0


def test_ols_matches_numpy_polyfit(spark, sf0001):
    rows = _run(spark, sf0001, "ols_value_trend")
    ev = spark.read.parquet(sf0001 + "/events.parquet").collect()
    for r in rows:
        pts = [
            ((e["ts"].date() - __import__("datetime").date(2024, 1, 1)).days, e["value"])
            for e in ev
            if e["event_type"] == r["event_type"]
        ]
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([round(p[1], 2) for p in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(r["slope"] - slope) < 1e-6
        assert abs(r["intercept"] - intercept) < 1e-4
        assert -1e-9 <= r["r2"] <= 1.0 + 1e-9


def _daily_grid_np(spark, sf0001):
    orders = spark.read.parquet(sf0001 + "/orders.parquet").collect()
    from collections import defaultdict
    from datetime import timedelta

    per = defaultdict(float)
    for o in orders:
        per[o["o_orderdate"].date()] += o["o_totalprice"]
    d0, d1 = min(per), max(per)
    days = [(d0 + timedelta(days=i)) for i in range((d1 - d0).days + 1)]
    return np.array([round(per.get(d, 0.0), 2) for d in days]), days


def test_acf_matches_numpy(spark, sf0001):
    rows = {r["k"]: r["acf"] for r in _run(spark, sf0001, "acf_daily_revenue")}
    x, _ = _daily_grid_np(spark, sf0001)
    n, m = len(x), x.mean()
    den = ((x - m) ** 2).sum()
    for k in range(1, 8):
        ref = ((x[:-k] - m) * (x[k:] - m)).sum() / den
        assert abs(rows[k] - ref) < 1e-5
        assert -1.0 - 1e-9 <= rows[k] <= 1.0 + 1e-9


def test_cusum_peak_matches_numpy(spark, sf0001):
    row = _run(spark, sf0001, "cusum_changepoint_revenue")[0]
    x, days = _daily_grid_np(spark, sf0001)
    s = np.cumsum(x - x.mean())
    i = int(np.argmax(np.abs(s)))
    assert row["change_day"] == days[i].isoformat()
    assert abs(row["cusum_peak"] - abs(s[i])) < 0.5  # exact-decimal vs float
    assert row["direction"] == ("above" if s[i] > 0 else "below")


def test_copurchase_jaccard_values_are_exact(spark, sf0001):
    rows = _run(spark, sf0001, "copurchase_user_jaccard")
    li = spark.read.parquet(sf0001 + "/lineitem.parquet").collect()
    orders = {
        o["o_orderkey"]: o["o_custkey"]
        for o in spark.read.parquet(sf0001 + "/orders.parquet").collect()
    }
    from collections import defaultdict

    sets = defaultdict(set)
    for l in li:
        sets[orders[l["l_orderkey"]]].add(l["l_partkey"])
    assert len(rows) == 20
    prev = None
    for r in rows:
        a, b = sets[r["u1"]], sets[r["u2"]]
        inter = len(a & b)
        assert r["inter"] == inter  # verify stage is exact, not capped
        assert abs(r["jaccard"] - inter / len(a | b)) < 1e-6
        if prev is not None:
            assert r["jaccard"] <= prev + 1e-12  # descending
        prev = r["jaccard"]


def test_seasonal_naive_backtest_bounds(spark, sf0001):
    row = _run(spark, sf0001, "seasonal_naive_backtest")[0]
    assert row["n_days"] == 28
    assert row["mae"] >= 0 and row["wape"] >= 0
    assert 0.0 <= row["smape"] <= 2.0
    x, _ = _daily_grid_np(spark, sf0001)
    err = np.abs(x[-28:] - x[-35:-7])
    assert abs(row["mae"] - err.mean()) < 0.02
    assert abs(row["wape"] - err.sum() / x[-28:].sum()) < 1e-5


def test_infogain_split_matches_brute_force(spark, sf0001):
    rows = _run(spark, sf0001, "infogain_discount_split")
    li = spark.read.parquet(sf0001 + "/lineitem.parquet").collect()
    vals = sorted({l["l_discount"] for l in li})
    assert len(rows) == len(vals) - 1  # last threshold has empty right side
    n = len(li)
    p = sum(1 for l in li if l["l_returnflag"] == "R")

    def h(pos, tot):
        if pos == 0 or pos == tot:
            return 0.0
        q = pos / tot
        return -q * math.log(q) - (1 - q) * math.log(1 - q)

    for r in rows:
        left = [l for l in li if l["l_discount"] <= r["threshold"] + 1e-9]
        lp = sum(1 for l in left if l["l_returnflag"] == "R")
        nl = len(left)
        gain = h(p, n) - nl / n * h(lp, nl) - (n - nl) / n * h(p - lp, n - nl)
        assert r["n_left"] == nl and r["pos_left"] == lp
        assert abs(r["gain"] - gain) < 1e-6
        assert r["gain"] >= -1e-9  # info gain is non-negative


def test_mann_whitney_matches_brute_force(spark, sf0001):
    row = _run(spark, sf0001, "mann_whitney_value_test")[0]
    ev = spark.read.parquet(sf0001 + "/events.parquet").collect()
    a = [round(r["value"], 2) for r in ev if r["event_type"] == "purchase"]
    b = [round(r["value"], 2) for r in ev if r["event_type"] == "click"]
    pooled = sorted(a + b)
    # average ranks with ties
    from collections import Counter

    cnt = Counter(pooled)
    rank = {}
    pos = 1
    for v in sorted(cnt):
        t = cnt[v]
        rank[v] = pos + (t - 1) / 2.0
        pos += t
    r1 = sum(rank[v] for v in a)
    n1, n2, nn = len(a), len(b), len(pooled)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    ties = sum(t**3 - t for t in cnt.values())
    sigma = math.sqrt(n1 * n2 / 12.0 * ((nn + 1) - ties / (nn * (nn - 1.0))))
    z = (u1 - n1 * n2 / 2.0) / sigma
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["u1"] == int(u1)
    assert abs(row["z"] - z) < 1e-5


def test_welch_t_matches_numpy(spark, sf0001):
    row = _run(spark, sf0001, "welch_t_value_test")[0]
    ev = spark.read.parquet(sf0001 + "/events.parquet").collect()
    a = np.array([round(r["value"], 2) for r in ev if r["event_type"] == "purchase"])
    b = np.array([round(r["value"], 2) for r in ev if r["event_type"] == "click"])
    v1, v2 = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(v1 + v2)
    dfw = (v1 + v2) ** 2 / (v1**2 / (len(a) - 1) + v2**2 / (len(b) - 1))
    assert abs(row["mean_diff"] - (a.mean() - b.mean())) < 1e-3
    assert abs(row["t"] - t) < 1e-4
    assert abs(row["df_welch"] - dfw) < 0.01


def test_cuped_matches_numpy(spark, sf0001):
    row = _run(spark, sf0001, "cuped_variance_reduction")[0]
    ev = spark.read.parquet(sf0001 + "/events.parquet").collect()
    import datetime as dt
    from collections import defaultdict

    xs, ys = defaultdict(float), defaultdict(float)
    users = set()
    for r in ev:
        users.add(r["user_id"])
        if r["ts"].date() < dt.date(2024, 1, 16):
            xs[r["user_id"]] += round(r["value"], 2)
        else:
            ys[r["user_id"]] += round(r["value"], 2)
    u = sorted(users)
    x = np.array([xs[i] for i in u])
    y = np.array([ys[i] for i in u])
    theta = np.cov(x, y, ddof=1)[0, 1] / x.var(ddof=1)
    rho2 = np.corrcoef(x, y)[0, 1] ** 2
    assert row["n"] == len(u)
    assert abs(row["theta"] - theta) < 1e-4
    assert abs(row["rho2"] - rho2) < 1e-4
    assert abs(row["var_y_cuped"] - y.var(ddof=1) * (1 - rho2)) < 0.5
    # CUPED can only reduce variance
    assert row["var_y_cuped"] <= row["var_y"] + 1e-9


def test_segmented_trend_matches_numpy(spark, sf0001):
    rows = {r["segment"]: r for r in _run(spark, sf0001, "segmented_trend_at_changepoint")}
    x, _ = _daily_grid_np(spark, sf0001)
    s = np.cumsum(x - x.mean())
    istar = int(np.argmax(np.abs(s)))
    before, after = x[: istar + 1], x[istar + 1 :]
    ib, ia = np.arange(istar + 1), np.arange(istar + 1, len(x))
    for seg, xs, idx in [("before", before, ib), ("after", after, ia)]:
        slope = np.polyfit(idx.astype(float), xs, 1)[0]
        assert rows[seg]["n"] == len(xs)
        assert abs(rows[seg]["slope"] - slope) < 1e-2


def test_bootstrap_ci_brackets_the_point_mean(spark, sf0001):
    row = _run(spark, sf0001, "bootstrap_ci_mean")[0]
    orders = spark.read.parquet(sf0001 + "/orders.parquet").collect()
    mean = sum(round(o["o_totalprice"], 2) for o in orders) / len(orders)
    assert abs(row["point_mean"] - mean) < 0.01
    assert row["b_reps"] == 64
    # the CI must bracket the point estimate and be nondegenerate
    assert row["ci_lo"] <= row["point_mean"] <= row["ci_hi"]
    assert row["ci_lo"] < row["ci_hi"]
    # ±5 standard errors is a generous sanity envelope
    import statistics

    se = statistics.stdev(round(o["o_totalprice"], 2) for o in orders) / math.sqrt(
        len(orders)
    )
    assert row["point_mean"] - 5 * se < row["ci_lo"]
    assert row["ci_hi"] < row["point_mean"] + 5 * se


def test_permutation_test_bounds_and_determinism(spark, sf0001):
    row = _run(spark, sf0001, "permutation_test_mean_diff")[0]
    assert 0 <= row["n_extreme"] <= 64
    assert abs(row["p_value"] - (1 + row["n_extreme"]) / 65.0) < 1e-4
    # deterministic hash relabelings → identical result on a second run
    row2 = _run(spark, sf0001, "permutation_test_mean_diff")[0]
    assert row == row2


def test_markov_entropy_rate_matches_brute_force(spark, sf0001):
    rows = {r["from_type"]: r for r in _run(spark, sf0001, "markov_entropy_rate")}
    ev = sorted(
        spark.read.parquet(sf0001 + "/events.parquet").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    from collections import Counter, defaultdict

    trans = defaultdict(Counter)
    for a, b in zip(ev, ev[1:]):
        if a["user_id"] == b["user_id"]:
            trans[a["event_type"]][b["event_type"]] += 1
    nn = sum(sum(c.values()) for c in trans.values())
    for s, c in trans.items():
        n_s = sum(c.values())
        h = -sum((k / n_s) * math.log(k / n_s) for k in c.values())
        assert rows[s]["n_s"] == n_s
        assert abs(rows[s]["h_state"] - h) < 1e-5
        assert abs(rows[s]["contribution"] - (n_s / nn) * h) < 1e-5
        assert 0 <= rows[s]["h_state"] <= math.log(5) + 1e-9


def test_haar_energy_matches_numpy(spark, sf0001):
    from decimal import Decimal

    rows = {
        r["level"]: (r["n_pairs"], Decimal(r["energy32"]))
        for r in _run(spark, sf0001, "haar_energy_daily_revenue")
    }
    x, _ = _daily_grid_np(spark, sf0001)
    s = [Decimal(str(round(v, 2))) for v in x]
    for level in range(1, 6):
        pairs = len(s) // 2
        d = [s[2 * i] - s[2 * i + 1] for i in range(pairs)]
        s = [s[2 * i] + s[2 * i + 1] for i in range(pairs)]
        e32 = sum(v * v for v in d) * (2 ** (5 - level))
        n_pairs, got = rows[level]
        assert n_pairs == pairs
        assert got == e32.quantize(Decimal("0.0001"))
    # Parseval sanity: total orthonormal detail energy ≤ series energy
    tot_detail = sum(float(e) / 32.0 for _, e in rows.values())
    series_energy = float(sum(Decimal(str(round(v, 2))) ** 2 for v in x))
    assert tot_detail <= series_energy * (1 + 1e-9)

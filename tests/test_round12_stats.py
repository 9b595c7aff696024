"""First-principles checks for the round-12 registry additions —
NumPy/brute-force references beyond the shared-formulation DuckDB
oracle (the round-11 test_round11_stats.py pattern): the oracle proves
cross-engine agreement, these prove the MATH is the intended statistic.
"""

from __future__ import annotations

import math

import pytest

SF = "/root/testdata/sf0.001"


def _q(spark, name, sf=SF):
    from etl_challenge_localiza_spark.registry import QUERIES

    return QUERIES[name].fn(spark, sf)


def _events(spark, sf=SF):
    from etl_challenge_localiza_spark.sources.readers import load_table

    return load_table(spark, sf, "events")


def test_anova_matches_numpy(spark):
    import numpy as np

    rows = _events(spark).select("event_type", "value").collect()
    groups: dict[str, list[float]] = {}
    for r in rows:
        groups.setdefault(r["event_type"], []).append(float(r["value"]))
    allv = np.array([v for g in groups.values() for v in g])
    k, n = len(groups), len(allv)
    ssb = sum(len(g) * (np.mean(g) - allv.mean()) ** 2 for g in groups.values())
    ssw = sum(((np.array(g) - np.mean(g)) ** 2).sum() for g in groups.values())
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    out = _q(spark, "anova_value_by_type").first()
    assert out["k_groups"] == k and out["n_total"] == n
    # the engine rounds the per-group s²/n term at 6dp; tolerance covers it
    assert out["f_stat"] == pytest.approx(f_ref, rel=1e-4)
    assert out["eta_sq"] == pytest.approx(ssb / (ssb + ssw), rel=1e-4)


def test_mad_matches_numpy(spark):
    import numpy as np

    rows = _events(spark).select("event_type", "value").collect()
    groups: dict[str, list[float]] = {}
    for r in rows:
        groups.setdefault(r["event_type"], []).append(float(r["value"]))
    out = {r["event_type"]: r for r in _q(spark, "mad_event_values").collect()}
    for t, g in groups.items():
        med = float(np.median(g))
        mad = float(np.median(np.abs(np.array(g) - med)))
        assert out[t]["median_value"] == pytest.approx(med, abs=1e-6)
        assert out[t]["mad"] == pytest.approx(mad, abs=1e-6)
        n_out = int((np.abs(np.array(g) - med) > 3 * 1.4826 * mad).sum())
        assert out[t]["n_robust_outliers"] == n_out


def test_grubbs_matches_numpy(spark):
    import numpy as np

    rows = _events(spark).select("event_type", "value").collect()
    groups: dict[str, list[float]] = {}
    for r in rows:
        groups.setdefault(r["event_type"], []).append(float(r["value"]))
    out = {r["event_type"]: r for r in _q(spark, "grubbs_max_outlier").collect()}
    for t, g in groups.items():
        a = np.array(g)
        gref = float(np.max(np.abs(a - a.mean())) / a.std(ddof=1))
        assert out[t]["g_stat"] == pytest.approx(gref, rel=1e-6)


def test_cramers_v_matches_numpy(spark):
    import numpy as np

    rows = _events(spark).select("event_type", "ts").collect()
    from collections import Counter

    cells = Counter(
        (r["event_type"], r["ts"].hour // 6) for r in rows
    )
    types = sorted({k[0] for k in cells})
    parts = sorted({k[1] for k in cells})
    o = np.array([[cells.get((t, p), 0) for p in parts] for t in types], float)
    n = o.sum()
    e = o.sum(1)[:, None] * o.sum(0)[None, :] / n
    chi2 = float(((o - e) ** 2 / e).sum())
    v = math.sqrt(chi2 / (n * min(len(types) - 1, len(parts) - 1)))
    out = _q(spark, "cramers_v_type_daypart").first()
    assert out["chi2"] == pytest.approx(chi2, rel=1e-5)
    assert out["cramers_v"] == pytest.approx(v, rel=1e-5)


def _daily_grid_ref(spark, sf=SF):
    from pyspark.sql import functions as F

    from etl_challenge_localiza_spark.sources.readers import load_table

    orders = load_table(spark, sf, "orders")
    rows = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("r"))
        .collect()
    )
    by_day = {r["day"]: float(r["r"]) for r in rows}
    d0, d1 = min(by_day), max(by_day)
    import datetime

    days = (d1 - d0).days + 1
    return [by_day.get(d0 + datetime.timedelta(days=i), 0.0) for i in range(days)]


def test_seasonal_decomposition_matches_numpy(spark):
    import numpy as np

    x = np.array(_daily_grid_ref(spark))
    trend = np.convolve(x, np.ones(7) / 7.0, mode="valid")  # centered MA
    detr = x[3 : len(x) - 3] - trend
    phases = (np.arange(3, len(x) - 3)) % 7
    out = {r["phase"]: r for r in _q(spark, "seasonal_decomposition_daily").collect()}
    for p in range(7):
        ref = float(detr[phases == p].mean())
        assert out[p]["seasonal_index"] == pytest.approx(ref, abs=1e-4)
        assert out[p]["n_days"] == int((phases == p).sum())


def test_pacf_lag2_matches_numpy(spark):
    import numpy as np

    x = np.array(_daily_grid_ref(spark))
    n, m = len(x), x.mean()

    def r(k):
        return float(((x[:-k] - m) * (x[k:] - m)).sum() / ((x - m) ** 2).sum())

    out = _q(spark, "pacf_lag2_daily_revenue").first()
    assert out["r1"] == pytest.approx(r(1), abs=1e-5)
    assert out["r2"] == pytest.approx(r(2), abs=1e-5)
    ref = (r(2) - r(1) ** 2) / (1 - r(1) ** 2)
    assert out["pacf_lag2"] == pytest.approx(ref, abs=1e-4)


def test_cusum_two_changepoints_structure(spark):
    import numpy as np

    x = np.array(_daily_grid_ref(spark))
    n = len(x)
    pfx = np.cumsum(x)
    t = np.arange(1, n + 1)
    stat = np.abs(n * pfx - t * x.sum())
    t1 = int(stat.argmax()) + 1  # first argmax == earliest day on ties
    out = {r["segment"]: r for r in _q(spark, "cusum_two_changepoints").collect()}
    assert set(out) == {"full", "left", "right"}
    assert out["full"]["cusum_peak"] == pytest.approx(stat.max() / n, abs=0.01)
    # left/right peaks computed segment-relative from the reference
    pl, sl = pfx[:t1], pfx[t1 - 1]
    stat_l = np.abs(t1 * pl - np.arange(1, t1 + 1) * sl)
    assert out["left"]["cusum_peak"] == pytest.approx(stat_l.max() / t1, abs=0.01)
    m = n - t1
    pr = pfx[t1:] - sl
    stat_r = np.abs(m * pr - np.arange(1, m + 1) * (x.sum() - sl))
    assert out["right"]["cusum_peak"] == pytest.approx(stat_r.max() / m, abs=0.01)


def test_minhash_estimate_error_bound(spark):
    """16-hash MinHash estimator: mean |err| should sit well under the
    binomial envelope max_J sqrt(J(1-J)/16) = 0.125; max err under 0.5
    (both loose, but they catch a broken estimator or a broken join)."""
    out = _q(spark, "minhash_estimate_error").first()
    assert out["n_pairs"] > 0
    assert 0.0 <= out["mean_abs_err"] < 0.125
    assert out["max_abs_err"] <= 0.5


def test_winnowing_guarantee_on_synthetic(spark):
    """Winnowing's coverage guarantee: two docs sharing a run of
    w+n-1 = 6 tokens MUST share at least one fingerprint; disjoint
    docs share none. Long docs so every window is full (wn = 4)."""
    from etl_challenge_localiza_spark.registry import QUERIES

    shared = "alpha beta gamma delta epsilon zeta"  # 6 shared tokens
    filler_a = " ".join(f"a{i}" for i in range(20))
    filler_b = " ".join(f"b{i}" for i in range(20))
    filler_c = " ".join(f"c{i}" for i in range(26))
    docs = spark.createDataFrame(
        [
            (1, f"{filler_a} {shared} {filler_a}", "en", "s", 1),
            (2, f"{filler_b} {shared} {filler_b}", "en", "s", 1),
            (3, filler_c, "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile
    import os
    import shutil

    d = tempfile.mkdtemp(prefix="winnow_")
    try:
        # build a tiny sf-dir with just documents (the query loads by name)
        docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = QUERIES["winnowing_fingerprint_pairs"].fn(spark, d).collect()
        pairs = {(r["doc_id_a"], r["doc_id_b"]): r["shared_fingerprints"] for r in out}
        assert (1, 2) in pairs and pairs[(1, 2)] >= 1
        assert not any(3 in p for p in pairs)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_negative_sampling_dist_properties(spark):
    out = _q(spark, "negative_sampling_dist").collect()
    assert len(out) == 20
    # descending frequency, p ∝ n^0.75 ordering preserved, p in (0, 1)
    ns = [r["n"] for r in out]
    assert ns == sorted(ns, reverse=True)
    for r in out:
        assert 0.0 < r["p_neg"] < 1.0
        assert r["weight"] == pytest.approx(r["n"] ** 0.75, rel=1e-5)


def test_ridge_matches_numpy(spark):
    import numpy as np

    from etl_challenge_localiza_spark.sources.readers import load_table

    li = load_table(spark, SF, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    )
    rows = li.collect()
    X = np.array([[r["l_quantity"], r["l_discount"]] for r in rows])
    y = np.array([r["l_extendedprice"] for r in rows])
    lam = 1000.0
    beta = np.linalg.solve(X.T @ X + lam * np.eye(2), X.T @ y)
    out = _q(spark, "ridge_revenue_2feature").first()
    assert out["n"] == len(rows)
    assert out["beta_quantity"] == pytest.approx(beta[0], rel=1e-5)
    assert out["beta_discount"] == pytest.approx(beta[1], rel=1e-4)


def test_k_anonymity_hand_case(spark):
    from collections import Counter

    rows = _events(spark).select("event_type", "ts").collect()
    sizes = Counter((r["event_type"], r["ts"].date()) for r in rows)
    out = _q(spark, "k_anonymity_audit").first()
    assert out["n_groups"] == len(sizes)
    assert out["k_min"] == min(sizes.values())
    below = [v for v in sizes.values() if v < 5]
    assert out["groups_below_5"] == len(below)
    assert out["rows_below_5"] == sum(below)
    assert out["suppression_rate"] == pytest.approx(
        sum(below) / sum(sizes.values()), abs=1e-6
    )


def test_hurst_matches_numpy(spark):
    import numpy as np

    x = np.array(_daily_grid_ref(spark))
    out = {r["block_size"]: r for r in _q(spark, "hurst_rs_daily_revenue").collect()}
    pts = []
    for b in (8, 16, 32, 64, 128):
        rss = []
        for blk in range(len(x) // b):
            seg = x[blk * b : (blk + 1) * b]
            dev = np.cumsum(seg - seg.mean())
            r = dev.max() - dev.min()
            s = seg.std()  # population std
            if s > 0:
                rss.append(r / s)
        ref = float(np.mean(np.round(rss, 6)))
        assert out[b]["n_blocks"] == len(rss)
        assert out[b]["rs_mean"] == pytest.approx(ref, abs=1e-4)
        pts.append((math.log(b), math.log(out[b]["rs_mean"])))
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    hurst = out[8]["hurst"]
    assert hurst == pytest.approx(slope, abs=1e-3)
    assert 0.0 < hurst < 1.0  # a valid Hurst exponent


def test_gumbel_matches_numpy(spark):
    import numpy as np
    from collections import defaultdict

    from pyspark.sql import functions as F
    from etl_challenge_localiza_spark.sources.readers import load_table

    orders = load_table(spark, SF, "orders")
    rows = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("r"))
        .collect()
    )
    # monthly max over the GAPLESS grid == monthly max over present
    # days unless a month is entirely absent interior-zero months
    # would contribute 0; replicate via the same grid
    x = _daily_grid_ref(spark)
    import datetime

    d0 = min(r["day"] for r in rows)
    mx = defaultdict(float)
    for i, v in enumerate(x):
        d = d0 + datetime.timedelta(days=i)
        key = (d.year, d.month)
        mx[key] = max(mx[key], v)
    m = np.array(list(mx.values()))
    beta = m.std(ddof=1) * math.sqrt(6) / math.pi
    mu = m.mean() - 0.5772156649015329 * beta
    out = _q(spark, "gumbel_monthly_max_fit").first()
    assert out["n_months"] == len(m)
    assert out["gumbel_beta"] == pytest.approx(beta, rel=1e-3)
    assert out["gumbel_mu"] == pytest.approx(mu, rel=1e-3)


def test_trimmed_mean_matches_numpy(spark):
    import numpy as np

    rows = _events(spark).select("event_type", "value").collect()
    groups: dict[str, list[float]] = {}
    for r in rows:
        groups.setdefault(r["event_type"], []).append(float(r["value"]))
    out = {r["event_type"]: r for r in _q(spark, "trimmed_mean_event_values").collect()}
    for t, g in groups.items():
        a = np.sort(np.array(g))
        k = len(a) // 20
        ref = float(a[k : len(a) - k].mean())
        assert out[t]["n_kept"] == len(a) - 2 * k
        assert out[t]["trimmed_mean"] == pytest.approx(ref, abs=1e-6)


def test_robust_zscore_matches_numpy(spark):
    # sf0.01: the sf0.001 grid is mostly zero days -> MAD = 0 and the
    # score degenerates to null (both engines agree; the oracle covers
    # that case); the numpy comparison needs the dense grid
    import numpy as np

    sf = "/root/testdata/sf0.01"
    x = np.array(_daily_grid_ref(spark, sf))
    med = float(np.median(x))
    mad = float(np.median(np.abs(x - med)))
    assert mad > 0
    z = (x - med) / (1.4826 * mad)
    order = sorted(range(len(x)), key=lambda i: (-abs(z[i]), i))[:15]
    out = _q(spark, "robust_zscore_anomaly_days", sf).collect()
    assert len(out) == 15
    for row, i in zip(out, order):
        assert row["revenue"] == pytest.approx(x[i], abs=0.01)
        assert row["robust_z"] == pytest.approx(z[i], abs=1e-3)
        assert row["is_anomaly"] == int(abs(z[i]) > 3.5)

"""Invariant tests for q170-q175: brute-force recomputation on the
smoke fixture and structural guarantees (episode disjointness, audit
zero-orphans, Q15 tie semantics)."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

import numpy as np
from pyspark.sql import functions as F

from batch_processing_new_spark.operators.activity import (
    q170_rolling_active_users,
    q171_interval_coalesce,
)
from batch_processing_new_spark.operators.experiments import q172_cuped
from batch_processing_new_spark.operators.quality_audit import (
    FK_EDGES,
    q173_expectations_audit,
    q174_fk_orphan_audit,
)
from batch_processing_new_spark.operators.relational_ext import (
    q175_top_supplier_revenue,
)
from batch_processing_new_spark.sources.readers import load_table
from tests.conftest import SF_CORRECT, SF_SMOKE


def _events(spark, sf):
    return load_table(spark, sf, "events").collect()


def test_wau_bruteforce(spark):
    ev = _events(spark, SF_SMOKE)
    act = {(r["user_id"], r["ts"].date()) for r in ev}
    days = sorted({d for _, d in act})
    got = {
        r["day"]: r["wau"]
        for r in q170_rolling_active_users(spark, SF_SMOKE).collect()
    }
    assert set(got) == {d.isoformat() for d in days}
    for d in days:
        lo = d - timedelta(days=6)
        expect = len({u for u, ad in act if lo <= ad <= d})
        assert got[d.isoformat()] == expect


def test_interval_coalesce_episodes_disjoint_and_cover(spark):
    rows = q171_interval_coalesce(spark, SF_SMOKE).collect()
    ev = _events(spark, SF_SMOKE)
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    # conservation: every interval lands in exactly one episode
    assert sum(r["n_intervals"] for r in rows) == len(ev)
    per_user_events = defaultdict(int)
    for e in ev:
        per_user_events[e["user_id"]] += 1
    for u, eps in by_user.items():
        eps = sorted(eps, key=lambda r: r["episode"])
        assert [r["episode"] for r in eps] == list(range(1, len(eps) + 1))
        assert sum(r["n_intervals"] for r in eps) == per_user_events[u]
        for a, b in zip(eps, eps[1:]):
            # maximal episodes: a strict gap separates consecutive ones
            assert a["episode_end"] < b["episode_start"]
        for r in eps:
            span = (
                r["episode_end"] - r["episode_start"]
            ).total_seconds() / 60.0
            assert span >= 30.0  # at least one 30-minute hold


def test_cuped_reduces_or_preserves_variance_and_theta(spark):
    ev = _events(spark, SF_CORRECT)
    cutoff = np.datetime64("2024-01-16T00:00:00")
    pre = defaultdict(float)
    post = defaultdict(float)
    for r in ev:
        t = np.datetime64(r["ts"])
        if t < cutoff:
            pre[r["user_id"]] += r["value"]
        elif r["event_type"] == "purchase":
            post[r["user_id"]] += r["value"]
    users = sorted(set(r["user_id"] for r in ev))
    x = np.array([pre[u] for u in users])
    y = np.array([post[u] for u in users])
    th = ((x * y).sum() - x.sum() * y.sum() / len(x)) / (
        (x * x).sum() - x.sum() ** 2 / len(x)
    )
    rows = q172_cuped(spark, SF_CORRECT).collect()
    assert len(rows) == 2 and [r["arm"] for r in rows] == [0, 1]
    for r in rows:
        assert abs(r["theta"] - round(th, 6)) < 1e-4
    # adjusted metric has (weakly) smaller variance than raw post
    adj = y - th * (x - x.mean())
    assert adj.var() <= y.var() + 1e-9
    # grand mean is preserved by CUPED (sum over arms weighted)
    n = sum(r["n_users"] for r in rows)
    mean_adj = sum(r["mean_adjusted"] * r["n_users"] for r in rows) / n
    assert abs(mean_adj - y.mean()) < 1e-3


def test_expectations_audit_pandas_recompute(spark):
    import json

    ev = _events(spark, SF_CORRECT)
    n = len(ev)
    exp = {
        "value_nonneg": sum(1 for r in ev if not (r["value"] >= 0)),
        "value_upper_bound": sum(1 for r in ev if not (r["value"] <= 1000)),
        "event_type_domain": sum(
            1
            for r in ev
            if r["event_type"]
            not in ("click", "view", "purchase", "signup", "error")
        ),
        "user_id_present": sum(1 for r in ev if r["user_id"] is None),
        "props_has_k": sum(
            1
            for r in ev
            if r["props"] is None or "k" not in json.loads(r["props"])
        ),
    }
    got = {
        r["rule_id"]: r
        for r in q173_expectations_audit(spark, SF_CORRECT).collect()
    }
    assert len(got) == 6
    for rid, v in exp.items():
        assert got[rid]["n_violations"] == v
        assert got[rid]["n_rows"] == n
        assert abs(got[rid]["violation_rate"] - round(v / n, 6)) < 1e-9


def test_fk_orphan_audit_zero_orphans_and_counts(spark):
    rows = {r["edge"]: r for r in q174_fk_orphan_audit(spark, SF_SMOKE).collect()}
    assert set(rows) == {e[0] for e in FK_EDGES}
    for name, child, fk, parent, pk in FK_EDGES:
        c = load_table(spark, SF_SMOKE, child)
        assert rows[name]["child_rows"] == c.count()
        assert rows[name]["orphan_rows"] == 0  # fixture is referentially intact


def test_top_supplier_is_argmax(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    rev = defaultdict(float)
    for r in li:
        d = r["l_shipdate"]
        d = d.date() if hasattr(d, "date") else d
        if d.year == 1996 and d.month in (1, 2, 3):
            rev[r["l_suppkey"]] += r["l_extendedprice"] * (
                1 - r["l_discount"]
            )
    best = max(rev.values())
    winners = {k for k, v in rev.items() if abs(v - best) < 1e-6}
    got = q175_top_supplier_revenue(spark, SF_SMOKE).collect()
    assert {r["s_suppkey"] for r in got} == winners
    for r in got:
        assert abs(r["total_revenue"] - best) < 1e-6


def test_event_transitions_row_stochastic(spark):
    from batch_processing_new_spark.operators.analytics import (
        q181_event_transitions,
    )

    rows = q181_event_transitions(spark, SF_CORRECT).collect()
    ev = _events(spark, SF_CORRECT)
    # conservation: transitions = events - users (each user's chain has
    # len-1 links)
    n_users = len({r["user_id"] for r in ev})
    assert sum(r["n"] for r in rows) == len(ev) - n_users
    by_from = defaultdict(float)
    for r in rows:
        assert 0 < r["p"] <= 1
        by_from[r["from_type"]] += r["p"]
    for ft, s in by_from.items():
        assert abs(s - 1.0) < 1e-4, ft


def test_position_attribution_credit_sums_to_one(spark):
    from batch_processing_new_spark.operators.analytics import (
        q182_position_attribution,
    )

    rows = q182_position_attribution(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert abs(r["total_credit"] - 1.0) < 1e-4
        if r["n_touches"] == 1:
            assert r["first_credit"] == 1.0 and r["last_credit"] == 1.0
        elif r["n_touches"] == 2:
            assert r["first_credit"] == 0.5 and r["last_credit"] == 0.5
        else:
            assert r["first_credit"] == 0.4 and r["last_credit"] == 0.4


def test_xml_roundtrip_lossless(spark):
    from batch_processing_new_spark.sources.scraped import q184_xml_ingest

    rows = {r["event_type"]: r for r in q184_xml_ingest(spark, SF_CORRECT).collect()}
    ev = _events(spark, SF_CORRECT)
    by_type = defaultdict(lambda: [0, 0.0, -1])
    for e in ev:
        b = by_type[e["event_type"]]
        b[0] += 1
        b[1] += e["value"]
        b[2] = max(b[2], e["event_id"])
    assert set(rows) == set(by_type)
    for t, (n, tv, mx) in by_type.items():
        assert rows[t]["n"] == n and rows[t]["max_id"] == mx
        assert abs(rows[t]["total_value"] - tv) < 1e-6


def test_largest_remainder_sums_to_budget(spark):
    from batch_processing_new_spark.operators.training_mix import (
        q186_largest_remainder,
    )

    rows = q186_largest_remainder(spark, SF_CORRECT).collect()
    assert sum(r["alloc"] for r in rows) == 1000
    for r in rows:
        assert r["alloc"] in (r["quota_floor"], r["quota_floor"] + 1)
    # proportionality: allocation within 1 seat of the exact quota
    n = sum(r["n_docs"] for r in rows)
    for r in rows:
        exact = r["n_docs"] * 1000 / n
        assert abs(r["alloc"] - exact) < 1.0


def test_decayed_trending_recency_dominance(spark):
    from batch_processing_new_spark.operators.corpus_stats import (
        q187_decayed_trending,
    )

    rows = q187_decayed_trending(spark, SF_CORRECT).collect()
    assert len(rows) == 20
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # decayed score can never exceed the raw total
    for r in rows:
        assert 0 < r["score"] <= r["total_n"]


def test_seasonal_anomaly_zscores(spark):
    from batch_processing_new_spark.operators.analytics import (
        q185_seasonal_anomaly,
    )

    rows = q185_seasonal_anomaly(spark, SF_CORRECT).collect()
    assert rows, "uniform synthetic traffic still yields >2-sigma cells"
    for r in rows:
        assert abs(r["z"]) > 2.0
        # flagged cell deviates from its baseline in absolute terms too
        assert r["n"] != round(r["mu"])


def test_chi_square_matches_numpy(spark):
    from batch_processing_new_spark.operators.corpus_stats import (
        q188_chi_square_independence,
    )

    docs = load_table(spark, SF_CORRECT, "documents").collect()
    cells = defaultdict(int)
    for d in docs:
        cells[(d["source"], d["lang"])] += 1
    srcs = sorted({s for s, _ in cells})
    langs = sorted({l for _, l in cells})
    obs = np.array([[cells.get((s, l), 0) for l in langs] for s in srcs], float)
    n = obs.sum()
    exp = obs.sum(1, keepdims=True) @ obs.sum(0, keepdims=True) / n
    chi2 = (np.round((obs - exp) ** 2 / exp, 9)).sum()
    row = q188_chi_square_independence(spark, SF_CORRECT).collect()[0]
    assert abs(row["chi2"] - round(chi2, 6)) < 1e-4
    assert row["dof"] == (len(srcs) - 1) * (len(langs) - 1)
    v = np.sqrt(chi2 / (n * min(len(srcs) - 1, len(langs) - 1)))
    assert abs(row["cramers_v"] - v) < 1e-4


def test_concentration_bounds_and_numpy(spark):
    from batch_processing_new_spark.operators.corpus_stats import (
        q189_concentration_audit,
    )

    docs = load_table(spark, SF_CORRECT, "documents").collect()
    counts = defaultdict(int)
    for d in docs:
        counts[d["source"]] += 1
    x = np.array(sorted(counts.values()), float)
    k, total = len(x), x.sum()
    gini = ((2 * np.arange(1, k + 1) - k - 1) * x).sum() / (k * total)
    p = x / total
    row = q189_concentration_audit(spark, SF_CORRECT).collect()[0]
    assert abs(row["gini"] - gini) < 1e-4
    assert abs(row["hhi"] - (p ** 2).sum()) < 1e-6
    assert abs(row["shannon_entropy"] - (-(p * np.log(p)).sum())) < 1e-4
    assert 0 <= row["gini"] < 1
    assert 1 / k <= row["hhi"] <= 1
    assert 0 <= row["evenness"] <= 1


def test_weighted_reservoir_properties(spark):
    import math

    from batch_processing_new_spark.functions.text_funcs import hash60
    from batch_processing_new_spark.operators.analytics import (
        q190_weighted_reservoir,
    )

    rows = q190_weighted_reservoir(spark, SF_CORRECT).collect()
    assert len(rows) == 50
    assert len({r["doc_id"] for r in rows}) == 50  # without replacement
    # python recompute of the A-ES keys reproduces the exact sample
    import hashlib

    docs = load_table(spark, SF_CORRECT, "documents").collect()
    keys = []
    for d in docs:
        h = int(hashlib.md5(f"aes:{d['doc_id']}".encode()).hexdigest()[:15], 16)
        u = (h + 1.0) / 1152921504606846977.0
        keys.append((round(-math.log(u) / d["n_chars"], 9), d["doc_id"]))
    expected = [doc for _, doc in sorted(keys)[:50]]
    assert [r["doc_id"] for r in rows] == expected
    # weighting bias: sampled docs skew long (mean above corpus mean)
    corpus_mean = sum(d["n_chars"] for d in docs) / len(docs)
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_dormant_customers_no_recent_orders(spark):
    from batch_processing_new_spark.operators.relational_ext import (
        q191_dormant_customers,
    )

    rows = q191_dormant_customers(spark, SF_CORRECT).collect()
    assert rows
    orders = load_table(spark, SF_CORRECT, "orders").collect()
    cust = load_table(spark, SF_CORRECT, "customer").collect()
    recent = {
        o["o_custkey"]
        for o in orders
        if o["o_orderdate"].year >= 2000
    }
    pos = [c["c_acctbal"] for c in cust if c["c_acctbal"] > 0]
    ab = sum(pos) / len(pos)
    expect = defaultdict(lambda: [0, 0.0])
    for c in cust:
        if c["c_acctbal"] > ab and c["c_custkey"] not in recent:
            e = expect[c["c_nationkey"]]
            e[0] += 1
            e[1] += c["c_acctbal"]
    got = {r["c_nationkey"]: r for r in rows}
    assert set(got) == set(expect)
    for nk, (n, tb) in expect.items():
        assert got[nk]["n_custs"] == n
        assert abs(got[nk]["total_bal"] - tb) < 1e-4


def test_annotator_agreement_properties(spark):
    from batch_processing_new_spark.operators.evaluation import (
        q192_annotator_agreement,
    )

    rows = q192_annotator_agreement(spark, SF_CORRECT).collect()
    n_docs = load_table(spark, SF_CORRECT, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    accs = {r["accuracy"] for r in rows}
    kappas = {r["kappa"] for r in rows}
    assert len(accs) == 1 and len(kappas) == 1  # global stats, every row
    acc, kappa = accs.pop(), kappas.pop()
    agree = sum(r["n"] for r in rows if r["label"] == r["pred"])
    assert abs(acc - round(agree / n_docs, 6)) < 1e-9
    assert -1 <= kappa <= 1
    assert kappa <= acc + 1e-9  # chance correction can only lower it


def test_precision_recall_identities(spark):
    from batch_processing_new_spark.operators.evaluation import (
        q193_precision_recall,
    )

    r = q193_precision_recall(spark, SF_CORRECT).collect()[0]
    n_docs = load_table(spark, SF_CORRECT, "documents").count()
    tp, fp, fn, tn = r["tp"], r["fp"], r["fn"], r["tn"]
    assert tp + fp + fn + tn == n_docs
    assert abs(r["precision"] - round(tp / (tp + fp), 6)) < 1e-9
    assert abs(r["recall"] - round(tp / (tp + fn), 6)) < 1e-9
    # F1 is the harmonic mean: between 0 and min-bound checks
    p_, r_ = tp / (tp + fp), tp / (tp + fn)
    assert abs(r["f1"] - round(2 * p_ * r_ / (p_ + r_), 6)) < 1e-6


def test_wilson_intervals_bracket_rate(spark):
    import math

    from batch_processing_new_spark.operators.evaluation import (
        q194_wilson_intervals,
    )

    rows = q194_wilson_intervals(spark, SF_CORRECT).collect()
    for r in rows:
        assert 0 <= r["ci_lo"] <= r["rate"] <= r["ci_hi"] <= 1
        # closed-form recompute
        z, n, k = 1.959963985, r["n"], r["k"]
        p = k / n
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        lo = (p + z * z / (2 * n) - half) / (1 + z * z / n)
        hi = (p + z * z / (2 * n) + half) / (1 + z * z / n)
        assert abs(r["ci_lo"] - round(lo, 6)) < 1e-9
        assert abs(r["ci_hi"] - round(hi, 6)) < 1e-9
        # CI narrows with n (weak check: width < 1)
        assert r["ci_hi"] - r["ci_lo"] < 1


def test_lexicon_sentiment_pandas_recompute(spark):
    from batch_processing_new_spark.operators.text_analysis import (
        q195_lexicon_sentiment,
    )

    docs = load_table(spark, SF_CORRECT, "documents").collect()
    lex = {"fast": 1, "big": 1, "slow": -1, "small": -1}
    agg = defaultdict(lambda: [0, 0.0])
    for d in docs:
        toks = d["text"].strip().split(" ")
        score = sum(lex.get(t, 0) for t in toks) / len(toks)
        lab = (
            "positive" if score > 0.01
            else "negative" if score < -0.01
            else "neutral"
        )
        a = agg[(d["source"], lab)]
        a[0] += 1
        a[1] += score
    got = {
        (r["source"], r["sentiment"]): (r["n_docs"], r["mean_score"])
        for r in q195_lexicon_sentiment(spark, SF_CORRECT).collect()
    }
    assert set(got) == set(agg)
    for k, (n, tot) in agg.items():
        assert got[k][0] == n
        assert abs(got[k][1] - round(tot / n, 6)) < 1e-6


def test_supplier_part_counts_bruteforce(spark):
    from batch_processing_new_spark.operators.relational_ext import (
        q196_supplier_part_counts,
    )

    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    part = {
        r["p_partkey"]: (r["p_brand"], r["p_type"], r["p_size"])
        for r in load_table(spark, SF_SMOKE, "part").collect()
    }
    bad = {
        r["s_suppkey"]
        for r in load_table(spark, SF_SMOKE, "supplier").collect()
        if r["s_acctbal"] < 0
    }
    sups = defaultdict(set)
    for r in li:
        if r["l_suppkey"] in bad:
            continue
        b, t, s = part[r["l_partkey"]]
        if b == "Brand#1":
            continue
        sups[(b, t, s)].add(r["l_suppkey"])
    expected = sorted(
        ((len(v),) + k for k, v in sups.items()),
        key=lambda x: (-x[0], x[1], x[2], x[3]),
    )[:50]
    got = [
        (r["supplier_cnt"], r["p_brand"], r["p_type"], r["p_size"])
        for r in q196_supplier_part_counts(spark, SF_SMOKE).collect()
    ]
    assert got == expected

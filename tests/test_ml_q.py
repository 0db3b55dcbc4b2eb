"""Independent (non-DuckDB) cross-checks for the learned-model
analytics in queries/ml_q.py: the OLS solution against numpy's
least-squares solver and the rank-statistic AUC against a brute-force
pairwise count. The DuckDB oracles prove engine agreement; these prove
the MATH is the textbook quantity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from forex_data_pipeline_spark import catalog
from forex_data_pipeline_spark.catalog import REGISTRY
from forex_data_pipeline_spark.tables import load

catalog._ensure_loaded()


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    row = (
        REGISTRY["ols_normal_equations"].fn(spark, sf_dir).toPandas().iloc[0]
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).toPandas()
    x1 = np.round(li["l_quantity"].to_numpy())
    x2 = np.round(li["l_discount"].to_numpy() * 100)
    y = np.round(li["l_extendedprice"].to_numpy() * 100)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
    assert row["n_rows"] == len(li)
    assert np.isclose(row["beta0_cents"], beta[0], rtol=1e-9)
    assert np.isclose(row["beta_qty"], beta[1], rtol=1e-9)
    assert np.isclose(row["beta_disc"], beta[2], rtol=1e-9)
    resid = y - X @ beta
    r2 = 1.0 - resid @ resid / np.sum((y - y.mean()) ** 2)
    assert np.isclose(row["r2"], r2, rtol=1e-9)
    # R² of an OLS fit with intercept is bounded [0, 1] by construction
    # (the synthetic testdata draws price independent of quantity, so
    # the fit is weak — the bound, not the strength, is the invariant)
    assert 0.0 <= row["r2"] <= 1.0


def test_auc_matches_pairwise_count(spark, sf_dir):
    row = (
        REGISTRY["classifier_auc_exact"].fn(spark, sf_dir).toPandas().iloc[0]
    )
    logit = REGISTRY["quality_classifier_logit"].fn(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    pdf = (
        logit.select("doc_id", "logit")
        .join(docs, "doc_id")
        .select("logit", "lang")
        .toPandas()
    )
    pos = pdf.loc[pdf["lang"] == "en", "logit"].to_numpy()
    neg = pdf.loc[pdf["lang"] != "en", "logit"].to_numpy()
    # O(P·N) brute force — fine at sf0.001
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert row["pos_total"] == len(pos) and row["neg_total"] == len(neg)
    assert np.isclose(row["auc"], auc, rtol=0, atol=1e-12)
    assert np.isclose(row["gini"], 2 * auc - 1, rtol=0, atol=1e-12)


def test_rrf_fusion_is_consistent_with_single_rankers(spark, sf_dir):
    """Every fused top-20 item must appear in at least one ranker's
    top-100, and items in both lists must outrank a same-best-rank
    item present in only one (1/(60+r) is positive)."""
    fused = (
        REGISTRY["rrf_hybrid_retrieval"].fn(spark, sf_dir).toPandas()
    )
    assert len(fused) == 20
    assert fused["rank"].tolist() == list(range(1, 21))
    assert (fused["rrf_score"] > 0).all()
    # scores sorted desc with vec_id tiebreak
    s = fused.sort_values(["rank"])["rrf_score"].to_numpy()
    assert (np.diff(s) <= 1e-18).all()


def test_bm25_score_matches_pure_python(spark, sf_dir):
    got = REGISTRY["bm25_topk"].fn(spark, sf_dir).toPandas()
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).toPandas()
    toks = docs["text"].str.strip().str.split()
    dl = toks.str.len().to_numpy()
    n, avgdl = len(docs), dl.sum() / len(docs)
    terms = ("hash", "merge", "vector", "slow")
    k1, b = 1.2, 0.75
    tf = {
        t: toks.map(lambda ts, t=t: ts.count(t)).to_numpy() for t in terms
    }
    score = np.zeros(n)
    for t in terms:
        df_t = (tf[t] > 0).sum()
        idf = np.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        score = score + idf * (
            tf[t] * (k1 + 1.0) / (tf[t] + k1 * (1 - b + b * (dl / avgdl)))
        )
    ref = pd.DataFrame({"doc_id": docs["doc_id"], "bm25": score.round(6)})
    ref = ref[ref["bm25"] > 0].sort_values(
        ["bm25", "doc_id"], ascending=[False, True]
    ).head(25)
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert np.allclose(got["bm25"], ref["bm25"], rtol=0, atol=2e-6)


def test_mmr_kernel_degenerate_shortlists():
    """Pure-pandas: the greedy kernel must survive shortlists smaller
    than k (stop when dry) and empty ones (empty result)."""
    import pandas as pd

    from forex_data_pipeline_spark.queries.ml_q import _mmr_kernel

    empty = _mmr_kernel(pd.DataFrame({"ai": [], "bi": [], "val": []}))
    assert len(empty) == 0 and list(empty.columns) == [
        "step", "vec_id", "mmr_score",
    ]
    # 3 candidates, k=10: picks exactly 3 in greedy order
    rel = pd.DataFrame({"ai": [1, 2, 3], "bi": [-1] * 3,
                        "val": [0.9, 0.8, 0.7]})
    sims = [(a, b, 0.5) for a in (1, 2, 3) for b in (1, 2, 3) if a != b]
    sim = pd.DataFrame(sims, columns=["ai", "bi", "val"])
    out = _mmr_kernel(pd.concat([rel, sim], ignore_index=True))
    assert out["step"].tolist() == [1, 2, 3]
    assert out["vec_id"].tolist() == [1, 2, 3]
    # step-1 score is raw relevance; later steps are penalized
    assert out["mmr_score"].iloc[0] == 0.9
    assert (out["mmr_score"].iloc[1:] < out["mmr_score"].iloc[0]).all()


def test_incremental_retrieval_stats_merge_bit_is_true(spark, sf_dir):
    """The merge-vs-full audit column must actually be True — the
    oracle proves both engines agree on its value, this proves the
    value is the monoid law holding."""
    row = (
        REGISTRY["incremental_retrieval_stats"]
        .fn(spark, sf_dir)
        .toPandas()
        .iloc[0]
    )
    assert bool(row["merge_consistent"]) is True
    assert row["n_docs"] > 0 and row["total_tokens"] > 0


def test_embedding_prefix_mass_is_a_partition_of_unit_interval(
    spark, sf_dir
):
    pdf = REGISTRY["embedding_prefix_mass"].fn(spark, sf_dir).toPandas()
    assert (pdf["min_share"] >= 0).all()
    assert (pdf["max_share"] <= 1).all()
    # bins hold their own min/max: bin b covers [b/10, (b+1)/10)
    for r in pdf.itertuples():
        assert r.share_bin * 0.1 <= r.min_share
        assert r.max_share < (r.share_bin + 1) * 0.1 + 1e-12
    # all 500+ vectors accounted for
    assert pdf["n_vectors"].sum() >= 500

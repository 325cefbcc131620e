"""Round-8 batch 25 depth tests: numpy/python references for the
centroid-distance outliers, the simplified silhouette, and the Markov
absorption probabilities (dense matrix-power replay) — plus the
structural facts (absorption monotone in horizon; purchase pinned at
1; silhouette in [0, 1] for the centroid variant)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"


def _emb():
    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values("vec_id")
    X = np.stack(e.embedding.to_numpy()).astype(float)
    return e.vec_id.to_numpy(), X


def test_centroid_outliers_match_numpy(spark):
    from ucl_data_pipeline_spark.plans.clustering import K
    from ucl_data_pipeline_spark.plans.extras58 import (
        _OUT_TOPN,
        centroid_distance_outliers,
    )

    ids, X = _emb()
    C = X[:K]
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a2 = d2.min(axis=1)
    cid = d2.argmin(axis=1)
    order = sorted(range(len(ids)), key=lambda i: (-a2[i], ids[i]))[
        :_OUT_TOPN
    ]

    rows = centroid_distance_outliers(spark, SF_DIR).collect()
    assert len(rows) == _OUT_TOPN
    for r, i in zip(rows, order):
        assert r.vec_id == ids[i]
        assert r.cluster_id == cid[i]
        assert abs(r.centroid_dist - np.sqrt(a2[i])) < 1e-5


def test_simplified_silhouette_matches_numpy(spark):
    from ucl_data_pipeline_spark.plans.clustering import K
    from ucl_data_pipeline_spark.plans.extras58 import simplified_silhouette

    _, X = _emb()
    C = X[:K]
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    part = np.sort(d2, axis=1)
    a = np.sqrt(part[:, 0])
    b = np.sqrt(part[:, 1])
    s = np.round((b - a) / np.maximum(a, b), 6)
    cid = d2.argmin(axis=1)

    rows = {r.cluster_id: r for r in simplified_silhouette(spark, SF_DIR).collect()}
    for k in range(K):
        mask = cid == k
        if not mask.any():
            assert k not in rows
            continue
        r = rows[k]
        assert r.n_points == int(mask.sum())
        assert abs(r.mean_silhouette - s[mask].mean()) < 1e-5
        # centroid variant: b >= a by construction, so s in [0, 1]
        assert -1e-9 <= r.mean_silhouette <= 1.0 + 1e-9
    assert sum(r.n_points for r in rows.values()) == len(X)


def test_markov_absorption_matches_matrix_power(spark):
    from ucl_data_pipeline_spark.plans.extras58 import (
        _ABS_TARGET,
        markov_absorption_funnel,
    )

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    counts = defaultdict(lambda: defaultdict(int))
    for _, sub in ev.groupby("user_id"):
        ts = sub.event_type.tolist()
        for a, b in zip(ts, ts[1:]):
            counts[a][b] += 1
    states = sorted(counts)
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for a, row in counts.items():
        tot = sum(row.values())
        for b, c in row.items():
            P[idx[a], idx[b]] = c / tot
    tgt = idx[_ABS_TARGET]

    a = np.zeros(len(states))
    a[tgt] = 1.0
    got = {r.start_state: r for r in markov_absorption_funnel(spark, SF_DIR).collect()}
    want = {}
    for step in range(1, 9):
        a = P @ a
        a[tgt] = 1.0
        if step in (2, 4, 8):
            want[step] = a.copy()
    assert set(got) == set(states)
    for s_name, i in idx.items():
        r = got[s_name]
        assert abs(r.p_absorb_2 - want[2][i]) < 1e-5, s_name
        assert abs(r.p_absorb_4 - want[4][i]) < 1e-5, s_name
        assert abs(r.p_absorb_8 - want[8][i]) < 1e-5, s_name
        # absorption probability is monotone in the horizon
        assert r.p_absorb_2 <= r.p_absorb_4 + 1e-9 <= r.p_absorb_8 + 2e-9
    # the absorbing state is pinned at 1 for every horizon
    assert got[_ABS_TARGET].p_absorb_2 == 1.0
    assert got[_ABS_TARGET].p_absorb_8 == 1.0

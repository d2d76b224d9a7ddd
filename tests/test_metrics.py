"""Golden tests for the alignment-metric suite.

Each metric is checked against an independent numpy implementation written
directly from the metric's mathematical definition (the same definitions the
reference implements in vision_language/metrics.py), on fixed seeded inputs.
"""

import numpy as np
import pytest

from uml_tpu.metrics import AlignmentMetrics


def _feats(seed, n=64, d=128):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


A = _feats(0)
B = _feats(1)


def np_knn(feats, topk):
    sims = feats @ feats.T
    np.fill_diagonal(sims, -1e8)
    return np.argsort(-sims, axis=1)[:, :topk]


def np_hsic_biased(K, L):
    n = K.shape[0]
    H = np.eye(n) - 1.0 / n
    return np.trace(K @ H @ L @ H)


def np_hsic_unbiased(K, L):
    m = K.shape[0]
    Kt = K.copy()
    Lt = L.copy()
    np.fill_diagonal(Kt, 0)
    np.fill_diagonal(Lt, 0)
    v = (
        np.sum(Kt * Lt.T)
        + Kt.sum() * Lt.sum() / ((m - 1) * (m - 2))
        - 2 * np.sum(Kt @ Lt) / (m - 2)
    )
    return v / (m * (m - 3))


def np_cka(a, b, unbiased=False):
    K, L = a @ a.T, b @ b.T
    h = np_hsic_unbiased if unbiased else np_hsic_biased
    return h(K, L) / (np.sqrt(h(K, K) * h(L, L)) + 1e-6)


def test_cka_ip():
    assert AlignmentMetrics.measure("cka", A, B, kernel_metric="ip") == pytest.approx(
        np_cka(A, B), abs=1e-4
    )


def test_cka_self_is_one():
    assert AlignmentMetrics.measure("cka", A, A) == pytest.approx(1.0, abs=1e-3)


def test_unbiased_cka():
    assert AlignmentMetrics.measure("unbiased_cka", A, B) == pytest.approx(
        np_cka(A, B, unbiased=True), abs=1e-4
    )


def test_cka_rbf():
    def rbf(x, sigma=1.0):
        d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        return np.exp(-d2 / (2 * sigma**2))

    K, L = rbf(A), rbf(B)
    h = np_hsic_biased
    expected = h(K, L) / (np.sqrt(h(K, K) * h(L, L)) + 1e-6)
    got = AlignmentMetrics.measure("cka", A, B, kernel_metric="rbf")
    assert got == pytest.approx(expected, abs=1e-4)


def _mutual_knn_from_lists(kA, kB, topk):
    n = kA.shape[0]
    mA = np.zeros((n, n))
    mB = np.zeros((n, n))
    rows = np.arange(n)[:, None]
    mA[rows, kA] = 1
    mB[rows, kB] = 1
    return ((mA * mB).sum(1) / topk).mean()


def test_mutual_knn():
    from uml_tpu.metrics import compute_nearest_neighbors

    topk = 10
    # exact logic check: intersection computed from the same knn lists the
    # implementation derives (rules out fp32-matmul rank-flip noise)
    kA = np.asarray(compute_nearest_neighbors(A, topk))
    kB = np.asarray(compute_nearest_neighbors(B, topk))
    expected = _mutual_knn_from_lists(kA, kB, topk)
    assert AlignmentMetrics.measure("mutual_knn", A, B, topk=topk) == pytest.approx(
        expected, abs=1e-6
    )
    # loose cross-check vs a fully independent numpy pipeline (borderline
    # neighbors may flip on matmul accumulation-order differences)
    expected_np = _mutual_knn_from_lists(np_knn(A, topk), np_knn(B, topk), topk)
    assert AlignmentMetrics.measure("mutual_knn", A, B, topk=topk) == pytest.approx(
        expected_np, abs=0.02
    )


def test_mutual_knn_self_is_one():
    assert AlignmentMetrics.measure("mutual_knn", A, A, topk=10) == pytest.approx(1.0)


def test_cycle_knn():
    from uml_tpu.metrics import compute_nearest_neighbors

    topk = 10
    kA = np.asarray(compute_nearest_neighbors(A, topk))
    kB = np.asarray(compute_nearest_neighbors(B, topk))
    cyc = kA[kB]  # N x topk x topk
    n = cyc.shape[0]
    hit = (cyc == np.arange(n)[:, None, None]).reshape(n, -1).max(1)
    expected = hit.mean()
    assert AlignmentMetrics.measure("cycle_knn", A, B, topk=topk) == pytest.approx(
        expected, abs=1e-6
    )


def test_cknna():
    got = AlignmentMetrics.measure("cknna", A, B, topk=10)
    assert -1.0 <= got <= 1.0
    # self-similarity saturates to 1
    assert AlignmentMetrics.measure("cknna", A, A, topk=10) == pytest.approx(
        1.0, abs=1e-3
    )
    with pytest.raises(ValueError):
        AlignmentMetrics.measure("cknna", A, B, topk=1)


def test_svcca_range_and_self():
    got = AlignmentMetrics.measure("svcca", A, B, cca_dim=10)
    assert 0.0 <= got <= 1.0
    self_score = AlignmentMetrics.measure("svcca", A, A, cca_dim=10)
    assert self_score == pytest.approx(1.0, abs=5e-3)


def test_lcs_knn_and_edit_distance():
    topk = 10
    # identical features -> identical knn lists -> perfect scores
    assert AlignmentMetrics.measure(
        "edit_distance_knn", A, A, topk=topk
    ) == pytest.approx(1.0)
    assert AlignmentMetrics.measure("lcs_knn", A, A, topk=topk) == pytest.approx(topk)
    got = AlignmentMetrics.measure("edit_distance_knn", A, B, topk=topk)
    assert 0.0 <= got <= 1.0


def test_unknown_metric_raises():
    with pytest.raises(ValueError):
        AlignmentMetrics.measure("nope", A, B)


def test_effective_rank():
    from uml_tpu.metrics import compute_effective_rank

    # rank-1 matrix -> effective rank ~1
    x = np.outer(np.ones(32), np.ones(16)).astype(np.float32)
    assert float(compute_effective_rank(x)) == pytest.approx(1.0, abs=1e-3)
    # iid gaussian -> effective rank close to min(n, d) scale but > 1
    y = np.random.default_rng(0).standard_normal((64, 16)).astype(np.float32)
    assert float(compute_effective_rank(y)) > 10.0

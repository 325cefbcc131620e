"""Property tests for the bucketed rank-statistic twins' analytic
bounds (pure Python — no Spark, no DuckDB).

The engine tests prove Spark == oracle and that the audit booleans
hold ON THE SHIPPED TESTDATA; these prove the BOUND MATH itself on
arbitrary adversarial inputs (heavy ties, tiny widths, skewed groups):

- Mann-Whitney:  |U - U_hat| <= (same-bucket A x B cross pairs) / 2.
  A-A pairs cannot move A's rank sum (midrank sums over a merged tie
  group are invariant), so only same-bucket cross pairs contribute,
  each by at most 1/2.
- Kruskal-Wallis: per group g, |R_g - R_hat_g| <= sum_b cnt_gb *
  (t_b - 1) / 2 — an element's rank moves at most half the span of
  its bucket's tie group.
- Wilcoxon signed-rank: |W+ - W+_hat| <= sum_b cp_b * (t_b - 1) / 2,
  same per-element span argument over |diff| buckets (zero diffs
  dropped BEFORE bucketing, the standard Pratt-free treatment).
- Cliff's delta: |delta - delta_hat| <= (same-bucket cross pairs) /
  (n_a * n_b) — a same-bucket pair's sign contribution moves by at
  most 1 (to the tie value 0), cross-bucket pairs keep their order.

Quantization here is floor(v / width) — monotone, so bucket ids
define exactly the merged tie groups the engine twins create with
fixed-width cells.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


def _midranks(vals: list[int]) -> dict[int, float]:
    """value -> average (mid) rank, 1-based, over the multiset."""
    cnt = Counter(vals)
    out: dict[int, float] = {}
    below = 0
    for v in sorted(cnt):
        t = cnt[v]
        out[v] = below + (t + 1) / 2.0
        below += t
    return out


def _rank_sum(group: list[int], all_vals: list[int]) -> float:
    mr = _midranks(all_vals)
    return sum(mr[v] for v in group)


_small_ints = st.lists(st.integers(0, 60), min_size=1, max_size=25)
_width = st.integers(1, 15)


@settings(max_examples=120, deadline=None)
@given(a=_small_ints, b=_small_ints, width=_width)
def test_mwu_bucket_bound(a, b, width):
    allv = a + b
    u_exact = _rank_sum(a, allv) - len(a) * (len(a) + 1) / 2.0
    ab = [v // width for v in a]
    bb = [v // width for v in b]
    u_hat = _rank_sum(ab, ab + bb) - len(a) * (len(a) + 1) / 2.0
    ca, cb = Counter(ab), Counter(bb)
    cross = sum(ca[k] * cb.get(k, 0) for k in ca)
    assert abs(u_exact - u_hat) <= cross / 2.0 + 1e-9


@settings(max_examples=120, deadline=None)
@given(
    groups=st.lists(_small_ints, min_size=2, max_size=4), width=_width
)
def test_kruskal_rank_sum_bound(groups, width):
    allv = [v for g in groups for v in g]
    ball = [v // width for v in allv]
    tb = Counter(ball)
    for g in groups:
        r_exact = _rank_sum(g, allv)
        gb = [v // width for v in g]
        r_hat = _rank_sum(gb, ball)
        cnt_gb = Counter(gb)
        bound = sum(n * (tb[k] - 1) / 2.0 for k, n in cnt_gb.items())
        assert abs(r_exact - r_hat) <= bound + 1e-9


@settings(max_examples=120, deadline=None)
@given(
    diffs=st.lists(
        st.integers(-60, 60).filter(lambda d: d != 0),
        min_size=1,
        max_size=25,
    ),
    width=_width,
)
def test_wilcoxon_bucket_bound(diffs, width):
    absd = [abs(d) for d in diffs]

    def wplus(vals: list[int]) -> float:
        mr = _midranks(vals)
        return sum(
            mr[v] for v, d in zip(vals, diffs) if d > 0
        )

    w_exact = wplus(absd)
    babs = [v // width for v in absd]
    w_hat = wplus(babs)
    tb = Counter(babs)
    cp = Counter(v for v, d in zip(babs, diffs) if d > 0)
    bound = sum(n * (tb[k] - 1) / 2.0 for k, n in cp.items())
    assert abs(w_exact - w_hat) <= bound + 1e-9


@settings(max_examples=120, deadline=None)
@given(a=_small_ints, b=_small_ints, width=_width)
def test_cliffs_delta_bucket_bound(a, b, width):
    def delta(x: list[int], y: list[int]) -> float:
        num = sum(
            (1 if xi > yi else -1 if xi < yi else 0)
            for xi in x
            for yi in y
        )
        return num / (len(x) * len(y))

    d_exact = delta(a, b)
    ab = [v // width for v in a]
    bb = [v // width for v in b]
    d_hat = delta(ab, bb)
    ca, cb = Counter(ab), Counter(bb)
    same_bucket = sum(ca[k] * cb.get(k, 0) for k in ca)
    assert abs(d_exact - d_hat) <= same_bucket / (len(a) * len(b)) + 1e-12

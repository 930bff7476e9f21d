"""Property test for the vectorized JW pre-gate (scoring._bag_prefix_bound).

The gate's entire correctness contract is ONE invariant: the bound is an
UPPER bound on true Jaro-Winkler for every string pair. If it ever
undercuts, make_gated_jw_udf silently drops a true edge — the class of
bug no example-based test reliably catches, and exactly what
property-based search is for. Pure Python/numpy: no SparkSession needed,
so this runs in milliseconds per example.

Soundness argument being tested (scoring.py:216): the character-bag
intersection (folded to 64 classes, so it can only OVER-count matches)
bounds the Jaro match count m; jaro is monotone in m and the transposition
term t <= m/2 makes (m/la + m/lb + 1)/3 an upper bound on jaro; the
common-prefix run (capped at 4) is exactly Winkler's p, and
x + 0.1*p*(1-x) is monotone in x for x <= 1.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pelinker_spark.scoring import _bag_prefix_bound, _jaro_winkler

# mostly-colliding alphabets (linkage keys look like this) + unicode to
# exercise the multi-byte path; min_size=0 covers the empty-string corner
_alpha = st.sampled_from(["ab", "abc -", "abcdefghijklmnopqrstuvwxyz0123456789 -", "é字a"])
_pair = _alpha.flatmap(
    lambda a: st.tuples(
        st.text(alphabet=a, min_size=0, max_size=24),
        st.text(alphabet=a, min_size=0, max_size=24),
    )
)


@settings(max_examples=2000, deadline=None)
@given(_pair)
def test_bound_never_undercuts_true_jw(pair):
    a, b = pair
    bound = float(_bag_prefix_bound(pd.Series([a]), pd.Series([b]))[0])
    true = _jaro_winkler(a, b)
    assert bound >= true - 1e-12, (a, b, bound, true)


@settings(max_examples=500, deadline=None)
@given(st.text(alphabet="abcé字 -", min_size=0, max_size=24))
def test_bound_is_exact_on_equal_pairs(s):
    # equal strings: true JW is 1.0 and the gate must always pass them
    bound = float(_bag_prefix_bound(pd.Series([s]), pd.Series([s]))[0])
    assert bound >= 1.0 - 1e-12, (s, bound)

"""jw_exact_batch must be BIT-identical to the scalar reference
_jaro_winkler on every input — it replaced the scalar loop inside
make_gated_jw_udf (round 4), so any divergence silently perturbs edge
scores and therefore clusters. The scalar loop survives only as this
oracle.

Reference parity: the JW scorer stands in for the reference's pairwise
mention-vs-property similarity (pelinker clustering_grid.py:395-423);
bit-identity here is what lets the gated UDF claim 'same edges as the
ungated scorer' transitively.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pelinker_spark.scoring import _jaro_winkler, jw_exact_batch


def _batch(pairs):
    av = np.array([p[0] for p in pairs], dtype=object)
    bv = np.array([p[1] for p in pairs], dtype=object)
    return jw_exact_batch(av, bv)


KNOWN = [
    ("martha", "marhta", 0.9611111111111111),
    ("dwayne", "duane", 0.84),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("", "", 1.0),
    ("", "abc", 0.0),
    ("abc", "", 0.0),
    ("abc", "abc", 1.0),
    ("a", "b", 0.0),
]


def test_known_values():
    got = _batch([(a, b) for a, b, _ in KNOWN])
    for (a, b, want), g in zip(KNOWN, got):
        assert g == pytest.approx(want, abs=1e-12), (a, b)
        assert g == _jaro_winkler(a, b), (a, b)


def test_edge_matrix_bit_identical():
    edge = ["", "a", "ab", "aa", "aaaa", "ü" * 5, "日本語テキスト",
            "x" * 100, "prefix match", "prefix mutch", "acti-vate",
            "activate", "insulin receptor", "insulin reception"]
    pairs = [(x, y) for x in edge for y in edge]
    got = _batch(pairs)
    exact = np.array([_jaro_winkler(x, y) for x, y in pairs])
    assert (got == exact).all()


def test_random_sweep_bit_identical():
    rng = np.random.RandomState(7)
    alphabet = list("abcde 012é日")
    pairs = []
    for _ in range(3000):
        n1, n2 = rng.randint(0, 30), rng.randint(0, 30)
        a = "".join(rng.choice(alphabet) for _ in range(n1))
        b = "".join(rng.choice(alphabet) for _ in range(n2))
        pairs.append((a, b))
    got = _batch(pairs)
    exact = np.array([_jaro_winkler(a, b) for a, b in pairs])
    assert (got == exact).all()


def test_chunk_boundary_and_length_sorting():
    # chunk smaller than the batch forces multiple slabs; wildly mixed
    # lengths force the per-chunk re-pad path (a 100-char outlier must
    # not perturb the short rows' results)
    pairs = [("abcdef" * k, "abcdef" * k + "x") for k in range(1, 20)]
    pairs += [("kinase", "kinsae")] * 10
    av = np.array([p[0] for p in pairs], dtype=object)
    bv = np.array([p[1] for p in pairs], dtype=object)
    got = jw_exact_batch(av, bv, chunk=3)
    exact = np.array([_jaro_winkler(a, b) for a, b in pairs])
    assert (got == exact).all()


def test_empty_batch():
    assert jw_exact_batch(np.array([], dtype=object),
                          np.array([], dtype=object)).shape == (0,)


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="ab7 é", max_size=24),
    st.text(alphabet="ab7 é", max_size=24),
)
def test_property_bit_identical(a, b):
    got = jw_exact_batch(np.array([a], dtype=object),
                         np.array([b], dtype=object))[0]
    assert got == _jaro_winkler(a, b)

#!/usr/bin/env python
"""Receipt generator: vectorized exact JW (jw_exact_batch) vs the scalar
reference loop (_jaro_winkler) on realistic multi-word blocking keys.

Two profiles:
  survivors — zero equal pairs, 70% single-char typo variants (what the
    bag+prefix gate actually passes to the exact kernel);
  mixed — 40% equal pairs (the ungated jaro_winkler_udf profile).

Usage: python tools/jw_bench.py [n_pairs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import random
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pelinker_spark.scoring import _jaro_winkler, jw_exact_batch  # noqa: E402

WORDS = [
    "insulin", "receptor", "activation", "phosphorylation", "kinase",
    "membrane", "protein", "binding", "signal", "transduction",
    "activate", "acetylate", "methylation", "pathway",
]


def _key(rng: random.Random) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 3)))


def _typo(rng: random.Random, s: str) -> str:
    j = rng.randrange(len(s))
    return s[:j] + rng.choice("abcdefgh") + s[j + 1 :]


def _gen(n: int, equal_frac: float, seed: int):
    rng = random.Random(seed)
    av = np.array([_key(rng) for _ in range(n)], dtype=object)
    bv = np.empty(n, dtype=object)
    for i in range(n):
        r = rng.random()
        if r < equal_frac:
            bv[i] = av[i]
        elif r < equal_frac + 0.55:
            bv[i] = _typo(rng, av[i])
        else:
            bv[i] = _key(rng)
    return av, bv


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out: dict = {"n_pairs": n}
    for name, eq in (("survivors", 0.0), ("mixed", 0.4)):
        av, bv = _gen(n, eq, seed=42)
        got = jw_exact_batch(av, bv)
        t0 = time.perf_counter()
        jw_exact_batch(av, bv)
        t_vec = time.perf_counter() - t0
        t0 = time.perf_counter()
        exact = np.fromiter(
            (_jaro_winkler(av[i], bv[i]) for i in range(n)), np.float64, n
        )
        t_scal = time.perf_counter() - t0
        out[name] = {
            "vec_us_per_row": round(1e6 * t_vec / n, 2),
            "scalar_us_per_row": round(1e6 * t_scal / n, 2),
            "speedup": round(t_scal / t_vec, 2),
            "bit_identical": bool((got == exact).all()),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

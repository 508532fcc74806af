"""functions.similarity: bit-exact Levenshtein vs DuckDB + nearest-match
tie-break rules."""

import duckdb
import pytest


def test_levenshtein_matches_duckdb_fuzz():
    import random

    from advanced_data_profile_ray.functions.similarity import levenshtein

    c = duckdb.connect()
    random.seed(11)
    cases = [("", ""), ("", "abc"), ("abc", ""), ("kitten", "sitting"),
             ("flaw", "lawn"), ("a", "a"), ("ab", "ba")]
    for _ in range(400):
        a = "".join(random.choices("abcde", k=random.randint(0, 12)))
        b = "".join(random.choices("abcdef", k=random.randint(0, 12)))
        cases.append((a, b))
    for a, b in cases:
        want = c.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_levenshtein_unicode():
    from advanced_data_profile_ray.functions.similarity import levenshtein

    assert levenshtein("café", "cafe") == 1
    assert levenshtein("naïve", "naive") == 1


def test_nearest_by_levenshtein_tiebreak():
    from advanced_data_profile_ray.functions.similarity import (
        nearest_by_levenshtein,
    )

    # 'ab' is distance 1 from both 'ab'-neighbors 'abc' and 'abd':
    # lexicographically smallest candidate wins
    nearest, dist = nearest_by_levenshtein(["ab"], ["abd", "abc", "ab"])
    assert nearest == ["abc"] and dist == [1]
    # a value equal to its only candidate has no nearest
    nearest, dist = nearest_by_levenshtein(["x"], ["x"])
    assert nearest == [None] and dist == [-1]


def test_jaro_winkler_vectorized_matches_duckdb_fuzz():
    """The vectorized-across-pairs kernel, the scalar reference, and
    DuckDB's jaro_winkler_similarity agree to 1e-12 on pinned edge
    cases (empty/empty = 0.0 per DuckDB, window-0 transposed pairs,
    the Winkler boost threshold) plus 800 random pairs."""
    import random

    import numpy as np

    from advanced_data_profile_ray.functions.jaro import (
        jaro_winkler_pairs, jaro_winkler_scalar)

    random.seed(23)
    cases = [("martha", "marhta"), ("DWAYNE", "DUANE"), ("", ""),
             ("", "x"), ("ab", "ba"), ("xy", "yx"), ("same", "same"),
             ("CRATE", "TRACE"), ("aaaa", "aaab"), ("a", "a"),
             ("Customer#000000001", "Customer#000000011"),
             ("a" * 30, "a" * 29 + "b"), ("abcd", "dcba")]
    alph = "abcde 0123xyz#é"
    for _ in range(800):
        a = "".join(random.choice(alph) for _ in range(random.randint(0, 18)))
        b = "".join(random.choice(alph) for _ in range(random.randint(0, 18)))
        cases.append((a, b))
    got = jaro_winkler_pairs([c[0] for c in cases], [c[1] for c in cases])
    c = duckdb.connect()
    for (a, b), g in zip(cases, got):
        want = c.execute("SELECT jaro_winkler_similarity(?, ?)",
                         [a, b]).fetchone()[0]
        assert abs(g - want) < 1e-12, (a, b, g, want)
        assert abs(g - jaro_winkler_scalar(a, b)) < 1e-12, (a, b)
    assert isinstance(got, np.ndarray) and got.dtype == np.float64


def test_logit_irls_parity_vs_local_numpy(ray_session):
    """logit_purchase_value (distributed IRLS over map_batches
    partials, fsum driver fold) reproduces a single-process numpy
    IRLS on the same rows to ~1e-9 relative — the correctness witness
    for the rows-only registry entry."""
    import numpy as np
    import pandas as pd

    from advanced_data_profile_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = QUERIES["logit_purchase_value"](sf)

    df = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "value"])
    df = df[df["event_type"].isin(["purchase", "view"])
            & df["value"].notna()]
    x = df["value"].to_numpy(np.float64)
    y = (df["event_type"] == "purchase").to_numpy(np.float64)
    mu = x.sum() / len(x)
    var = (x * x).sum() / len(x) - mu * mu
    sd = np.sqrt(var) if var > 0 else 1.0
    xs = (x - mu) / sd
    beta = np.zeros(2)
    for _ in range(8):
        p = 1.0 / (1.0 + np.exp(-(beta[0] + beta[1] * xs)))
        r = y - p
        w = p * (1.0 - p)
        g = np.array([r.sum(), (r * xs).sum()])
        h = np.array([[w.sum(), (w * xs).sum()],
                      [(w * xs).sum(), (w * xs * xs).sum()]])
        beta += np.linalg.solve(h, g)
    z = beta[0] + beta[1] * xs
    logloss = (np.logaddexp(0.0, z) - y * z).sum() / len(x)

    assert int(got["n"].iloc[0]) == len(x)
    assert abs(got["intercept"].iloc[0] - round(float(beta[0]), 6)) <= 1e-6
    assert abs(got["coef"].iloc[0] - round(float(beta[1]), 6)) <= 1e-6
    assert abs(got["logloss"].iloc[0] - round(float(logloss), 6)) <= 1e-6


def test_logit_irls_recovers_planted_signal(ray_session, tmp_path):
    """On a synthetic table where purchase probability genuinely
    follows a logistic curve in value (b0=-1, b1=2 on standardized
    value), the distributed fit recovers the planted coefficients
    within sampling error and beats the null model's log-loss."""
    import numpy as np
    import pandas as pd

    from advanced_data_profile_ray.pipelines.queries import QUERIES

    rng = np.random.RandomState(42)
    n = 40_000
    v = rng.gamma(2.0, 50.0, n)
    xs = (v - v.mean()) / v.std()
    p = 1.0 / (1.0 + np.exp(-(-1.0 + 2.0 * xs)))
    is_pos = rng.random_sample(n) < p
    df = pd.DataFrame({
        "event_type": np.where(is_pos, "purchase", "view"),
        "value": v,
    })
    d = tmp_path / "sfX"
    d.mkdir()
    df.to_parquet(d / "events.parquet", index=False)

    got = QUERIES["logit_purchase_value"](str(d))
    b0 = float(got["intercept"].iloc[0])
    b1 = float(got["coef"].iloc[0])
    assert abs(b0 - (-1.0)) < 0.12, b0
    assert abs(b1 - 2.0) < 0.12, b1
    base = is_pos.mean()
    null_ll = -(base * np.log(base) + (1 - base) * np.log(1 - base))
    assert float(got["logloss"].iloc[0]) < null_ll - 0.05

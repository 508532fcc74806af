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

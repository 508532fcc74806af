"""Text statistics kernels: syllable heuristics, readability, quality
signals, token counting.

Replaces the reference's textstat calls (flesch_reading_ease /
char_count / polysyllabcount / monosyllabcount over CONCATENATED text,
Profiler.py:857-864) with additive per-document counts that sum-merge
(never concatenate gigabytes of text — SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

WORD_RE = re.compile(r"[A-Za-zà-ÿ']+")
SENT_RE = re.compile(r"[.!?]+")
VOWEL_GROUP_RE = re.compile(r"[aeiouyà-ÿ]+", re.IGNORECASE)
PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")
DIGIT_RE = re.compile(r"[0-9]")
TOKEN_RE = re.compile(r"\S+")

STOPWORDS_EN = {
    "the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
    "with", "as", "on", "at", "this", "a", "an", "be", "by", "are",
}


def count_syllables(word: str) -> int:
    """Vowel-group syllable heuristic (deterministic textstat stand-in)."""
    groups = VOWEL_GROUP_RE.findall(word)
    n = len(groups)
    if n > 1 and word.lower().endswith("e") and not word.lower().endswith("le"):
        n -= 1
    return max(1, n)


def doc_text_counts(text: str) -> dict:
    """Additive per-doc counts for readability aggregates (A19/A20)."""
    words = WORD_RE.findall(text)
    syl = [count_syllables(w) for w in words]
    sentences = max(1, len(SENT_RE.findall(text)))
    return {
        "chars": len(text),
        "words": len(words),
        "sentences": sentences,
        "syllables": sum(syl),
        "monosyllables": sum(1 for s in syl if s == 1),
        "polysyllables": sum(1 for s in syl if s >= 3),
    }


def flesch_reading_ease(words: int, sentences: int, syllables: int) -> float:
    """Flesch formula on merged counts (206.835 - 1.015 W/S - 84.6 Sy/W)."""
    if words == 0 or sentences == 0:
        return 0.0
    return 206.835 - 1.015 * (words / sentences) - 84.6 * (syllables / words)


def is_valid_text(text: str, min_word_count: int = 5) -> bool:
    """Reference gate: ≥5 words (is_valid_text, Profiler.py:336-338)."""
    return len(text.split()) >= min_word_count


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Vectorized per-doc quality signals: lengths and character-class
    ratios via pandas str kernels (no Python per-row loop)."""
    t = texts.fillna("")
    length = t.str.len()
    tokens = t.str.count(TOKEN_RE.pattern)
    punct = t.str.count(PUNCT_RE.pattern)
    digits = t.str.count(DIGIT_RE.pattern)
    upper = t.str.count(r"[A-Z]")
    spaces = t.str.count(r"\s")
    safe_len = length.clip(lower=1)
    mean_word_len = (length - spaces).clip(lower=0) / tokens.clip(lower=1)
    return pd.DataFrame(
        {
            "char_count": length.astype("int64"),
            "token_count": tokens.astype("int64"),
            "punct_ratio": (punct / safe_len).round(6),
            "digit_ratio": (digits / safe_len).round(6),
            "upper_ratio": (upper / safe_len).round(6),
            "mean_word_len": mean_word_len.round(6),
        }
    )


def quality_score(feats: pd.DataFrame, stop_ratio: pd.Series) -> pd.Series:
    """Composite 0-100 quality score from the feature frame: length in a
    sane band, healthy stopword share, low digit/punct noise, plausible
    word lengths. Deterministic; tuned for training-data filtering."""
    length_ok = np.clip(feats["token_count"] / 20.0, 0, 1) * np.clip(
        (5000 - feats["char_count"]) / 5000.0, 0, 1
    )
    stop_ok = np.clip(stop_ratio / 0.3, 0, 1)
    noise = np.clip(1 - 2 * (feats["digit_ratio"] + feats["punct_ratio"]), 0, 1)
    wordlen_ok = np.exp(-((feats["mean_word_len"] - 5.0) ** 2) / 18.0)
    score = 100.0 * (0.35 * length_ok + 0.25 * stop_ok + 0.25 * noise + 0.15 * wordlen_ok)
    return score.round(2)


def stopword_ratio(texts: pd.Series) -> pd.Series:
    toks = texts.fillna("").str.lower().str.findall(r"[a-z']+")
    return toks.map(
        lambda ws: sum(w in STOPWORDS_EN for w in ws) / len(ws) if ws else 0.0
    )

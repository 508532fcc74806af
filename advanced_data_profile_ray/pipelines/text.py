"""Text-analysis pipelines over a documents Dataset: language ID,
quality scoring, readability aggregates, fingerprints, TF-IDF top
n-grams, word frequencies.

Reference parity: language detection runs over the DEDUPLICATED text
domain like the reference (unique values first — Profiler.py:662-670);
readability counts are additive partials (A19/A20); TF-IDF top n-grams
reproduce mean-tfidf top-k (A21, Profiler.py:800-809); word frequencies
back the word-cloud (A22).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.langid import detect_language
from ..functions.textstats import (
    doc_text_counts,
    flesch_reading_ease,
    is_valid_text,
    quality_features,
    quality_score,
    stopword_ratio,
)


class LangIdStage:
    """Actor-pool language-ID stage with a per-actor LRU cache
    (the reference's @lru_cache, per actor instead of per process)."""

    def __init__(self, text_col: str = "text", cache_size: int = 4096):
        import functools

        self.text_col = text_col
        self.detect = functools.lru_cache(maxsize=cache_size)(detect_language)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        langs, confs = [], []
        for t in df[self.text_col]:
            lang, conf = self.detect(t or "")
            langs.append(lang)
            confs.append(conf)
        df = df.copy()
        df["detected_lang"] = langs
        df["lang_confidence"] = confs
        return df


def detect_languages(ds, text_col: str = "text", concurrency=(1, 8)):
    """Language ID over the dataset (actor pool; model-free heuristic)."""
    return ds.map_batches(
        LangIdStage,
        fn_constructor_args=(text_col,),
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
    )


# per-worker-process LangIdStage cache: a plain map_batches fn with a
# process-global stage gives actor-style once-per-worker init while
# scheduling at full task-pool width (no actor-pool ramp-up)
_PROC_LANG_STAGES: dict = {}


def _proc_lang_stage(text_col: str) -> "LangIdStage":
    st = _PROC_LANG_STAGES.get(text_col)
    if st is None:
        st = _PROC_LANG_STAGES[text_col] = LangIdStage(text_col)
    return st


def language_histogram(ds, text_col: str = "text") -> pd.DataFrame:
    """(detected_lang, n) over the distinct text domain — dedup first like
    the reference (unique values, Profiler.py:663), but fully distributed:
    content-hash per batch → one sorted_groupby exchange keeps one text
    per distinct content → language ID runs in map tasks over the deduped
    Dataset → per-batch lang counts merge into a tiny histogram. No
    ``ds.unique()``: the driver only ever sees (lang, n) partials."""
    import ray.data as rd

    from ..functions.hashing import hash_strings
    from ..stages.fast_ops import sorted_groupby

    def _hash_dedup(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        texts = col.drop_null()
        if len(texts) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             text_col: pa.array([], pa.string())})
        tn = texts.to_numpy(zero_copy_only=False)
        h = hash_strings(tn).view(np.int64)
        uniq_h, first = np.unique(h, return_index=True)
        return pa.table({"h": pa.array(uniq_h, pa.int64()),
                         text_col: pa.array(tn[first], pa.string())})

    hashed = ds.select_columns([text_col]).map_batches(
        _hash_dedup, batch_format="pyarrow", batch_size=8192
    )
    # one exchange: hash-keyed dedup (min(text) is a deterministic pick;
    # all texts in a group are equal modulo a 2^-64 hash collision)
    inner, edge = sorted_groupby(hashed, ["h"], [(text_col, "min", text_col)])
    uniq_ds = inner.select_columns([text_col])
    if edge is not None and edge.num_rows:
        uniq_ds = uniq_ds.union(rd.from_arrow(edge.select([text_col])))

    def _lang_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = _proc_lang_stage(text_col)(df)
        vc = out["detected_lang"].value_counts()
        return pd.DataFrame({"detected_lang": vc.index.astype(str),
                             "n": vc.to_numpy(dtype="int64")})

    parts = uniq_ds.map_batches(
        _lang_counts, batch_format="pandas", batch_size=4096
    ).to_pandas()
    hist = parts.groupby("detected_lang", as_index=False)["n"].sum()
    return (
        hist.sort_values(["n", "detected_lang"], ascending=[False, True])
        .reset_index(drop=True)
    )


def quality_scores(ds, id_col: str, text_col: str):
    """Per-doc quality features + composite score (vectorized stage)."""

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        feats = quality_features(df[text_col])
        sr = stopword_ratio(df[text_col])
        out = pd.DataFrame({id_col: df[id_col]})
        out = pd.concat([out, feats], axis=1)
        out["stopword_ratio"] = sr.round(6)
        out["quality_score"] = quality_score(feats, sr)
        return out

    return ds.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pandas", batch_size=8192
    )


def readability_aggregate(ds, text_col: str = "text") -> dict:
    """Merged additive text counts + mean flesch over valid (≥5-word)
    docs — phase-4 string stats (Profiler.py:857-864) without ever
    concatenating text."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"chars": 0, "words": 0, "sentences": 0, "syllables": 0,
                "monosyllables": 0, "polysyllables": 0,
                "flesch_sum": 0.0, "valid_docs": 0, "docs": 0}
        for t in df[text_col]:
            if t is None:
                continue
            rows["docs"] += 1
            c = doc_text_counts(t)
            for k in ("chars", "words", "sentences", "syllables",
                      "monosyllables", "polysyllables"):
                rows[k] += c[k]
            if is_valid_text(t):
                rows["valid_docs"] += 1
                rows["flesch_sum"] += flesch_reading_ease(
                    c["words"], c["sentences"], c["syllables"]
                )
        return pd.DataFrame([rows])

    parts = ds.select_columns([text_col]).map_batches(
        _partial, batch_format="pandas", batch_size=4096
    ).to_pandas()
    total = parts.sum()
    mean_flesch = (
        total["flesch_sum"] / total["valid_docs"] if total["valid_docs"] else 0.0
    )
    return {
        "char_count": int(total["chars"]),
        "word_count": int(total["words"]),
        "monosyllable_count": int(total["monosyllables"]),
        "polysyllable_count": int(total["polysyllables"]),
        "mean_flesch_reading_ease": round(float(mean_flesch), 4),
        "valid_docs": int(total["valid_docs"]),
        "docs": int(total["docs"]),
    }


_TOKEN_RE = re.compile(r"[a-z0-9']+")


def tfidf_top_ngrams(ds, text_col: str = "text", ngram_range=(1, 3),
                     top_k: int = 20) -> pd.DataFrame:
    """Mean TF-IDF top n-grams (A21): per-batch (ngram → tf, df) counts →
    vectorized sorted_groupby sum (the one real shuffle, keyed by ngram)
    → idf + mean-tfidf at the driver over the merged (small) vocabulary.

    Matches sklearn's TfidfVectorizer conventions the reference relies
    on: smooth idf ln((1+n)/(1+df))+1, l2 per-doc normalization omitted
    (reference averages raw tf-idf rows; we average tf*idf/doc_count —
    exact parity is asserted against a pure-pandas reimplementation in
    tests, not sklearn, which is absent here)."""
    from ..stages.fast_ops import sorted_groupby

    n_docs = ds.count()

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        tf: dict = {}
        dfreq: dict = {}
        for t in df[text_col]:
            if not t:
                continue
            toks = _TOKEN_RE.findall(t.lower())
            grams = []
            for n in range(ngram_range[0], ngram_range[1] + 1):
                grams.extend(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
            seen = set()
            for g in grams:
                tf[g] = tf.get(g, 0) + 1
                if g not in seen:
                    dfreq[g] = dfreq.get(g, 0) + 1
                    seen.add(g)
        if not tf:
            return pd.DataFrame({"ngram": [], "tf": [], "df": []})
        grams = list(tf)
        return pd.DataFrame(
            {"ngram": grams, "tf": [tf[g] for g in grams],
             "df": [dfreq[g] for g in grams]}
        )

    parts = ds.select_columns([text_col]).map_batches(
        _counts, batch_format="pandas", batch_size=4096
    )
    inner, edge = sorted_groupby(
        parts, ["ngram"], [("tf", "sum", "tf"), ("df", "sum", "df")]
    )
    rows = inner.take_all()
    merged = pd.DataFrame(rows) if rows else pd.DataFrame({"ngram": [], "tf": [], "df": []})
    if edge is not None and edge.num_rows:
        merged = pd.concat([merged, edge.to_pandas()], ignore_index=True)
        merged = merged.groupby("ngram", as_index=False).sum()
    if merged.empty:
        return pd.DataFrame({"ngram": [], "mean_tfidf": []})
    idf = np.log((1 + n_docs) / (1 + merged["df"])) + 1.0
    merged["mean_tfidf"] = (merged["tf"] * idf / n_docs).round(8)
    out = (
        merged.sort_values(["mean_tfidf", "ngram"], ascending=[False, True])
        .head(top_k)[["ngram", "mean_tfidf"]]
        .reset_index(drop=True)
    )
    return out


def word_frequencies(ds, text_col: str = "text", top_k: int = 50) -> pd.DataFrame:
    """Word-cloud frequencies (A22): word → count via the vectorized
    grouped sum, top-k at the driver."""
    from ..stages.fast_ops import sorted_groupby

    def _words(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.lower().str.findall(r"[a-z']+")
        exploded = toks.explode().dropna()
        if exploded.empty:
            return pd.DataFrame({"word": [], "n": []})
        vc = exploded.value_counts()
        return pd.DataFrame({"word": vc.index, "n": vc.values})

    parts = ds.select_columns([text_col]).map_batches(
        _words, batch_format="pandas", batch_size=8192
    )
    inner, edge = sorted_groupby(parts, ["word"], [("n", "sum", "n")])
    rows = inner.take_all()
    merged = pd.DataFrame(rows) if rows else pd.DataFrame({"word": [], "n": []})
    if edge is not None and edge.num_rows:
        merged = pd.concat([merged, edge.to_pandas()], ignore_index=True)
        merged = merged.groupby("word", as_index=False).sum()
    merged["n"] = merged["n"].astype("int64")
    return (
        merged.sort_values(["n", "word"], ascending=[False, True])
        .head(top_k)
        .reset_index(drop=True)
    )


def fingerprints(ds, id_col: str, text_col: str, window: int = 16,
                 keep_mod: int = 8):
    """Per-doc winnowing fingerprints as (id, fingerprint_hash) rows —
    the containment-detection primitive. Fully vectorized: window hashes
    come straight off the Arrow string buffers (batch_window_hashes),
    mod-p selection + per-doc dedup via one np.unique over (doc, hash)
    pairs — no per-doc Python."""
    import pyarrow as pa

    from ..functions.hashing import batch_window_hashes

    def _fp(batch: pa.Table) -> pa.Table:
        h, doc_idx, _ = batch_window_hashes(batch[text_col], window)
        keep = h % np.uint64(keep_mod) == 0
        pairs = np.stack([doc_idx[keep], h[keep].view(np.int64)], axis=1)
        pairs = np.unique(pairs, axis=0)
        ids = batch[id_col].take(pa.array(pairs[:, 0]))
        return pa.table({id_col: ids,
                         "fp_hash": pa.array(pairs[:, 1], pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        _fp, batch_format="pyarrow", batch_size=8192
    )

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
import pyarrow.compute as pc

from ..functions.langid import detect_language
from ..functions.textstats import (
    doc_text_counts,
    flesch_reading_ease,
    is_valid_text,
    quality_features,
    quality_score,
    stopword_ratio,
)


def _raw_count(ds):
    """Row count of an UNPROJECTED dataset (metadata-only on parquet
    reads); None when counting would trigger execution-side work."""
    try:
        return ds.count()
    except Exception:
        return None


class LangIdStage:
    """Actor-pool language-ID stage with a per-actor LRU cache
    (the reference's @lru_cache, per actor instead of per process).

    Model swap point: ``__init__`` loads fastText lid.176 when the lib +
    weights exist (functions.langid.load_fasttext_model) and falls back
    to the deterministic heuristic otherwise — a real model drops in
    with zero changes to any pipeline."""

    def __init__(self, text_col: str = "text", cache_size: int = 4096,
                 model=None):
        import functools

        from ..functions.langid import load_fasttext_model

        self.text_col = text_col
        self.model = model if model is not None else load_fasttext_model()
        # the per-row LRU only backs the HEURISTIC: a real fastText model
        # predicts the whole batch in ONE call (round-2 next-round #5)
        self.detect = (None if self.model is not None
                       else functools.lru_cache(maxsize=cache_size)(detect_language))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.model is not None:
            texts = [(t or "").replace("\n", " ") for t in df[self.text_col]]
            labels, probs = self.model.predict(texts)
            langs = [(ls[0].replace("__label__", "") if ls else "English")
                     for ls in labels]
            confs = [(round(float(ps[0]) * 100.0, 2) if len(ps) else 100.0)
                     for ps in probs]
        else:
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

    from ..stages.fast_ops import spread_blocks

    return spread_blocks(ds.select_columns([id_col, text_col]),
                         rows=_raw_count(ds)).map_batches(
        _score, batch_format="pandas", batch_size=None
    )


def readability_aggregate(ds, text_col: str = "text") -> dict:
    """Merged additive text counts + mean flesch over valid (≥5-word)
    docs — phase-4 string stats (Profiler.py:857-864) without ever
    concatenating text."""

    from ..functions.textstats import SENT_RE, TOKEN_RE, VOWEL_GROUP_RE, WORD_RE

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized twin of doc_text_counts/is_valid_text/flesch over the
        # whole batch: per-doc counts via pandas str kernels, per-word
        # syllables on the exploded word array, per-doc sums via reduceat
        t = df[text_col].dropna()
        n_docs = len(t)
        if n_docs == 0:
            return pd.DataFrame([{
                "chars": 0, "words": 0, "sentences": 0, "syllables": 0,
                "monosyllables": 0, "polysyllables": 0,
                "flesch_sum": 0.0, "valid_docs": 0, "docs": 0}])
        chars = t.str.len().to_numpy()
        sentences = t.str.count(SENT_RE.pattern).clip(lower=1).to_numpy()
        valid = (t.str.count(TOKEN_RE.pattern) >= 5).to_numpy()
        word_lists = t.str.findall(WORD_RE).to_numpy()
        wcount = np.fromiter((len(w) for w in word_lists), np.int64, n_docs)
        syl_doc = np.zeros(n_docs, np.int64)
        mono_doc = np.zeros(n_docs, np.int64)
        poly_doc = np.zeros(n_docs, np.int64)
        total_w = int(wcount.sum())
        if total_w:
            flat = pd.Series(np.concatenate(word_lists)).str.lower()
            groups = flat.str.count(VOWEL_GROUP_RE.pattern).to_numpy()
            drop_e = (groups > 1) & flat.str.endswith("e").to_numpy() \
                & ~flat.str.endswith("le").to_numpy()
            syl = np.maximum(1, groups - drop_e)
            nonempty = wcount > 0
            starts = np.concatenate([[0], np.cumsum(wcount)[:-1]])[nonempty]
            syl_doc[nonempty] = np.add.reduceat(syl, starts)
            mono_doc[nonempty] = np.add.reduceat((syl == 1).astype(np.int64), starts)
            poly_doc[nonempty] = np.add.reduceat((syl >= 3).astype(np.int64), starts)
        ok = valid & (wcount > 0) & (sentences > 0)
        w = wcount[ok].astype(np.float64)
        flesch = 206.835 - 1.015 * (w / sentences[ok]) - 84.6 * (syl_doc[ok] / w)
        return pd.DataFrame([{
            "chars": int(chars.sum()), "words": total_w,
            "sentences": int(sentences.sum()), "syllables": int(syl_doc.sum()),
            "monosyllables": int(mono_doc.sum()),
            "polysyllables": int(poly_doc.sum()),
            "flesch_sum": float(flesch.sum()), "valid_docs": int(valid.sum()),
            "docs": n_docs}])

    from ..stages.fast_ops import spread_blocks

    parts = spread_blocks(ds.select_columns([text_col]),
                          rows=_raw_count(ds)).map_batches(
        _partial, batch_format="pandas", batch_size=None
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


def _table_topk(t: pa.Table, sort_keys: list, k: int) -> pa.Table:
    """Top-k rows of an Arrow table under ``sort_keys`` — shared by the
    per-block cut inside map tasks and the driver's final merge. Callers
    must sort on the SAME (already-rounded) key both places, so a
    rounded tie whose tiebreak wins globally survives the per-block cut
    (same discipline as q3_shipping's _topk)."""
    idx = pc.sort_indices(t, sort_keys=sort_keys)
    return t.take(idx.slice(0, k))


def tfidf_top_ngrams(ds, text_col: str = "text", ngram_range=(1, 3),
                     top_k: int = 20) -> pd.DataFrame:
    """Mean TF-IDF top n-grams (A21): per-batch (ngram → tf, df) counts →
    vectorized sorted_groupby sum (the one real shuffle, keyed by ngram)
    → idf + mean-tfidf + per-block top-k INSIDE the post-exchange map
    tasks; the driver merges k rows per block, never the vocabulary.

    Matches sklearn's TfidfVectorizer conventions the reference relies
    on: smooth idf ln((1+n)/(1+df))+1, l2 per-doc normalization omitted
    (reference averages raw tf-idf rows; we average tf*idf/doc_count —
    exact parity is asserted against a pure-pandas reimplementation in
    tests, not sklearn, which is absent here)."""
    from ..stages.fast_ops import sorted_groupby

    n_docs = ds.count()

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized n-gram counting: tokenize the whole batch with one
        # pandas findall, build n-grams by shifted elementwise joins over
        # the flattened token array (masking grams that straddle doc
        # boundaries), then tf = value_counts and df = value_counts of
        # the deduped (doc, gram) pairs — no per-doc Python loop
        empty = pd.DataFrame({"ngram": [], "tf": [], "df": []})
        tok_lists = df[text_col].fillna("").str.lower().str.findall(_TOKEN_RE)
        wcount = tok_lists.str.len().to_numpy()
        total = int(wcount.sum())
        if total == 0:
            return empty
        # object dtype: np.concatenate would infer fixed-width unicode,
        # which numpy refuses to `+`-join elementwise
        flat = np.concatenate(tok_lists.to_numpy()).astype(object)
        doc_idx = np.repeat(np.arange(len(tok_lists)), wcount)
        gram_parts, gdoc_parts = [], []
        for n in range(ngram_range[0], ngram_range[1] + 1):
            if n > total:
                break
            L = total - n + 1
            g = flat[:L].copy()
            for k in range(1, n):
                g = g + " "
                g = g + flat[k : L + k]
            same_doc = doc_idx[:L] == doc_idx[n - 1 :]
            gram_parts.append(g[same_doc])
            gdoc_parts.append(doc_idx[:L][same_doc])
        if not gram_parts:
            return empty
        grams = np.concatenate(gram_parts)
        gdocs = np.concatenate(gdoc_parts)
        tf = pd.Series(grams).value_counts()
        dfreq = (
            pd.DataFrame({"ngram": grams, "doc": gdocs})
            .drop_duplicates()["ngram"]
            .value_counts()
        )
        return pd.DataFrame(
            {"ngram": tf.index, "tf": tf.to_numpy(),
             "df": dfreq.reindex(tf.index).to_numpy()}
        )

    from ..stages.fast_ops import spread_blocks

    parts = spread_blocks(ds.select_columns([text_col]),
                          rows=_raw_count(ds)).map_batches(
        _counts, batch_format="pandas", batch_size=None
    )
    inner, edge = sorted_groupby(
        parts, ["ngram"], [("tf", "sum", "tf"), ("df", "sum", "df")]
    )

    # task-side idf + top-k: after the ngram exchange every inner block
    # holds COMPLETE groups and n_docs is already global, so mean_tfidf
    # and the top-k cut run inside the map task — the driver merges
    # k rows per block + the tiny edge table, never the vocabulary
    # (at transcript scale the 1-3-gram vocabulary is billions of rows).
    def _block_tfidf(t: pa.Table, rows=None) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "mean_tfidf": pa.array([], pa.float64())})
        tf = t["tf"].to_numpy().astype(np.float64)
        idf = np.log((1.0 + n_docs) / (1.0 + t["df"].to_numpy())) + 1.0
        out = pa.table({
            "ngram": t["ngram"],
            "mean_tfidf": pa.array(np.round(tf * idf / n_docs, 8)),
        })
        return _table_topk(out, [("mean_tfidf", "descending"),
                                 ("ngram", "ascending")], top_k)

    tops = inner.map_batches(
        _block_tfidf, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if edge is not None and edge.num_rows:
        tops = pd.concat([tops, _block_tfidf(edge).to_pandas()],
                         ignore_index=True)
    if tops.empty:
        return pd.DataFrame({"ngram": [], "mean_tfidf": []})
    return (
        tops.sort_values(["mean_tfidf", "ngram"], ascending=[False, True])
        .head(top_k)
        .reset_index(drop=True)
    )


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

    from ..stages.fast_ops import spread_blocks

    parts = spread_blocks(ds.select_columns([text_col]),
                          rows=_raw_count(ds)).map_batches(
        _words, batch_format="pandas", batch_size=None
    )
    inner, edge = sorted_groupby(parts, ["word"], [("n", "sum", "n")])

    # per-block top-k inside the map task (complete groups after the
    # exchange); driver merges k×blocks rows + edge table, never the
    # full word domain — same shape as tfidf_top_ngrams
    def _block_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = pa.table({"word": t["word"], "n": pc.cast(t["n"], pa.int64())})
        return _table_topk(t, [("n", "descending"), ("word", "ascending")],
                           top_k)

    tops = inner.map_batches(
        _block_top, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if edge is not None and edge.num_rows:
        tops = pd.concat([tops, _block_top(edge).to_pandas()],
                         ignore_index=True)
    if tops.empty:
        return pd.DataFrame({"word": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    tops["n"] = tops["n"].astype("int64")
    return (
        tops.sort_values(["n", "word"], ascending=[False, True])
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

    from ..stages.fast_ops import spread_blocks

    return spread_blocks(ds.select_columns([id_col, text_col]),
                         rows=_raw_count(ds)).map_batches(
        _fp, batch_format="pyarrow", batch_size=None
    )


def _batch_ngram_arrays(texts: "pd.Series", n: int):
    """(grams, doc_idx) for one batch — the tfidf shifted-join trick
    restricted to a single n: tokenize the whole batch with one pandas
    findall, join n consecutive tokens elementwise over the flattened
    token array, mask grams straddling doc boundaries. No per-doc
    Python loop."""
    tok_lists = texts.fillna("").str.lower().str.findall(_TOKEN_RE)
    wcount = tok_lists.str.len().to_numpy()
    total = int(wcount.sum())
    if total == 0 or n > total:
        return None, None
    flat = np.concatenate(tok_lists.to_numpy()).astype(object)
    doc_idx = np.repeat(np.arange(len(tok_lists)), wcount)
    L = total - n + 1
    g = flat[:L].copy()
    for k in range(1, n):
        g = g + " "
        g = g + flat[k:L + k]
    same_doc = doc_idx[:L] == doc_idx[n - 1:]
    return g[same_doc], doc_idx[:L][same_doc]


def contamination_check(docs_ds, bench_ds, id_col: str, text_col: str,
                        n: int = 5):
    """Benchmark decontamination: per corpus document, how many of its
    token n-gram positions also occur in a benchmark/eval document set
    — the standard train-set hygiene check before LLM training.

    Scale shape: the benchmark side (eval sets: 10^5–10^7 grams) maps
    to per-batch UNIQUE gram hashes, driver-deduped and broadcast ONCE
    as a sorted uint64 array via ``ray.put``; the corpus side streams
    through map_batches — vectorized n-gram build, one hash pass, one
    searchsorted membership, per-doc counts via bincount. The corpus
    (the big side) is never shuffled and never leaves its blocks. A
    benchmark too big to broadcast graduates to the partitioned Bloom
    builder (stages/bloomjoin) with an exact re-check on hits.

    Returns a Dataset of (id, n_grams, n_hits) — one row per document
    with ≥1 n-gram; hits are counted per POSITION (duplicate grams in a
    doc each count), matching the LEFT-JOIN SQL twin."""
    import pyarrow as pa
    import ray

    from ..functions.hashing import hash_strings
    from ..stages.fast_ops import spread_blocks

    def _bench(df: pd.DataFrame) -> pd.DataFrame:
        g, _ = _batch_ngram_arrays(df[text_col], n)
        if g is None:
            return pd.DataFrame({"h": pd.Series([], dtype="uint64")})
        return pd.DataFrame({"h": np.unique(hash_strings(g))})

    blocks = ray.get(
        spread_blocks(bench_ds.select_columns([text_col]),
                      rows=_raw_count(bench_ds)).map_batches(
            _bench, batch_format="pandas", batch_size=None
        ).to_arrow_refs())
    parts = [b["h"].to_numpy(zero_copy_only=False) for b in blocks
             if b.num_rows]
    bench_sorted = (np.unique(np.concatenate(parts)) if parts
                    else np.empty(0, np.uint64))
    ref = ray.put(bench_sorted)

    def _probe(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: df[id_col].iloc[:0],
                              "n_grams": pd.Series([], dtype="int64"),
                              "n_hits": pd.Series([], dtype="int64")})
        g, didx = _batch_ngram_arrays(df[text_col], n)
        if g is None:
            return empty
        bench = ray.get(ref)  # zero-copy from the object store
        h = hash_strings(g)
        if bench.size:
            pos = np.searchsorted(bench, h)
            pos_c = np.minimum(pos, bench.size - 1)
            hit = bench[pos_c] == h
        else:
            hit = np.zeros(h.size, bool)
        n_grams = np.bincount(didx, minlength=len(df)).astype(np.int64)
        n_hits = np.bincount(didx, weights=hit,
                             minlength=len(df)).astype(np.int64)
        keep = n_grams > 0
        return pd.DataFrame({id_col: df[id_col].to_numpy()[keep],
                             "n_grams": n_grams[keep],
                             "n_hits": n_hits[keep]})

    return spread_blocks(docs_ds.select_columns([id_col, text_col]),
                         rows=_raw_count(docs_ds)).map_batches(
        _probe, batch_format="pandas", batch_size=None)


# RE2 syntax on BOTH sides of the oracle: pyarrow's replace_substring_regex
# and DuckDB's regexp_replace are each RE2, so the redaction transform is
# exactly SQL-twinnable. Order matters (applied sequentially): emails
# first (their digits/dots must not half-match later patterns), then the
# most-specific digit shapes before the most general.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_pii(ds, id_col: str, text_col: str):
    """PII redaction (training-data scrubbing): emails / SSNs / phone
    numbers / IPv4s replaced with typed placeholders, per-doc redaction
    count alongside — one embarrassingly-parallel vectorized map, RE2
    kernels per batch, no exchange. Null text stays null with count 0.
    Returns a Dataset (id, text_redacted, n_redactions int64)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.fast_ops import spread_blocks

    def _fn(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = np.zeros(t.num_rows, dtype=np.int64)
        for _, pat, rep in PII_PATTERNS:
            # count on the PROGRESSIVELY redacted text (same order the
            # SQL twin counts), then replace
            c = pc.count_substring_regex(col, pat)
            n += pc.fill_null(c, 0).to_numpy(zero_copy_only=False).astype(np.int64)
            col = pc.replace_substring_regex(col, pattern=pat, replacement=rep)
        return pa.table({id_col: t[id_col], "text_redacted": col,
                         "n_redactions": pa.array(n, pa.int64())})

    return spread_blocks(ds.select_columns([id_col, text_col]),
                         rows=_raw_count(ds)).map_batches(
        _fn, batch_format="pyarrow", batch_size=None)


def repetition_stats(ds, id_col: str, text_col: str):
    """Gopher-style per-doc REPETITION features (quality-filter rules for
    training corpora: Rae et al. 2021 "Scaling Language Models", table
    A1): duplicate-word fraction, top-word fraction, duplicate-bigram
    fraction. The reference's profiler exposes uniqueness ratios per
    COLUMN (Profiler.py:330-338); this is the per-DOCUMENT analog a
    100-TB corpus filter needs.

    Distributed shape: a ZERO-exchange vectorized map — every feature is
    intra-document, so blocks never talk to each other. Tokenization is
    single-space split (exactly DuckDB's ``string_split(text, ' ')`` with
    empties dropped) so the oracle twin is bit-exact. Per batch the
    token stream is factorized once; per-doc distinct/max counts come
    from ``np.unique`` on a composite (doc, code) int64 key + ``reduceat``
    — no Python loop over rows or tokens.
    """

    def _rep(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        ids = df[id_col].to_numpy()
        if n == 0:
            return pd.DataFrame({
                id_col: ids,
                "n_words": np.zeros(0, np.int64),
                "n_distinct_words": np.zeros(0, np.int64),
                "dup_word_frac": np.zeros(0, np.float64),
                "top_word_frac": np.zeros(0, np.float64),
                "n_distinct_bigrams": np.zeros(0, np.int64),
                "dup_bigram_frac": np.zeros(0, np.float64),
            })
        flat, doc, _ = _split_tokens(df[text_col])
        codes, uniques = pd.factorize(flat)
        V = np.int64(len(uniques)) + 1
        codes = codes.astype(np.int64)

        n_words = np.bincount(doc, minlength=n).astype(np.int64)
        key = doc * V + codes
        uk, ucnt = np.unique(key, return_counts=True)
        udoc = uk // V
        n_distinct = np.bincount(udoc, minlength=n).astype(np.int64)
        max_c = np.zeros(n, np.int64)
        if uk.size:
            ud, starts = np.unique(udoc, return_index=True)
            max_c[ud] = np.maximum.reduceat(ucnt, starts)

        if doc.size > 1:
            adj = doc[1:] == doc[:-1]
            bdoc = doc[:-1][adj]
            bkey = codes[:-1][adj] * V + codes[1:][adj]
        else:
            bdoc = np.zeros(0, np.int64)
            bkey = np.zeros(0, np.int64)
        n_big = np.bincount(bdoc, minlength=n).astype(np.int64)
        # composite (doc, bigram) key: bkey < V² is always int64-safe
        # (V ≤ batch tokens), but docs·V² can overflow on huge batches —
        # re-factorize bigrams to a dense code space first in that case
        span = np.int64(V * V)
        if float(n) * float(span) >= 2.0**62:
            bcode, buniq = pd.factorize(bkey)
            span = np.int64(len(buniq)) + 1
            bkey = bcode.astype(np.int64)
        d_big = np.bincount(np.unique(bdoc * span + bkey) // span,
                            minlength=n).astype(np.int64)

        nw = np.maximum(n_words, 1).astype(np.float64)
        nb = np.maximum(n_big, 1).astype(np.float64)
        return pd.DataFrame({
            id_col: ids,
            "n_words": n_words,
            "n_distinct_words": n_distinct,
            "dup_word_frac": ((n_words - n_distinct) / nw).round(6),
            "top_word_frac": (max_c / nw).round(6),
            "n_distinct_bigrams": d_big,
            "dup_bigram_frac": ((n_big - d_big) / nb).round(6),
        })

    from ..stages.fast_ops import spread_blocks

    return spread_blocks(ds.select_columns([id_col, text_col]),
                         rows=_raw_count(ds)).map_batches(
        _rep, batch_format="pandas", batch_size=None)


def _split_tokens(texts: pd.Series):
    """Single-space tokenization shared with repetition_stats (exactly
    DuckDB ``string_split(text, ' ')`` with empties dropped): returns
    (flat token array, doc index array, n_docs)."""
    n = len(texts)
    tok = texts.fillna("").str.split(" ").to_numpy()
    lens = np.fromiter((len(x) for x in tok), np.int64, n)
    flat = np.concatenate(tok) if lens.sum() else np.empty(0, object)
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = flat != ""
    return flat[keep], doc[keep], n


def bigram_lm_surprisal(ds, id_col: str, text_col: str, model_ds=None):
    """BIGRAM LANGUAGE-MODEL quality scoring (the perplexity filter of
    training-data pipelines, e.g. CCNet / Gopher quality stage): build a
    Laplace-smoothed bigram LM over ``model_ds`` (default: the scored
    corpus itself), then score every document's mean token surprisal.
    Surprisal is an INTEGER: ``floor(-10^6 · log2((C(w1,w2)+1) /
    (C(w1)+V)))`` micro-bits per bigram, so per-doc totals are exact
    int64 sums — order-independent, exactly reproducible in SQL (the
    only float is the final total/n display division).

    Distributed shape: pass 1 builds unigram+bigram counts through ONE
    skinny exchange (a single token-pair stream where unigram rows carry
    an empty-string sentinel in w2; sorted_groupby pre-aggregates inside
    map tasks, so the exchange carries per-block distinct pairs, never
    tokens). The finished model broadcasts once via ray.put (assumption:
    the distinct-bigram table fits worker memory — word-level vocab,
    ~30 MB per million bigrams; cap or hash the tail for open-domain
    byte-level corpora). Pass 2 is a zero-exchange vectorized map:
    searchsorted word→id, combined-int64-key bigram lookup, reduceat
    per-doc sums. Unseen bigrams/unigrams fall back to the +1 smoothing
    mass (cross-corpus scoring exercises this; self-scoring never does).
    Returns a Dataset (id, n_bigrams, total_surprisal_microbits)."""
    import ray

    from ..stages.fast_ops import sorted_groupby, spread_blocks

    if model_ds is None:
        model_ds = ds

    def _pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        flat, doc, _ = _split_tokens(df[text_col])
        if flat.size == 0:
            return pd.DataFrame({"w1": pd.Series([], dtype=object),
                                 "w2": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        adj = doc[1:] == doc[:-1]
        w1 = np.concatenate([flat, flat[:-1][adj]])
        # unigram rows: sentinel '' in w2 (never a token — empties dropped)
        w2 = np.concatenate([np.full(flat.size, "", object), flat[1:][adj]])
        out = pd.DataFrame({"w1": w1, "w2": w2})
        return (out.groupby(["w1", "w2"], sort=False).size()
                .rename("n").reset_index())

    pre = model_ds.select_columns([text_col]).map_batches(
        _pair_counts, batch_format="pandas", batch_size=None)
    inner, edge = sorted_groupby(pre, ["w1", "w2"], [("n", "sum", "n")])
    counts = inner.to_pandas()
    if edge is not None and edge.num_rows:
        counts = pd.concat([counts, edge.to_pandas()], ignore_index=True)
    if len(counts) == 0:
        # fully empty model corpus: ray to_pandas drops columns on
        # all-empty blocks — pin the typed empty frame
        counts = pd.DataFrame({"w1": pd.Series([], dtype=object),
                               "w2": pd.Series([], dtype=object),
                               "n": pd.Series([], dtype="int64")})

    uni = counts[counts["w2"] == ""].sort_values("w1")
    uni_words = uni["w1"].to_numpy()
    uni_counts = uni["n"].to_numpy().astype(np.int64)
    V = np.int64(len(uni_words))
    big = counts[counts["w2"] != ""]
    i1 = np.searchsorted(uni_words, big["w1"].to_numpy())
    i2 = np.searchsorted(uni_words, big["w2"].to_numpy())
    bkey = i1 * (V + 1) + i2
    order = np.argsort(bkey)
    model_ref = ray.put((uni_words, uni_counts, bkey[order],
                         big["n"].to_numpy().astype(np.int64)[order]))

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        uw, uc, bk, bc = ray.get(model_ref)
        ids = df[id_col].to_numpy()
        n = len(df)
        flat, doc, _ = _split_tokens(df[text_col])
        nb = np.zeros(n, np.int64)
        tot = np.zeros(n, np.int64)
        if flat.size > 1:
            adj = doc[1:] == doc[:-1]
            bdoc = doc[:-1][adj]
            w1, w2 = flat[:-1][adj], flat[1:][adj]
            # word → model id; OOV words get C(w)=0 (smoothing mass only)
            # np.where evaluates both branches, so fancy-index lookups
            # must stay in-bounds even when the model side is EMPTY (a
            # degenerate model corpus: no vocab, or only 1-token docs
            # hence zero bigrams) — clamp-then-mask handles both
            if uw.size:
                p1 = np.searchsorted(uw, w1)
                in1 = (p1 < uw.size)
                in1[in1] = uw[p1[in1]] == w1[in1]
                cu = np.where(in1, uc[np.minimum(p1, uw.size - 1)], 0)
                p2 = np.searchsorted(uw, w2)
                in2 = (p2 < uw.size)
                in2[in2] = uw[p2[in2]] == w2[in2]
                key = np.where(in1 & in2,
                               p1 * (np.int64(uw.size) + 1) + p2, -1)
            else:
                cu = np.zeros(w1.size, np.int64)
                key = np.full(w1.size, -1, np.int64)
            if bk.size:
                pb = np.searchsorted(bk, key)
                hit = (pb < bk.size) & (key >= 0)
                hit[hit] = bk[np.minimum(pb, bk.size - 1)][hit] == key[hit]
                cb = np.where(hit, bc[np.minimum(pb, bk.size - 1)], 0)
            else:
                cb = np.zeros(w1.size, np.int64)
            # V=0 (empty model) degrades to p = 1/(0+0+1)? — use V>=1 so
            # the smoothing mass stays a valid probability
            vv = np.float64(max(uw.size, 1))
            s = np.floor(-1e6 * np.log2(
                (cb + 1.0) / (cu + vv))).astype(np.int64)
            if bdoc.size:
                nb = np.bincount(bdoc, minlength=n).astype(np.int64)
                ud, starts = np.unique(bdoc, return_index=True)
                tot[ud] = np.add.reduceat(s, starts)
        return pd.DataFrame({id_col: ids, "n_bigrams": nb,
                             "total_surprisal_microbits": tot})

    return spread_blocks(ds.select_columns([id_col, text_col]),
                         rows=_raw_count(ds)).map_batches(
        _score, batch_format="pandas", batch_size=None)

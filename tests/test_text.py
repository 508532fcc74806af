"""Text-analysis pipelines: language ID, quality, readability, TF-IDF,
word frequencies, fingerprints — against pure-pandas/Counter ground
truth."""

import collections
import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from advanced_data_profile_ray.functions.langid import detect_language
from advanced_data_profile_ray.functions.textstats import (
    count_syllables,
    doc_text_counts,
    flesch_reading_ease,
)


class TestLangId:
    def test_scripts(self):
        assert detect_language("привет как дела сегодня")[0] == "Russian"
        assert detect_language("你好世界这是测试")[0] == "Chinese"
        assert detect_language("مرحبا بالعالم")[0] == "Arabic"
        assert detect_language("こんにちは")[0] == "Japanese"

    def test_latin(self):
        assert detect_language("the quick brown fox is in the barn and it was fast")[0] == "English"
        assert detect_language("el perro y el gato en la casa con los niños para que")[0] == "Spanish"
        assert detect_language("der Hund ist mit den Kindern auf der Straße und nicht im Haus")[0] == "German"

    def test_empty_and_none(self):
        assert detect_language("")[0] == "English"
        assert detect_language("12345 !!!")[0] == "English"

    def test_deterministic(self):
        t = "le chat est dans la maison et il est pour les enfants"
        assert detect_language(t) == detect_language(t)


class TestTextStats:
    def test_syllables(self):
        assert count_syllables("cat") == 1
        assert count_syllables("table") == 2
        assert count_syllables("beautiful") >= 3

    def test_flesch_bounds(self):
        easy = flesch_reading_ease(words=100, sentences=10, syllables=120)
        hard = flesch_reading_ease(words=100, sentences=3, syllables=220)
        assert easy > hard
        assert flesch_reading_ease(0, 0, 0) == 0.0

    def test_doc_counts(self):
        c = doc_text_counts("The cat sat. The dog ran!")
        assert c["words"] == 6
        assert c["sentences"] == 2
        assert c["monosyllables"] == 6


def _docs_table():
    texts = [
        "the quick brown fox jumps over the lazy dog and runs far away",
        "data systems scale with careful partitioning and streaming merges",
        "1234 5678 9999 @@@ ### $$$ %%%",
        "the the the the the the the the",
        None,
        "short",
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_quality_scores(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.text import quality_scores

    out = quality_scores(rd.from_arrow(_docs_table()), "doc_id", "text").to_pandas()
    out = out.set_index("doc_id")
    assert out.loc[0, "quality_score"] > out.loc[2, "quality_score"]  # prose > garbage
    assert out.loc[2, "digit_ratio"] > 0.3
    assert out.loc[4, "char_count"] == 0  # null text
    assert out.loc[0, "token_count"] == 13


def test_readability_aggregate(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.text import readability_aggregate

    agg = readability_aggregate(rd.from_arrow(_docs_table()))
    # direct computation
    texts = [t for t in _docs_table()["text"].to_pylist() if t is not None]
    want_chars = sum(len(t) for t in texts)
    assert agg["char_count"] == want_chars
    assert agg["docs"] == len(texts)
    # >=5 whitespace tokens (reference splits on whitespace, so the
    # digit/punct doc with 7 tokens counts as valid too)
    assert agg["valid_docs"] == 4
    assert agg["mean_flesch_reading_ease"] != 0.0


def test_word_frequencies(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.text import word_frequencies

    out = word_frequencies(rd.from_arrow(_docs_table()), top_k=100)
    counter = collections.Counter()
    for t in _docs_table()["text"].to_pylist():
        if t:
            counter.update(re.findall(r"[a-z']+", t.lower()))
    got = dict(zip(out["word"], out["n"]))
    assert got == dict(counter)


def test_tfidf_top_ngrams(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.text import tfidf_top_ngrams

    tbl = _docs_table()
    out = tfidf_top_ngrams(rd.from_arrow(tbl), ngram_range=(1, 2), top_k=10)
    # pure-pandas ground truth
    texts = tbl["text"].to_pylist()
    n_docs = len(texts)
    tf, dfreq = collections.Counter(), collections.Counter()
    for t in texts:
        if not t:
            continue
        toks = re.findall(r"[a-z0-9']+", t.lower())
        grams = toks + [" ".join(toks[i:i+2]) for i in range(len(toks)-1)]
        tf.update(grams)
        dfreq.update(set(grams))
    scores = {
        g: round(tf[g] * (math.log((1 + n_docs) / (1 + dfreq[g])) + 1) / n_docs, 8)
        for g in tf
    }
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(out["ngram"], out["mean_tfidf"]))
    assert got == [(g, pytest.approx(s, abs=1e-8)) for g, s in want]


def test_fingerprints_overlap(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.text import fingerprints

    import numpy as np

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "tokens", "stream", "merge",
             "window", "sketch", "verify", "buffer", "anchor", "winnow"]
    # non-repetitive text → many distinct windows → stable Jaccard
    base = " ".join(rng.choice(words, 400))
    shifted = "PREFIX ADDED " + base  # same content, shifted alignment
    other_words = ["zulu", "quark", "nimbus", "osprey", "jackal", "vortex",
                   "rhubarb", "kelp", "umber", "pylon", "crag", "fjord"]
    other = " ".join(rng.choice(other_words, 400))
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([base, shifted, other], pa.string())})
    fp = fingerprints(rd.from_arrow(t), "doc_id", "text").to_pandas()
    sets = {i: set(fp[fp["doc_id"] == i]["fp_hash"]) for i in (1, 2, 3)}
    overlap_12 = len(sets[1] & sets[2]) / max(1, len(sets[1] | sets[2]))
    overlap_13 = len(sets[1] & sets[3]) / max(1, len(sets[1] | sets[3]))
    assert overlap_12 >= 0.7         # shifted copy shares fingerprints
    assert overlap_13 < 0.05         # unrelated doc doesn't


def test_language_histogram(ray_session):
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.text import language_histogram

    t = pa.table({"text": pa.array(
        ["hello world this is fine"] * 3 + ["привет мир сегодня"] * 2 + [None],
        pa.string())})
    hist = language_histogram(rd.from_arrow(t))
    got = dict(zip(hist["detected_lang"], hist["n"]))
    # unique-domain counting: 1 distinct English text, 1 distinct Russian
    assert got == {"English": 1, "Russian": 1}


def test_langid_stage_batches_model_predict():
    """When a (fastText-shaped) model is present, the stage predicts the
    WHOLE batch in one call — no per-row Python loop (round-2 #5)."""
    import pandas as pd

    from advanced_data_profile_ray.pipelines.text import LangIdStage

    calls = []

    class FakeModel:
        def predict(self, texts):
            assert isinstance(texts, list)  # batch call, not per-row str
            calls.append(len(texts))
            return ([["__label__fr"] if "bonjour" in t else ["__label__en"]
                     for t in texts],
                    [[0.9]] * len(texts))

    stage = LangIdStage("text", model=FakeModel())
    out = stage(pd.DataFrame({"text": ["bonjour le monde", "hello", None]}))
    assert calls == [3]  # exactly one predict call for the whole batch
    assert out["detected_lang"].tolist() == ["fr", "en", "en"]
    assert out["lang_confidence"].tolist() == [90.0, 90.0, 90.0]


def test_format_cache_orders_candidates_and_records():
    """S4 parity: the format cache is consulted first and updated on every
    winning parse (Profiler.py:126-135,181-193 as a mergeable counter)."""
    import pyarrow as pa

    from advanced_data_profile_ray.functions.dates import (
        ALL_FORMATS,
        FormatCache,
        try_parse_datetime_strings,
    )

    cache = FormatCache()
    arr = pa.array(["12/31/2021 10:00:00", "01/02/2022 11:30:00"])
    out = try_parse_datetime_strings(arr, column="ts_col", cache=cache)
    assert out is not None
    [(key, n)] = cache.hits.items()
    assert key[0] == "ts_col" and n == 1
    fmt = key[1]
    # cache-first candidate ordering on the next call
    assert cache.candidates_for("ts_col")[0] == fmt
    # second parse bumps the counter
    try_parse_datetime_strings(arr, column="ts_col", cache=cache)
    assert cache.hits[key] == 2
    # merge = counter sum (checkpoint metadata contract)
    merged = cache.merge(cache)
    assert merged.hits[key] == 4
    # unknown column falls back to canonical order
    assert cache.candidates_for("other")[: len(ALL_FORMATS)] == ALL_FORMATS


def test_contamination_counts_planted_overlap(ray_session):
    """Planted benchmark overlap: a corpus doc embedding an exact
    benchmark span reports exactly span_len-n+1 hit positions; disjoint
    docs report zero."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.text import contamination_check

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = [
        # embeds an 8-token benchmark span → 8-5+1 = 4 hit positions
        "xx yy " + bench_text + " zz ww",
        "one two three four five six seven",          # disjoint: 0 hits
        "alpha beta gamma",                            # < n tokens: no row
    ]
    bench_ds = rd.from_items([{"id": 0, "text": bench_text}])
    corpus_ds = rd.from_items(
        [{"id": i + 1, "text": t} for i, t in enumerate(corpus)])
    out = (contamination_check(corpus_ds, bench_ds, "id", "text", n=5)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out["id"].tolist() == [1, 2]
    row1 = out[out["id"] == 1].iloc[0]
    assert row1["n_grams"] == 12 - 5 + 1
    assert row1["n_hits"] == 8 - 5 + 1
    assert out[out["id"] == 2].iloc[0]["n_hits"] == 0


def _write_fasttext_bin(path, dim, vocab_words, labels, input_mat,
                        output_mat):
    """Hand-craft an UNQUANTIZED supervised fastText .bin per the public
    file format (mirror of functions.langid._load_fasttext_bin): header
    magic+version, Args block, Dictionary block (words then labels),
    dense float32 matrices."""
    import struct

    import numpy as np

    from advanced_data_profile_ray.functions.langid import FASTTEXT_MAGIC

    size = len(vocab_words) + len(labels)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC, 12))
        # dim ws epoch minCount neg wordNgrams loss model bucket minn
        # maxn lrUpdateRate | t    (loss=3 softmax, model=3 supervised)
        f.write(struct.pack("<12i", dim, 5, 5, 1, 5, 1, 3, 3, 0, 0, 0, 100))
        f.write(struct.pack("<d", 1e-4))
        f.write(struct.pack("<3i", size, len(vocab_words), len(labels)))
        # pruneidx_size = -1: what real UNPRUNED dictionaries save —
        # the reader must not read(-8)
        f.write(struct.pack("<2q", 1000, -1))  # ntokens, pruneidx_size
        for w in vocab_words:
            f.write(w.encode("utf-8") + b"\x00")
            f.write(struct.pack("<qb", 10, 0))  # count, type=word
        for lab in labels:
            f.write(lab.encode("utf-8") + b"\x00")
            f.write(struct.pack("<qb", 10, 1))  # type=label
        f.write(struct.pack("<b", 0))  # quant_input = false
        f.write(struct.pack("<2q", *input_mat.shape))
        f.write(np.asarray(input_mat, np.float32).tobytes())
        f.write(struct.pack("<b", 0))  # quant_output = false
        f.write(struct.pack("<2q", *output_mat.shape))
        f.write(np.asarray(output_mat, np.float32).tobytes())


def test_load_fasttext_model_real_artifact(tmp_path):
    """The model swap point exercised with an actual fastText-format
    artifact (round-3 verdict #8): handcrafted word embeddings whose
    output rows separate English/French stopwords; load_fasttext_model
    must return a non-None model and LangIdStage must classify through
    it, not the heuristic."""
    import numpy as np
    import pandas as pd

    from advanced_data_profile_ray.functions.langid import (
        NumpyFastTextModel, detect_language_fasttext, load_fasttext_model)
    from advanced_data_profile_ray.pipelines.text import LangIdStage

    words = ["the", "and", "of", "le", "la", "les"]
    labels = ["__label__en", "__label__fr"]
    dim = 4
    inp = np.zeros((len(words), dim), np.float32)
    inp[:3, 0] = 1.0   # English stopwords load axis 0
    inp[3:, 1] = 1.0   # French stopwords load axis 1
    out = np.zeros((2, dim), np.float32)
    out[0, 0] = 4.0    # en output row reads axis 0
    out[1, 1] = 4.0    # fr output row reads axis 1
    path = str(tmp_path / "tiny_lid.bin")
    _write_fasttext_bin(path, dim, words, labels, inp, out)

    model = load_fasttext_model(path)
    assert isinstance(model, NumpyFastTextModel)

    lang, conf = detect_language_fasttext(model, "le chat et la maison\nles arbres")
    assert lang == "fr" and conf > 50.0
    lang, conf = detect_language_fasttext(model, "the cat and the house of cards")
    assert lang == "en" and conf > 50.0

    stage = LangIdStage("text", model=model)
    got = stage(pd.DataFrame({"text": ["the cat and of", "le la les", None]}))
    assert got["detected_lang"].tolist() == ["en", "fr", "English"]

    # unsupported configs refuse rather than mispredict
    import struct
    bad = str(tmp_path / "subword.bin")
    _write_fasttext_bin(bad, dim, words, labels, inp, out)
    raw = bytearray(open(bad, "rb").read())
    raw[8:12] = struct.pack("<i", dim)          # keep dim
    raw[8 + 4 * 8: 8 + 4 * 9] = struct.pack("<i", 2_000_000)  # bucket != 0
    open(bad, "wb").write(raw)
    assert load_fasttext_model(bad) is None


def test_generated_format_permutations_cover_reference_shapes():
    """Round-4 widening of the generated strftime permutation list
    (reference tries ~10^4, Profiler.py:96-123): month-name, 2-digit-year
    and compact stamps must resolve, 4-digit-year candidates must win
    over %y misparses, and the list must stay deterministic."""
    import pyarrow as pa

    from advanced_data_profile_ray.functions.dates import (
        ALL_FORMATS, find_format, try_parse_datetime_strings)

    assert len(ALL_FORMATS) == len(set(ALL_FORMATS)) >= 400
    assert ALL_FORMATS == list(ALL_FORMATS)  # import-time constant

    cases = {
        # glibc %b also matches full month names, so either form may win
        "11-Mar-2021": (("%d-%b-%Y", "%d-%B-%Y"), "2021-03-11"),
        "March 11, 2021": (("%b %d, %Y", "%B %d, %Y"), "2021-03-11"),
        "Mar 11 2021 14:30:55": (("%b %d %Y %H:%M:%S",
                                  "%B %d %Y %H:%M:%S"), "2021-03-11"),
        "99/12/31": (("%y/%m/%d",), "1999-12-31"),
        "2021-03-11 02:30 PM": (("%Y-%m-%d %I:%M %p",), "2021-03-11"),
    }
    for s, (want_fmts, want_day) in cases.items():
        arr = pa.array([s, s])
        assert find_format(arr) in want_fmts, s
        ts = try_parse_datetime_strings(arr)
        assert str(ts[0]).startswith(want_day), (s, ts[0])

    # a 4-digit-year column must never resolve to a 2-digit-year format
    assert "%y" not in find_format(pa.array(["2021-03-11", "1999-01-02"]))


def test_full_reference_permutation_space_no_fallback():
    """Round-5: the generated list covers the reference's FULL ~4.6k
    permutation space (Profiler.py:96-123 — year-first dates × times with
    %j/%I/%p/%f/%z/%Z, no internal spaces). 20 exotic
    reference-generatable stamps must resolve to a concrete format (no
    dateutil-style fallback), parse to the right instant, and the
    no-match path must stay fast via the regex prefilter."""
    import time

    import pyarrow as pa

    from advanced_data_profile_ray.functions.dates import (
        ALL_FORMATS, find_format, try_parse_datetime_strings)

    assert len(ALL_FORMATS) >= 4500

    # (value, expected day prefix of the parsed timestamp)
    cases = [
        ("2023-12-356 04:22:30", "2023-12-22"),       # %j day-of-year
        ("2023/12/356 04:22:30", "2023-12-22"),
        ("2023 12 356 04:22:30", "2023-12-22"),
        ("2023.Dec.22 04:22:30", "2023-12-22"),
        ("2023-December-22 04:22:30", "2023-12-22"),
        ("23-12-22 04:22:30", "2023-12-22"),          # %y
        ("2023-12-22 042230", "2023-12-22"),          # no time seps
        ("2023-12-22 04:2230", "2023-12-22"),         # mixed time seps
        ("2023-12-22 0422:30", "2023-12-22"),
        ("2023-12-22 04:22:30PM", "2023-12-22"),      # glued %p
        ("2023-12-22 042230PM", "2023-12-22"),
        ("2023-12-22 04:22:30UTC", "2023-12-22"),     # glued %Z
        ("2023-12-22 04:22:30+0500", "2023-12-21"),   # %z → naive UTC
        ("2023-12-22 04:22:30.615016", "2023-12-22"), # dot %f
        ("2023-12-22 04:22:30615016", "2023-12-22"),  # glued %S%f
        ("23/Dec/22 04:22:30", "2023-12-22"),
        ("2023 Dec 356 04:22:30", "2023-12-22"),
        ("23.12.22 042230", "2023-12-22"),
        ("2023/12/22 04:22:30PM+0500", "2023-12-21"), # %p%z chain
        ("2023-Dec-22 04:22:30pm", "2023-12-22"),     # lowercase am/pm
    ]
    for s, want_day in cases:
        arr = pa.array([s, s, s])
        fmt = find_format(arr)
        assert fmt is not None, f"fell to fallback: {s!r}"
        ts = try_parse_datetime_strings(arr)
        assert ts is not None and str(ts[0]).startswith(want_day), (s, fmt, ts[0])

    # regex prefilter keeps the no-match sweep over ~5k candidates cheap
    junk = pa.array(["definitely not a date"] * 64)
    t0 = time.time()
    assert find_format(junk) is None
    assert time.time() - t0 < 0.5


def test_redact_pii_planted(ray_session):
    """Planted PII of every pattern class must redact, with exact
    per-doc counts; null text stays null at count 0; clean text is
    untouched."""
    import pyarrow as pa
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.text import redact_pii

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "contact jane.doe+x@corp.example.com or 555-123-4567",
            "ssn 123-45-6789 from 192.168.0.1 and 10.0.0.255",
            "perfectly clean prose with numbers 12345 and v1.2.3",
            None,
        ]),
    })
    out = (redact_pii(rd.from_arrow(t), "doc_id", "text").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "text_redacted"] == "contact <EMAIL> or <PHONE>"
    assert out.loc[1, "text_redacted"] == "ssn <SSN> from <IP> and <IP>"
    assert out.loc[2, "text_redacted"] == t["text"][2].as_py()
    assert pd.isna(out.loc[3, "text_redacted"])
    assert out["n_redactions"].tolist() == [2, 3, 0, 0]


def test_repetition_stats_planted(ray_session):
    """Hand-computed Gopher repetition features on a planted corpus:
    dup/top word fractions and dup-bigram fraction, incl. empty/null
    text and multi-space runs (empty split tokens must be dropped)."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.text import repetition_stats

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a a b",            # words 3/2 distinct; bigrams (a,a),(a,b)
            "x  y",             # double space -> empty token dropped
            "",                 # no words at all
            "w w w w",          # maximal repetition
        ],
    })
    docs.loc[2, "text"] = None  # null text behaves like empty
    out = (repetition_stats(rd.from_pandas(docs), "doc_id", "text")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    assert out["n_words"].tolist() == [3, 2, 0, 4]
    assert out["n_distinct_words"].tolist() == [2, 2, 0, 1]
    assert out["dup_word_frac"].tolist() == [
        round(1 / 3, 6), 0.0, 0.0, 0.75]
    assert out["top_word_frac"].tolist() == [
        round(2 / 3, 6), 0.5, 0.0, 1.0]
    assert out["n_distinct_bigrams"].tolist() == [2, 1, 0, 1]
    assert out["dup_bigram_frac"].tolist() == [0.0, 0.0, 0.0,
                                               round(2 / 3, 6)]


def test_bigram_lm_surprisal_cross_corpus_oov(ray_session):
    """Hand-computed Laplace bigram scores with a SEPARATE model corpus,
    exercising the OOV fallbacks self-scoring never hits: unseen bigram
    over a seen leading word, and fully-OOV words (smoothing mass only).

    Model 'a b a c': C(a)=2, C(b)=C(c)=1, V=3, C(a,b)=1.
    Scored 'a b z': (a,b) → (1+1)/(2+3) = 0.4 → floor(-1e6·log2(.4)) =
    1321928; (b,z) → 1/(1+3) = 0.25 → exactly 2000000.
    Scored 'z q': (z,q) → 1/(0+3) → floor(1e6·log2 3) = 1584962."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.text import bigram_lm_surprisal

    model = rd.from_items([{"doc_id": 0, "text": "a b a c"}])
    scored = rd.from_items([{"doc_id": 1, "text": "a b z"},
                            {"doc_id": 2, "text": "z q"},
                            {"doc_id": 3, "text": "a"}])  # no bigrams
    out = (bigram_lm_surprisal(scored, "doc_id", "text", model_ds=model)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_bigrams"].tolist() == [2, 1, 0]
    assert out["total_surprisal_microbits"].tolist() == [
        1321928 + 2000000, 1584962, 0]


def test_bigram_lm_surprisal_degenerate_model(ray_session):
    """A model corpus with zero bigrams (single-token docs) or zero
    vocab must score with smoothing mass, not crash on empty-array
    fancy indexing."""
    import ray.data as rd

    from advanced_data_profile_ray.pipelines.text import bigram_lm_surprisal

    scored = rd.from_items([{"doc_id": 1, "text": "a b"}])
    # zero bigrams, vocab {a, b}: (a,b) -> (0+1)/(1+2) = 1/3
    model = rd.from_items([{"doc_id": 0, "text": "a"},
                           {"doc_id": 9, "text": "b"}])
    out = (bigram_lm_surprisal(scored, "doc_id", "text", model_ds=model)
           .to_pandas())
    assert out["total_surprisal_microbits"].tolist() == [1584962]
    # fully empty model: p = 1/max(V,1) = 1 -> zero surprisal
    empty = rd.from_items([{"doc_id": 0, "text": ""}])
    out2 = (bigram_lm_surprisal(scored, "doc_id", "text", model_ds=empty)
            .to_pandas())
    assert out2["total_surprisal_microbits"].tolist() == [0]
    assert out2["n_bigrams"].tolist() == [1]
